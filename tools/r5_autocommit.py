"""Auto-commit the in-flight result mirrors every few minutes.

The round-4/5 host resets wiped not only untracked state but the whole
working tree back to HEAD — so tracked-but-uncommitted mirror writes
(R4_PARTIAL_PROGRESS.md etc.) died with them. This loop commits ONLY the
mirror files (path-scoped `git commit -- <paths>`, so it can never sweep
up unrelated staged work) whenever they change; an index.lock held by an
interactive commit just skips one cycle.

Launch: cd /root/repo && nohup setsid python tools/r5_autocommit.py \
            > /tmp/r5_autocommit.log 2>&1 < /dev/null &
(Deliberately does NOT match the bench/dryrun pause prefixes: it holds no
jax client and must keep committing while the TPU queue is paused.)
"""

import os
import subprocess
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
PATHS = ["R4_PARTIAL_PROGRESS.md", "R4_RESULTS_AUTO.md",
         "R5_RESULTS_AUTO.md"]
MSG = "Auto-mirror: in-flight round-5 leg progress"


def main():
    while True:
        try:
            dirty = subprocess.run(
                ["git", "diff", "--quiet", "HEAD", "--"] + PATHS).returncode
            if dirty:
                subprocess.run(["git", "add", "--"] + PATHS, timeout=60)
                r = subprocess.run(["git", "commit", "-m", MSG, "--"] + PATHS,
                                   capture_output=True, text=True, timeout=60)
                print(f"[{time.strftime('%H:%M:%S')}] commit rc={r.returncode}"
                      f" {r.stdout.strip().splitlines()[:1]}", flush=True)
        except Exception as e:  # lock contention etc. — try again next cycle
            print(f"[{time.strftime('%H:%M:%S')}] skipped: {e}", flush=True)
        time.sleep(240)


if __name__ == "__main__":
    main()
