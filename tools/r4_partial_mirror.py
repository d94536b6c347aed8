"""Mirror in-flight flagship eval metrics into a git-tracked file.

The round-4 TPU flagship stages (warm4 ~3 h, 8perleaf ~6 h) record their
results.json entry only on completion, and `experiments/` is untracked —
a session/round end mid-run would lose every intermediate eval. Each
trainer's MetricsLogger appends to logs/metrics.jsonl as evals land, so
this loop rewrites R4_PARTIAL_PROGRESS.md (git-tracked) every 2 min with
the latest per-run eval scalars; the driver's round-end snapshot commit
then preserves partial convergence curves no matter when the session
stops. Pure file IO — negligible CPU, safe to leave running.

Launch: cd /root/repo && nohup setsid python tools/r4_partial_mirror.py \
            > /tmp/r4_partial_mirror.log 2>&1 < /dev/null &
(Deliberately does NOT match the bench/dryrun pause prefixes: it holds no
jax client and must keep mirroring while the queues are paused.)
"""

import glob
import json
import os
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
OUT = "R4_PARTIAL_PROGRESS.md"
PATTERNS = (
    "experiments/quality_r3/joint_cnn_flagship_*/logs/metrics.jsonl",
    "experiments/ref_ab/rebuild_classifier_hsoftmax_*/logs/metrics.jsonl",
)


def latest_per_tag(path, keep_last=6):
    """Last value per tag, plus the last few val-eval snapshots."""
    per_tag, evals = {}, []
    try:
        with open(path) as f:
            for ln in f:
                try:
                    rec = json.loads(ln)
                except ValueError:
                    continue
                per_tag[rec["tag"]] = (rec["value"], rec["step"])
                if rec["tag"].startswith("val/"):
                    evals.append(rec)
    except OSError:
        return None
    return per_tag, evals[-keep_last * 8:]


def render():
    parts = [
        "# Round-4 in-flight run progress (auto-mirrored)\n",
        "\nLatest per-tag scalars from each in-flight run's "
        "logs/metrics.jsonl,\nrewritten every ~2 min by "
        "`tools/r4_partial_mirror.py` so partial\nconvergence evidence "
        "survives a mid-run session end. Completed runs'\nfinal records "
        "land in R4_RESULTS_AUTO.md / BASELINE.md.\n",
        f"\n_Last mirror: "
        f"{time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}_\n",
    ]
    found = False
    for pat in PATTERNS:
        for path in sorted(glob.glob(pat)):
            got = latest_per_tag(path)
            if not got:
                continue
            per_tag, _ = got
            if not per_tag:
                continue
            found = True
            run = path.split("/")[-3]
            parts.append(f"\n## {run}\n\n| tag | last value | step |\n"
                         f"|---|---|---|\n")
            for tag in sorted(per_tag):
                v, s = per_tag[tag]
                parts.append(f"| {tag} | {v:.6g} | {s} |\n")
    if not found:
        parts.append("\n(no metrics.jsonl found yet)\n")
    return "".join(parts)


def _sans_stamp(txt):
    return "\n".join(ln for ln in txt.splitlines()
                     if not ln.startswith("_Last mirror:"))


def main():
    while True:
        txt = render()
        try:
            prev = open(OUT).read()
        except OSError:
            prev = ""
        # only rewrite when actual metrics changed — the timestamp alone
        # must not dirty the file (tools/r5_autocommit.py would commit
        # a no-op every cycle)
        if _sans_stamp(txt) != _sans_stamp(prev):
            tmp = OUT + ".tmp"
            with open(tmp, "w") as f:
                f.write(txt)
            os.replace(tmp, OUT)
        time.sleep(120)


if __name__ == "__main__":
    main()
