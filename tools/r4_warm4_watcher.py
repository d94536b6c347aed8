"""Re-queue the round-4 warm-started flagship ahead of the 8-per-leaf run.

The orchestrator's flagship_warm4 stage crashed on orbax's sharding replay
(the CPU-trained warm table could not restore inside the TPU process —
fixed in Checkpointer.load_raw, which now restores template-less reads as
host numpy). The orchestrator had already moved on, with two stages left:
bn_bf16_quality (short) then flagship_8perleaf (~6 h). The warm flagship
is the higher-value run (VERDICT r3 #4: does the reference's warm-start
workflow lift the data-starved CNN flagship's leaf level?), so this
watcher swaps it in front:

  1. poll the orchestrator log until "START flagship_8perleaf" (or the
     orchestrator is gone / done);
  2. SIGSTOP the orchestrator's process group within seconds of that
     launch — the child is still in python/data setup, before any tunnel
     RPC (and if its axon client does go stale during the pause, the
     orchestrator's own outage gate re-probes and retries the stage);
  3. run flagship_warm4 with the fixed restore;
  4. SIGCONT the orchestrator group.

Process discovery is by EXACT argv[1] match (never pkill/pgrep patterns).

Launch: cd /root/repo && nohup setsid python tools/r4_warm4_watcher.py \
            > /tmp/r4_warm4_watcher.log 2>&1 < /dev/null &
"""

import os
import signal
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
ORCH_LOG = "/tmp/r4_tpu_orch.log"
OUT = "experiments/r4_tpu/batch1"
WARM = "experiments/quality_r4_label/hyp_cone_d10_r4/weights/best_model"
OUTAGE_TOKENS = ("UNAVAILABLE", "TPU backend", "Unable to initialize")


def log(msg):
    print(f"[warm4 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def orch_pgid():
    """The orchestrator's process group, by exact argv[1] match."""
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                argv = f.read().split(b"\0")
        except OSError:
            continue
        if len(argv) < 2:
            continue
        if argv[1].decode("utf-8", "replace") != "tools/r4_tpu_orchestrator.py":
            continue
        try:
            return os.getpgid(int(pid))
        except OSError:
            continue
    return None


def read_log():
    try:
        with open(ORCH_LOG) as f:
            return f.read()
    except OSError:
        return ""


def run_warm4():
    cmd = [sys.executable, "tools/quality_cnn_flagship.py", "40", "4", WARM]
    for attempt in (1, 2):
        log(f"START flagship_warm4 (attempt {attempt}): {' '.join(cmd)}")
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True)
        out = r.stdout + r.stderr
        with open(f"{OUT}/flagship_warm4.log", "w") as f:
            f.write(out)
        log(f"END flagship_warm4: rc={r.returncode} "
            f"wall={time.time() - t0:.0f}s tail={out.strip()[-300:]!r}")
        if r.returncode == 0:
            return True
        if not any(t in out for t in OUTAGE_TOKENS):
            return False
        log("outage signature — sleeping 900s before the one retry")
        time.sleep(900)
    return False


def main():
    if not os.path.exists(WARM):
        log(f"warm ckpt {WARM} missing — nothing to do")
        return
    # wait for the orchestrator to reach its final stage
    while True:
        txt = read_log()
        pg = orch_pgid()
        if "START flagship_8perleaf" in txt or "R4_TPU_ORCH DONE" in txt:
            break
        if pg is None:
            log("orchestrator gone before reaching flagship_8perleaf — "
                "running warm4 directly")
            break
        time.sleep(5)

    pg = orch_pgid()
    done = "R4_TPU_ORCH DONE" in read_log()
    if pg is not None and not done:
        log(f"pausing orchestrator group {pg}")
        try:
            os.killpg(pg, signal.SIGSTOP)
        except OSError as e:
            log(f"SIGSTOP failed ({e}) — running warm4 alongside")
            pg = None
    try:
        run_warm4()
    finally:
        if pg is not None and not done:
            try:
                os.killpg(pg, signal.SIGCONT)
                log(f"resumed orchestrator group {pg}")
            except OSError as e:
                log(f"SIGCONT failed: {e}")
    log("WARM4_WATCHER DONE")


if __name__ == "__main__":
    main()
