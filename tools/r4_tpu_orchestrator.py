"""Round-4 TPU queue with outage gating (v2: host-contention pausing).

The axon TPU backend has been in a multi-hour outage ("UNAVAILABLE: TPU
backend setup/compile error" at client init — see CLAUDE.md). Instead of
letting each bench burn its own 3-attempt retry budget against a dead
backend (a failed init hangs ~25 min before surfacing), this orchestrator
probes availability in a loop and only dispatches the round-4 TPU work
once a probe succeeds, in priority order:

  1. bench default          (VERDICT r3 #1 — the headline re-capture)
  2. bench joint            (validates the r3 per-bucket warmup change)
  3. perf_probe_r4          (bf16 BN statistics — the untried lever, #3)
  4. hostfed benches        (host-pipeline-bound on this 1-core host)
  5. flagship warm@4        (the round-4 label table is already trained)
  6. Butterfly200 --use_CNN (#7)
  7. bf16-BN quality-drift leg (classifier width run, #3)
  8. flagship @8 img/leaf   (third scaling point, longest, last)

v2: this host has ONE core and the round-4 CPU A/B batches
(tools/run_cpu_batch_r4*.py) run for hours. Any TIMED stage (bench.py,
perf probes — including the device-fed ones, whose dispatch loop still
shares the core) would be depressed by a 98%-CPU A/B leg. Around timed
stages the orchestrator SIGSTOPs the batch process groups (each batch
script is a setsid session leader, so killpg(-pgid) pauses its whole
subprocess tree) and SIGCONTs them after — discovery is by EXACT
argv[1] prefix match in /proc, never by pkill/pgrep pattern. Quality
stages run unpaused (they share the core; their walls are reported as
shared-host context only).

A stage that fails with an outage signature re-enters the probe gate and
retries once. Probe attempts themselves hang ~25 min when the backend is
down, so the loop's period is naturally outage-sized.

Launch: cd /root/repo && nohup setsid python tools/r4_tpu_orchestrator.py \
            > /tmp/r4_tpu_orch.log 2>&1 < /dev/null &
"""

import os
import signal
import subprocess
import sys
import time
from contextlib import contextmanager

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
OUT = "experiments/r4_tpu/batch1"
os.makedirs(OUT, exist_ok=True)
WARM = "experiments/quality_r4_label/hyp_cone_d10_r4/weights/best_model"
OUTAGE_TOKENS = ("UNAVAILABLE", "TPU backend", "Unable to initialize")


def log(msg):
    print(f"[orch {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def batch_pgids():
    """Process groups of the CPU batch leaders, by exact argv[1] match."""
    pgids = []
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
        a1 = argv[1].decode("utf-8", errors="replace")
        if not a1.startswith("tools/run_cpu_batch_r4"):
            continue
        try:
            pgid = os.getpgid(int(pid))
        except OSError:
            continue
        if pgid == int(pid):        # the setsid leader only
            pgids.append(pgid)
    return pgids


@contextmanager
def paused_batches():
    pgids = batch_pgids()
    for pg in pgids:
        try:
            os.killpg(pg, signal.SIGSTOP)
        except OSError:
            pass
    log(f"paused CPU batch groups {pgids}")
    try:
        yield
    finally:
        for pg in pgids:
            try:
                os.killpg(pg, signal.SIGCONT)
            except OSError:
                pass
        log(f"resumed CPU batch groups {pgids}")


def probe():
    """One backend-init attempt; ~seconds when up, ~25 min when down."""
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; d=jax.devices(); assert d; print(d)"],
        capture_output=True, text=True, timeout=45 * 60)
    return r.returncode == 0, (r.stdout + r.stderr)[-400:]


def wait_for_tpu():
    while True:
        try:
            ok, tail = probe()
        except subprocess.TimeoutExpired:
            ok, tail = False, "probe timeout (45 min)"
        if ok:
            log(f"TPU up: {tail.strip()[-120:]}")
            return
        log(f"TPU still down: {tail.strip()[-160:]}; sleeping 300s")
        time.sleep(300)


def run(name, cmd, tee=None, timed=False):
    log(f"START {name}: {' '.join(cmd)}")
    t0 = time.time()
    if timed:
        with paused_batches():
            r = subprocess.run(cmd, capture_output=True, text=True)
    else:
        r = subprocess.run(cmd, capture_output=True, text=True)
    out = r.stdout + r.stderr
    if tee:
        with open(tee, "w") as f:
            f.write(r.stdout)
    with open(f"{OUT}/{name}.log", "w") as f:
        f.write(out)
    log(f"END {name}: rc={r.returncode} wall={time.time() - t0:.0f}s "
        f"tail={out.strip()[-300:]!r}")
    if r.returncode != 0 and any(t in out for t in OUTAGE_TOKENS):
        return "outage"
    return "ok" if r.returncode == 0 else "failed"


def run_gated(name, cmd, tee=None, timed=False):
    status = run(name, cmd, tee=tee, timed=timed)
    if status == "outage":
        log(f"{name}: outage signature — re-probing then one retry")
        wait_for_tpu()
        status = run(name, cmd, tee=tee, timed=timed)
    return status


def main():
    py = sys.executable
    wait_for_tpu()

    run_gated("bench_default", [py, "bench.py"],
              tee=f"{OUT}/bench_default.json", timed=True)
    run_gated("bench_joint", [py, "bench.py", "joint"],
              tee=f"{OUT}/bench_joint.json", timed=True)
    run_gated("perf_probe_r4", [py, "tools/perf_probe_r4.py"],
              tee=f"{OUT}/perf_probe_r4.jsonl", timed=True)
    run_gated("bench_hostfed", [py, "bench.py", "hostfed"],
              tee=f"{OUT}/bench_hostfed.json", timed=True)
    run_gated("bench_joint_hostfed", [py, "bench.py", "joint_hostfed"],
              tee=f"{OUT}/bench_joint_hostfed.json", timed=True)

    if os.path.exists(WARM):
        run_gated("flagship_warm4",
                  [py, "tools/quality_cnn_flagship.py", "40", "4", WARM])
    else:
        log(f"warm ckpt {WARM} missing — skipping flagship_warm4")

    run_gated("b200_cnn", [py, "tools/quality_b200_cnn.py", "40", "4"])
    run_gated("bn_bf16_quality",
              [py, "tools/quality_classifier_width.py", "bfloat16"])
    run_gated("flagship_8perleaf",
              [py, "tools/quality_cnn_flagship.py", "40", "8"])
    log("R4_TPU_ORCH DONE")


if __name__ == "__main__":
    main()
