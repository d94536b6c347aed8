"""Round-4 TPU queue with outage gating.

The axon TPU backend has been in a multi-hour outage ("UNAVAILABLE: TPU
backend setup/compile error" at client init — see CLAUDE.md). Instead of
letting each bench burn its own 3-attempt retry budget against a dead
backend (a failed init hangs ~25 min before surfacing), this orchestrator
probes availability in a loop and only dispatches the round-4 TPU work
once a probe succeeds, in priority order:

  1. bench default          (VERDICT r3 #1 — the headline re-capture)
  2. bench joint            (validates the r3 per-bucket warmup change)
  3. perf_probe_r4          (bf16 BN statistics — the untried lever, #3)
  4. hostfed benches        (only once the CPU batch is done — they are
                             host-pipeline-bound on this 1-core host)
  5. flagship warm@4        (waits for the CPU batch's label table, #4)
  6. Butterfly200 --use_CNN (#7)
  7. bf16-BN quality-drift leg (classifier width run, #3)
  8. flagship @8 img/leaf   (third scaling point, longest, last)

A stage that fails with an outage signature re-enters the probe gate and
retries once. Probe attempts themselves hang ~25 min when the backend is
down, so the loop's period is naturally outage-sized.

Launch: cd /root/repo && nohup setsid python tools/r4_tpu_orchestrator.py \
            > /tmp/r4_tpu_orch.log 2>&1 < /dev/null &
"""

import os
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
OUT = "experiments/r4_tpu/batch1"
os.makedirs(OUT, exist_ok=True)
WARM = "experiments/quality_r4_label/hyp_cone_d10_r4/weights/best_model"
CPU_LOG = "/tmp/cpu_batch_r4.log"
OUTAGE_TOKENS = ("UNAVAILABLE", "TPU backend", "Unable to initialize")


def log(msg):
    print(f"[orch {time.strftime('%H:%M:%S')}] {msg}", flush=True)


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


def run(name, cmd, tee=None):
    log(f"START {name}: {' '.join(cmd)}")
    t0 = time.time()
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


def run_gated(name, cmd, tee=None):
    status = run(name, cmd, tee=tee)
    if status == "outage":
        log(f"{name}: outage signature — re-probing then one retry")
        wait_for_tpu()
        status = run(name, cmd, tee=tee)
    return status


def cpu_batch_done():
    try:
        return "CPU_BATCH_R4 DONE" in open(CPU_LOG).read()
    except OSError:
        return False


def main():
    py = sys.executable
    wait_for_tpu()

    run_gated("bench_default", [py, "bench.py"],
              tee=f"{OUT}/bench_default.json")
    run_gated("bench_joint", [py, "bench.py", "joint"],
              tee=f"{OUT}/bench_joint.json")
    run_gated("perf_probe_r4", [py, "tools/perf_probe_r4.py"],
              tee=f"{OUT}/perf_probe_r4.jsonl")

    hostfed_pending = True
    if cpu_batch_done():
        run_gated("bench_hostfed", [py, "bench.py", "hostfed"],
                  tee=f"{OUT}/bench_hostfed.json")
        run_gated("bench_joint_hostfed", [py, "bench.py", "joint_hostfed"],
                  tee=f"{OUT}/bench_joint_hostfed.json")
        hostfed_pending = False

    # flagship warm@4: wait up to 3 h for the CPU batch's label table
    for _ in range(36):
        if os.path.exists(WARM):
            break
        log(f"waiting for warm ckpt {WARM}")
        time.sleep(300)
    if os.path.exists(WARM):
        run_gated("flagship_warm4",
                  [py, "tools/quality_cnn_flagship.py", "40", "4", WARM])
    else:
        log("warm ckpt never appeared — skipping flagship_warm4")

    run_gated("b200_cnn", [py, "tools/quality_b200_cnn.py", "40", "4"])

    if hostfed_pending:
        while not cpu_batch_done():
            log("waiting for CPU batch before hostfed benches")
            time.sleep(300)
        run_gated("bench_hostfed", [py, "bench.py", "hostfed"],
                  tee=f"{OUT}/bench_hostfed.json")
        run_gated("bench_joint_hostfed", [py, "bench.py", "joint_hostfed"],
                  tee=f"{OUT}/bench_joint_hostfed.json")

    run_gated("bn_bf16_quality",
              [py, "tools/quality_classifier_width.py", "bfloat16"])
    run_gated("flagship_8perleaf",
              [py, "tools/quality_cnn_flagship.py", "40", "8"])
    log("R4_TPU_ORCH DONE")


if __name__ == "__main__":
    main()
