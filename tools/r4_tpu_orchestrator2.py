"""Round-4 TPU queue, session 2: the two stages the first round-4 session
launched but never finished before its round ended —

  1. flagship_warm4: the warm-started `--use_CNN` flagship (40 ep,
     4 img/leaf, label table from --load_emb_from; VERDICT r3 #4) —
     the data-starved regime where the reference's warm-start workflow
     (oe_h.py:1435-1436) could lift the leaf level (fc7 warm start
     measured neutral at convergence, BASELINE part C).
  2. flagship_8perleaf: the third scaling point (2 -> 4 -> 8 img/leaf)
     for the "data-bound, not model-bound" claim.

Same outage gating as tools/r4_tpu_orchestrator.py (probe loop, one
retry per stage). Quality stages run unpaused (their walls are
shared-host context only). Each completed stage's results.json record is
mirrored into R4_RESULTS_AUTO.md (git-tracked) so a round-end snapshot
preserves it even if this session ends before BASELINE.md is updated.

Launch: cd /root/repo && nohup setsid python tools/r4_tpu_orchestrator2.py \
            > /tmp/r4_tpu_orch2.log 2>&1 < /dev/null &
(The `tools/r4_tpu_orchestrator` argv prefix is what bench.py's
_pause_cpu_batches matches — keep the name so the driver's round-end
bench suspends this queue around its timed capture.)
"""

import json
import os
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
OUT = "experiments/r4_tpu/batch2"
os.makedirs(OUT, exist_ok=True)
WARM = "experiments/quality_r4_label/hyp_cone_d10_r4/weights/best_model"
RESULTS = "experiments/quality_r3/results.json"
AUTO = "R4_RESULTS_AUTO.md"
OUTAGE_TOKENS = ("UNAVAILABLE", "TPU backend", "Unable to initialize")


def log(msg):
    print(f"[orch2 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


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


def run(name, cmd):
    log(f"START {name}: {' '.join(cmd)}")
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True)
    out = r.stdout + r.stderr
    with open(f"{OUT}/{name}.log", "w") as f:
        f.write(out)
    log(f"END {name}: rc={r.returncode} wall={time.time() - t0:.0f}s "
        f"tail={out.strip()[-300:]!r}")
    if r.returncode != 0 and any(t in out for t in OUTAGE_TOKENS):
        return "outage"
    return "ok" if r.returncode == 0 else "failed"


def run_gated(name, cmd):
    status = run(name, cmd)
    if status == "outage":
        log(f"{name}: outage signature — re-probing then one retry")
        wait_for_tpu()
        status = run(name, cmd)
    return status


def record(title, key):
    """Mirror one results.json record into the git-tracked auto file."""
    try:
        rec = json.load(open(RESULTS)).get(key, {"error": f"{key} missing"})
    except (OSError, ValueError) as e:
        rec = {"error": str(e)}
    with open(AUTO, "a") as f:
        f.write(f"\n## {title} "
                f"({time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())})"
                f"\n\n```json\n{json.dumps(rec, indent=2)}\n```\n")
    log(f"recorded {key} -> {AUTO}")


def main():
    py = sys.executable
    # part H's warm-table retrain takes ~3 min; cap the wait at 40
    t0 = time.time()
    while not os.path.exists(WARM) and time.time() - t0 < 2400:
        time.sleep(20)
    wait_for_tpu()

    if os.path.exists(WARM):
        st = run_gated("flagship_warm4",
                       [py, "tools/quality_cnn_flagship.py", "40", "4", WARM])
        if st == "ok":
            record("flagship_warm4 — warm-started `--use_CNN` flagship, "
                   "40 ep @ 4 img/leaf (vs r3 cold: test m-F1 0.423, "
                   "hit@1 L3 0.041)", "joint_cnn_flagship_40ep_4perleaf_warm")
    else:
        log(f"warm ckpt {WARM} missing after wait — skipping flagship_warm4")

    st = run_gated("flagship_8perleaf",
                   [py, "tools/quality_cnn_flagship.py", "40", "8"])
    if st == "ok":
        record("flagship_8perleaf — third scaling point (2/4/8 img/leaf)",
               "joint_cnn_flagship_40ep_8perleaf")
    log("R4_TPU_ORCH2 DONE")


if __name__ == "__main__":
    main()
