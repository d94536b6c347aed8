"""Round-5 TPU queue, session 2: land the two-stage cells after the wipe.

A fourth host reset (2026-08-19 ~21:37 UTC) wiped `experiments/` again —
the orch3/orch4/orch5 queue's two-stage cells never recorded, and the
warm label table (`hyp_cone_d10_r4` best_model) is gone with them. This
session is short (~2 h), so the queue is value-ordered around PARTIAL
evidence: the two-stage runner persists its stage-1 classifier metrics
the moment stage 1 finishes, stage 2 evals every 4 epochs land in
logs/metrics.jsonl which `tools/r4_partial_mirror.py` mirrors into the
git-tracked R4_PARTIAL_PROGRESS.md, and `tools/r5_autocommit.py` commits
the mirror files every few minutes — whatever epoch the round ends at is
preserved.

Order:
  0. re-train the warm label table on CPU (~3 min; restores the
     --load_emb_from artifact for the warm-table cell);
  1. tower-ONLY two-stage flagship (40 ep @ 4 img/leaf): the r4
     verdict's headline untried move (FeatCNN recipe, oe.py:232-289) in
     its cleanest form — vs cold4 (test m-F1 0.423, hit@1 L3 0.041);
  2. warm-TABLE two-stage (the reference's literal full recipe,
     + --load_emb_from, oe_h.py:1435-1436) if time allows;
  3. full pytest suite once the TPU queue drains.

Launch: cd /root/repo && nohup setsid python tools/r5_tpu_orchestrator6.py \
            > /tmp/r5_tpu_orch6.log 2>&1 < /dev/null &
(`tools/r5_tpu_orchestrator` prefixes this argv too, so bench.py /
dryrun_multichip's pause lists suspend this queue unchanged.)
"""

import json
import os
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
OUT = "experiments/r5_tpu"
os.makedirs(OUT, exist_ok=True)
WARM = "experiments/quality_r4_label/hyp_cone_d10_r4/weights/best_model"
RESULTS = "experiments/quality_r3/results.json"
AUTO = "R5_RESULTS_AUTO.md"
OUTAGE_TOKENS = ("UNAVAILABLE", "TPU backend", "Unable to initialize",
                 "Broken pipe", "Network Error")


def log(msg):
    print(f"[orch6 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def results():
    try:
        return json.load(open(RESULTS))
    except (OSError, ValueError):
        return {}


def probe_compile():
    """True iff a fresh process can init the backend, remote-compile a
    tiny jit, run it, and fetch a scalar — the exact chain last session's
    two-stage failures broke (jax.devices() alone passed during the
    outage)."""
    code = ("import jax, jax.numpy as jnp; "
            "x = jax.jit(lambda a: (a * 2 + 1).sum())(jnp.arange(64.0)); "
            "print('PROBE_OK', float(x))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=30 * 60)
    except subprocess.TimeoutExpired:
        return False, "probe timeout (30 min)"
    ok = r.returncode == 0 and "PROBE_OK" in r.stdout
    return ok, (r.stdout + r.stderr)[-300:]


def wait_for_compile_path():
    while True:
        ok, tail = probe_compile()
        if ok:
            log(f"compile path up: {tail.strip()[-80:]}")
            return
        log(f"compile path down: {tail.strip()[-160:]}; sleeping 300s")
        time.sleep(300)


def run_gated(name, cmd, env=None, attempts=4):
    for attempt in range(1, attempts + 1):
        wait_for_compile_path()
        log(f"START {name} (attempt {attempt}): {' '.join(cmd)}")
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True,
                           env=dict(os.environ, **(env or {})))
        out = r.stdout + r.stderr
        with open(f"{OUT}/{name}.log", "a") as f:
            f.write(f"\n===== attempt {attempt} rc={r.returncode} =====\n")
            f.write(out)
        log(f"END {name}: rc={r.returncode} wall={time.time() - t0:.0f}s "
            f"tail={out.strip()[-300:]!r}")
        if r.returncode == 0:
            return "ok"
        if not any(t in out for t in OUTAGE_TOKENS):
            return "failed"  # a real bug: retrying won't change it
        log(f"{name}: outage signature — backoff 300s then re-probe")
        time.sleep(300)
    return "failed"


def record(title, key):
    rec = results().get(key, {"error": f"{key} missing"})
    with open(AUTO, "a") as f:
        f.write(f"\n## {title} "
                f"({time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())})"
                f"\n\n```json\n{json.dumps(rec, indent=2)}\n```\n")
    log(f"recorded {key} -> {AUTO}")


def retrain_warm_table():
    """CPU-only label table (hyp_cone_d10_r4) — ~3 min, runs BEFORE the
    TPU leg so the 1-core host isn't contended mid-leg. The empty
    PALLAS_AXON_POOL_IPS makes the import-time execve guard in
    run_cpu_batch_r4h a no-op and keeps jax on CPU."""
    if os.path.exists(WARM):
        log(f"warm table already on disk: {WARM}")
        return
    code = ("import sys; sys.path.insert(0, '.'); "
            "from tools.run_cpu_batch_r4h import label_only_warmstart; "
            "label_only_warmstart()")
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu"))
    with open(f"{OUT}/warm_table_retrain.log", "w") as f:
        f.write(r.stdout + r.stderr)
    log(f"warm table retrain rc={r.returncode} "
        f"tail={(r.stdout + r.stderr).strip()[-200:]!r}")


def main():
    py = sys.executable
    base = "joint_cnn_flagship_40ep_4perleaf_twostage"

    # 0. the cheap CPU artifact first
    retrain_warm_table()

    # 1. tower-ONLY two-stage: cleanest cell of the 2x2 warm-start matrix
    if f"{base}_toweronly" not in results():
        st = run_gated("flagship_twostage_toweronly_o6",
                       [py, "tools/quality_two_stage_flagship.py", "40", "4"],
                       env={"LE_TS_TAG": "_toweronly", "LE_Q3_RESUME": "1"})
        if st == "ok":
            record("flagship two-stage, tower-ONLY cell — classifier-warmed "
                   "tower, COLD label table, 40 ep @ 4 img/leaf (vs cold4: "
                   "test m-F1 0.423, hit@1 L3 0.041)",
                   f"{base}_toweronly")

    # 2. warm-TABLE two-stage: the reference's literal full recipe
    if f"{base}_warmtable" not in results():
        cmd = [py, "tools/quality_two_stage_flagship.py", "40", "4"]
        if os.path.exists(WARM):
            cmd.append(WARM)
        st = run_gated("flagship_twostage_warmtable_o6", cmd,
                       env={"LE_TS_TAG": "_warmtable", "LE_Q3_RESUME": "1"})
        if st == "ok":
            record("flagship two-stage, warm-TABLE cell (completes the 2x2 "
                   "warm-start matrix)", f"{base}_warmtable")

    # 3. full-suite re-run (host now free of TPU legs)
    log("START full pytest suite")
    t0 = time.time()
    r = subprocess.run([py, "-m", "pytest", "tests/", "-q"],
                       capture_output=True, text=True)
    tail = (r.stdout + r.stderr).strip().splitlines()
    with open(f"{OUT}/pytest_final.log", "w") as f:
        f.write(r.stdout + r.stderr)
    summary = tail[-1] if tail else "(no output)"
    log(f"END pytest: rc={r.returncode} wall={time.time() - t0:.0f}s "
        f"summary={summary!r}")
    with open(AUTO, "a") as f:
        f.write(f"\n## round-end full-suite run "
                f"({time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())})"
                f"\n\n`pytest tests/ -q` rc={r.returncode}, "
                f"wall {time.time() - t0:.0f}s: `{summary}`\n"
                f"(full log: experiments/r5_tpu/pytest_final.log)\n")
    log("R5_TPU_ORCH6 DONE")


if __name__ == "__main__":
    main()
