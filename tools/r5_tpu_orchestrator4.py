"""Round-5 TPU queue, stage 2: land whatever orchestrator3 dropped.

orch3's tower-only two-stage leg died twice inside a ~16:00-17:02 UTC
remote_compile outage ("Broken pipe" from the compile endpoint while
jax.devices() still succeeded), so its single-retry gate moved past the
highest-value cell of the 2x2 warm-start matrix. This follow-up:

  1. waits for orch3 (and its current child) to exit — two concurrent
     TPU jobs would contend for the tunnel and the 1-core host;
  2. re-runs every leg whose results key is still missing, value-ordered:
     tower-only two-stage, warm-table two-stage, 8perleaf resume;
  3. gates each attempt on a probe that exercises the FULL path the
     failures actually broke — client init + remote_compile + execute +
     scalar fetch — not just jax.devices();
  4. retries up to 4x per leg with LE_Q3_RESUME=1 (resume is a no-op
     when no checkpoint exists, runner.py:498-505, so it is always safe
     and turns a mid-stage-2 crash into a cheap continuation).

Launch: cd /root/repo && nohup setsid python tools/r5_tpu_orchestrator4.py \
            > /tmp/r5_tpu_orch4.log 2>&1 < /dev/null &
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
    print(f"[orch5d {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def results():
    try:
        return json.load(open(RESULTS))
    except (OSError, ValueError):
        return {}


def orch3_pids():
    """PIDs whose cmdline mentions orchestrator3 or its known children
    (read-only /proc scan; never used to kill)."""
    pids = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or pid == str(os.getpid()):
            continue
        try:
            cmd = open(f"/proc/{pid}/cmdline", "rb").read().decode(
                "utf-8", "replace")
        except OSError:
            continue
        if ("r5_tpu_orchestrator3" in cmd
                or "quality_cnn_flagship" in cmd
                or "quality_two_stage_flagship" in cmd
                or ("bench.py" in cmd and "python" in cmd)):
            pids.append(int(pid))
    return pids


def probe_compile():
    """True iff a fresh process can init the backend, remote-compile a
    tiny jit, run it, and fetch a scalar — the exact chain the two-stage
    failures broke (jax.devices() alone passed during the outage)."""
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


def main():
    py = sys.executable
    log(f"waiting for orchestrator3 + children to drain: {orch3_pids()}")
    while True:
        live = orch3_pids()
        if not live:
            break
        time.sleep(120)
    log("orch3 queue drained; taking over")

    base = "joint_cnn_flagship_40ep_4perleaf_twostage"

    # 1. tower-ONLY two-stage: cleanest cell of the 2x2 warm-start matrix
    #    (classifier-warmed tower, COLD label table; vs cold4 test m-F1
    #    0.423 / hit@1 L3 0.041)
    if f"{base}_toweronly" not in results():
        st = run_gated("flagship_twostage_toweronly_o4",
                       [py, "tools/quality_two_stage_flagship.py", "40", "4"],
                       env={"LE_TS_TAG": "_toweronly", "LE_Q3_RESUME": "1"})
        if st == "ok":
            record("flagship two-stage, tower-ONLY cell (orch4 retry after "
                   "the 16:00-17:02 remote_compile outage)",
                   f"{base}_toweronly")

    # 2. warm-TABLE two-stage: the reference's literal full recipe
    #    (FeatCNN tower + --load_emb_from table, oe_h.py:1435-1436)
    if f"{base}_warmtable" not in results():
        cmd = [py, "tools/quality_two_stage_flagship.py", "40", "4"]
        if os.path.exists(WARM):
            cmd.append(WARM)
        st = run_gated("flagship_twostage_warmtable_o4", cmd,
                       env={"LE_TS_TAG": "_warmtable", "LE_Q3_RESUME": "1"})
        if st == "ok":
            record("flagship two-stage, warm-TABLE cell (orch4; completes "
                   "the 2x2 warm-start matrix)", f"{base}_warmtable")

    # 3. third scaling point, if orch3's resume also failed
    if "joint_cnn_flagship_40ep_8perleaf" not in results():
        st = run_gated("flagship_8perleaf_o4",
                       [py, "tools/quality_cnn_flagship.py", "40", "8"],
                       env={"LE_Q3_RESUME": "1"})
        if st == "ok":
            record("flagship_8perleaf — third scaling point (orch4 retry)",
                   "joint_cnn_flagship_40ep_8perleaf")

    log("R5_TPU_ORCH4 DONE")


if __name__ == "__main__":
    main()
