"""Round-5 TPU queue, stage 3: round-end closure after orch3/orch4 drain.

Sequence (value-ordered for the fixed round end):

  1. wait for orch3/orch4 and their TPU children to exit;
  2. IF the tower-only two-stage cell landed AND shows a real improvement
     over cold4 (test m-F1 >= 0.45 or leaf hit@1 >= 0.08) AND it is still
     early enough for a ~3.6 h leg (before 02:30 UTC), run the stage-1
     dose-response leg: the same tower-only cell with a 2x stage-1 budget
     (LE_TS_STEPS=2400) — does a better classifier transfer better?
  3. re-run the FULL pytest suite (the virtual-mesh tests need the host
     free of TPU legs: XLA:CPU collective rendezvous aborts under 1-core
     contention, CLAUDE.md) and append the tail to R5_RESULTS_AUTO.md —
     package sources changed since the last green run (--load_tower_from
     + its tests), so the round-end green claim needs a fresh record.

Launch: cd /root/repo && nohup setsid python tools/r5_tpu_orchestrator5.py \
            > /tmp/r5_tpu_orch5.log 2>&1 < /dev/null &
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
RESULTS = "experiments/quality_r3/results.json"
AUTO = "R5_RESULTS_AUTO.md"
TOWERONLY = "joint_cnn_flagship_40ep_4perleaf_twostage_toweronly"
DOSE_KEY = "joint_cnn_flagship_40ep_4perleaf_twostage_cls2400x32_toweronly"
BONUS_DEADLINE = "02:30"  # UTC — a ~3.6 h leg must land before round end
OUTAGE_TOKENS = ("UNAVAILABLE", "TPU backend", "Unable to initialize",
                 "Broken pipe", "Network Error")


def log(msg):
    print(f"[orch5e {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def results():
    try:
        return json.load(open(RESULTS))
    except (OSError, ValueError):
        return {}


def queue_pids():
    """Read-only /proc scan for the upstream queue (never used to kill)."""
    pids = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or pid == str(os.getpid()):
            continue
        try:
            cmd = open(f"/proc/{pid}/cmdline", "rb").read().decode(
                "utf-8", "replace")
        except OSError:
            continue
        if ("r5_tpu_orchestrator3" in cmd or "r5_tpu_orchestrator4" in cmd
                or "quality_cnn_flagship" in cmd
                or "quality_two_stage_flagship" in cmd
                or ("bench.py" in cmd and "python" in cmd)):
            pids.append(int(pid))
    return pids


def probe_compile():
    code = ("import jax, jax.numpy as jnp; "
            "x = jax.jit(lambda a: (a * 2 + 1).sum())(jnp.arange(64.0)); "
            "print('PROBE_OK', float(x))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=30 * 60)
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and "PROBE_OK" in r.stdout


def record(title, key):
    rec = results().get(key, {"error": f"{key} missing"})
    with open(AUTO, "a") as f:
        f.write(f"\n## {title} "
                f"({time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())})"
                f"\n\n```json\n{json.dumps(rec, indent=2)}\n```\n")
    log(f"recorded {key} -> {AUTO}")


def main():
    py = sys.executable
    log(f"waiting for the r5 TPU queue to drain: {queue_pids()}")
    while queue_pids():
        time.sleep(120)
    log("queue drained")

    # ---- optional dose-response leg (only if the tower effect is real)
    tw = results().get(TOWERONLY, {})
    helps = (tw.get("test_micro_f1", 0) >= 0.45
             or tw.get("test_hit@1/level_3", 0) >= 0.08)
    # the round spans ~18:50 -> ~06:50 UTC: a ~3.6 h leg fits if started
    # this evening (>= 19:00) or before the wrapped 02:30 deadline
    hhmm = time.strftime("%H:%M", time.gmtime())
    early = hhmm >= "19:00" or hhmm < BONUS_DEADLINE
    if tw and helps and early and DOSE_KEY not in results():
        for attempt in (1, 2):
            while not probe_compile():
                log("compile path down; sleeping 300s")
                time.sleep(300)
            log(f"START dose-response leg (attempt {attempt}): stage-1 "
                f"2400 steps, tower-only (vs {TOWERONLY}: "
                f"m-F1 {tw.get('test_micro_f1')}, "
                f"L3 {tw.get('test_hit@1/level_3')})")
            r = subprocess.run(
                [py, "tools/quality_two_stage_flagship.py", "40", "4"],
                capture_output=True, text=True,
                env=dict(os.environ, LE_TS_TAG="_toweronly",
                         LE_TS_STEPS="2400", LE_Q3_RESUME="1"))
            out = r.stdout + r.stderr
            with open(f"{OUT}/flagship_twostage_dose2400.log", "a") as f:
                f.write(f"\n===== attempt {attempt} rc={r.returncode} =====\n")
                f.write(out)
            log(f"END dose-response: rc={r.returncode} "
                f"tail={out.strip()[-200:]!r}")
            if r.returncode == 0:
                record("flagship two-stage tower-only, 2x stage-1 budget "
                       "(dose-response on classifier quality)", DOSE_KEY)
                break
            if not any(t in out for t in OUTAGE_TOKENS):
                break
            time.sleep(300)
    else:
        log(f"skip dose-response: landed={bool(tw)} helps={helps} "
            f"early={early}")

    # ---- full-suite re-run (host now free of TPU legs)
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
    log("R5_TPU_ORCH5 DONE")


if __name__ == "__main__":
    main()
