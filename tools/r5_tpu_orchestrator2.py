"""Round-5 TPU queue, part 2: the tower-ONLY two-stage cell.

The first r5 orchestrator runs the reference's full FeatCNN recipe
(classifier-warmed tower + warm label table, oe.py:232-289 +
oe_h.py:1435-1436) — a clean tower-effect comparison against `warm4`
(same warm table, cold tower). But round 5 measured the table warm start
NEGATIVE on the pixel path (BASELINE r5: recon 0.605 -> 0.237), so the
2x2 warm-start matrix needs the remaining cell: tower warm-started,
table COLD — the clean comparison against `cold4` (test m-F1 0.423,
hit@1 L3 0.041). This queue waits for part 1 (8perleaf resume ->
twostage warm-table -> bench captures) to drain, then runs that cell.

Same outage gating as the other orchestrators; completed stages are
mirrored into R5_RESULTS_AUTO.md (git-tracked).

Launch: cd /root/repo && nohup setsid python tools/r5_tpu_orchestrator2.py \
            > /tmp/r5_tpu_orch2.log 2>&1 < /dev/null &
(`tools/r5_tpu_orchestrator` is a prefix of this file's argv, so the
bench/dryrun pause lists suspend this queue without changes.)
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
OUTAGE_TOKENS = ("UNAVAILABLE", "TPU backend", "Unable to initialize")
PART1_ARGV = ("tools/r5_tpu_orchestrator.py",
              "tools/quality_cnn_flagship.py",
              "tools/quality_two_stage_flagship.py")


def log(msg):
    print(f"[orch5b {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def results():
    try:
        return json.load(open(RESULTS))
    except (OSError, ValueError):
        return {}


def part1_busy():
    """True while part 1's orchestrator or any flagship leg is running
    (exact argv scan in /proc — never pkill/pgrep patterns)."""
    me = str(os.getpid())
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or pid == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                argv = [a.decode("utf-8", "replace")
                        for a in f.read().split(b"\0") if a]
        except OSError:
            continue
        if len(argv) >= 2 and argv[1] in PART1_ARGV:
            return True
    return False


def probe():
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


def run_gated(name, cmd, env=None):
    for attempt in (1, 2):
        log(f"START {name} (attempt {attempt}): {' '.join(cmd)}")
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True,
                           env=dict(os.environ, **(env or {})))
        out = r.stdout + r.stderr
        with open(f"{OUT}/{name}.log", "w") as f:
            f.write(out)
        log(f"END {name}: rc={r.returncode} wall={time.time() - t0:.0f}s "
            f"tail={out.strip()[-300:]!r}")
        if r.returncode == 0:
            return "ok"
        if any(t in out for t in OUTAGE_TOKENS) and attempt == 1:
            log(f"{name}: outage signature — re-probing then one retry")
            wait_for_tpu()
            continue
        return "failed"
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
    while part1_busy():
        time.sleep(120)
    log("part-1 queue drained")

    wait_for_tpu()
    st = run_gated(
        "flagship_twostage_toweronly",
        [py, "tools/quality_two_stage_flagship.py", "40", "4"],
        env={"LE_TS_TAG": "_toweronly"})
    if st == "ok":
        record("flagship two-stage, tower-ONLY cell — classifier-warmed "
               "tower, COLD label table, 40 ep @ 4 img/leaf (completes the "
               "2x2 warm-start matrix; clean comparison vs cold4: test "
               "m-F1 0.423, hit@1 L3 0.041)",
               "joint_cnn_flagship_40ep_4perleaf_twostage_toweronly")
    log("R5_TPU_ORCH2 DONE")


if __name__ == "__main__":
    main()
