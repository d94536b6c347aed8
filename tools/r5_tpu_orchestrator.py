"""Round-5 TPU queue (VERDICT r4 #1 + #2 + #6):

0. Wait for the round-4 queue to drain (the 8 img/leaf flagship leg is
   LIVE at session start — do not disturb it). If a host reset killed it
   before its results.json record landed, resume it (LE_Q3_RESUME=1)
   and record it here.
1. Two-stage flagship (the reference's FeatCNN recipe, oe.py:232-289):
   classifier finetuned on the flagship's exact pixel banks, its trunk
   warm-started into the joint tower, label table warm-started from the
   converged label-only run — the highest-leverage untried move for the
   near-zero leaf-level hit@1 (tools/quality_two_stage_flagship.py).
2. Fresh driver-mode bench captures (default incl. the new freeze_bn
   reading, + joint) teed under experiments/r5_tpu so bench.py's stale
   fallback has same-round live numbers.

Same outage gating as the round-4 orchestrators. Every completed stage
is mirrored into R5_RESULTS_AUTO.md (git-tracked).

Launch: cd /root/repo && nohup setsid python tools/r5_tpu_orchestrator.py \
            > /tmp/r5_tpu_orch.log 2>&1 < /dev/null &
(`tools/r5_tpu_orchestrator` is in bench.py's and __graft_entry__.py's
pause lists, so round-end captures suspend this queue cleanly.)
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
OUTAGE_TOKENS = ("UNAVAILABLE", "TPU backend", "Unable to initialize")


def log(msg):
    print(f"[orch5 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def results():
    try:
        return json.load(open(RESULTS))
    except (OSError, ValueError):
        return {}


def r4_queue_busy():
    """True while the round-4 orchestrator or a flagship leg is running
    (exact argv scan in /proc — never pkill/pgrep patterns)."""
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                argv = [a.decode("utf-8", "replace")
                        for a in f.read().split(b"\0") if a]
        except OSError:
            continue
        if len(argv) >= 2 and argv[1] in (
                "tools/r4_tpu_orchestrator.py",
                "tools/r4_tpu_orchestrator2.py",
                "tools/r4_warm4_watcher.py",
                "tools/quality_cnn_flagship.py"):
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


def run(name, cmd, env=None):
    log(f"START {name}: {' '.join(cmd)}")
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True,
                       env=dict(os.environ, **(env or {})))
    out = r.stdout + r.stderr
    with open(f"{OUT}/{name}.log", "w") as f:
        f.write(out)
    log(f"END {name}: rc={r.returncode} wall={time.time() - t0:.0f}s "
        f"tail={out.strip()[-300:]!r}")
    if r.returncode != 0 and any(t in out for t in OUTAGE_TOKENS):
        return "outage"
    return "ok" if r.returncode == 0 else "failed"


def run_gated(name, cmd, env=None):
    status = run(name, cmd, env)
    if status == "outage":
        log(f"{name}: outage signature — re-probing then one retry")
        wait_for_tpu()
        status = run(name, cmd, env)
    return status


def record(title, key):
    rec = results().get(key, {"error": f"{key} missing"})
    with open(AUTO, "a") as f:
        f.write(f"\n## {title} "
                f"({time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())})"
                f"\n\n```json\n{json.dumps(rec, indent=2)}\n```\n")
    log(f"recorded {key} -> {AUTO}")


def main():
    py = sys.executable
    while r4_queue_busy():
        time.sleep(120)
    log("round-4 queue drained")

    # if a reset killed the 8perleaf leg before its record landed, resume
    if "joint_cnn_flagship_40ep_8perleaf" not in results():
        wait_for_tpu()
        st = run_gated("flagship_8perleaf_resume",
                       [py, "tools/quality_cnn_flagship.py", "40", "8"],
                       env={"LE_Q3_RESUME": "1"})
        if st == "ok":
            record("flagship_8perleaf — third scaling point "
                   "(resumed after reset)", "joint_cnn_flagship_40ep_8perleaf")

    wait_for_tpu()
    st = run_gated("flagship_twostage",
                   [py, "tools/quality_two_stage_flagship.py", "40", "4",
                    WARM] if os.path.exists(WARM) else
                   [py, "tools/quality_two_stage_flagship.py", "40", "4"])
    if st == "ok":
        record("flagship two-stage — tower warm-started from a finetuned "
               "723-node classifier + warm label table, 40 ep @ 4 img/leaf "
               "(vs warm4: test m-F1 0.414, hit@1 L3 0.002; cold4: 0.423 / "
               "0.041)", "joint_cnn_flagship_40ep_4perleaf_twostage")

    # fresh driver-mode bench captures for the stale fallback + the new
    # freeze_bn reading, teed where bench.py's fallback globs them
    for mode, args in (("default", []), ("joint", ["joint"])):
        st = run_gated(f"bench_{mode}", [py, "bench.py"] + args)
        try:
            txt = open(f"{OUT}/bench_{mode}.log").read()
            line = []
            for ln in txt.splitlines():
                if not (ln.startswith("{") and '"metric"' in ln):
                    continue
                try:
                    rec = json.loads(ln)
                except ValueError:
                    continue
                # never tee a stale-fallback echo: bench.py's own
                # _stale_fallback globs these files by newest mtime, so a
                # re-teed old capture would masquerade as this round's
                # live number
                if not rec.get("stale"):
                    line.append(ln)
            if line:
                with open(f"{OUT}/bench_{mode}.json", "w") as f:
                    f.write(line[-1] + "\n")
                log(f"bench_{mode}: {line[-1]}")
        except OSError:
            pass
    log("R5_TPU_ORCH DONE")


if __name__ == "__main__":
    main()
