"""Round-5 CPU batch (VERDICT r4 #4 + #5):

1. `classifier_multi_label_revived 30` — the reference's multi_label leg
   behind the documented evaluator-contract revival (the part-E pattern
   applied to finetuner.py:267 vs evaluation.py:196-287), completing the
   5/5 criterion A/B matrix (rebuild row recorded round 4:
   rebuild_classifier_multi_label_ep30_lr0.001, best val m-F1 1.000).
2. `joint_fc7_full 1` — one-epoch probe of the reference's JOINT fc7
   trainer at REAL SCALE (shipped splits: 723 labels + 10335 train
   images), measuring the per-epoch wall on this 1-core host.
3. `joint_fc7_full N` — the real leg, N picked from the probe so the run
   finishes inside the round (<= 40, >= 10, ~6 h ceiling). If even 10
   epochs don't fit, the probe wall IS the deliverable (the measured
   record showing why sandbox scale is the feasible bound).
4. `rebuild_joint_fc7_full N` — the rebuild on the byte-identical data
   and epoch budget (JAX CPU; its whole-epoch lax.scan makes this the
   cheap side).

Legs whose results.json record already exists are skipped (host resets
re-enter this script safely). Every completed leg is mirrored into
R5_RESULTS_AUTO.md (git-tracked) so a wipe cannot eat it.

Launch: cd /root/repo && nohup setsid python tools/run_cpu_batch_r5.py \
            > /tmp/cpu_batch_r5.log 2>&1 < /dev/null &
(The `tools/run_cpu_batch_` argv prefix is what bench.py/dryrun pause.)
"""

import json
import os
import subprocess
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

RESULTS = "experiments/ref_ab/results.json"
AUTO = "R5_RESULTS_AUTO.md"
CEILING_S = 6.5 * 3600        # ref full-scale leg budget


def log(msg):
    print(f"[r5cpu {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def results():
    try:
        return json.load(open(RESULTS))
    except (OSError, ValueError):
        return {}


def record(title, key):
    rec = results().get(key, {"error": f"{key} missing"})
    with open(AUTO, "a") as f:
        f.write(f"\n## {title} "
                f"({time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())})"
                f"\n\n```json\n{json.dumps(rec, indent=2)}\n```\n")
    log(f"recorded {key} -> {AUTO}")


def run(kind, n_epochs, name):
    if results().get(name, {}).get("status") == "ok" or (
            kind.startswith("rebuild_") and name in results()):
        log(f"SKIP {name}: already recorded")
        return
    log(f"START {kind} {n_epochs}")
    t0 = time.time()
    r = subprocess.run([sys.executable, "tools/reference_ab.py", kind,
                        str(n_epochs)], check=False)
    log(f"END {kind} {n_epochs}: rc={r.returncode} "
        f"wall={time.time() - t0:.0f}s")


def main():
    run("classifier_multi_label_revived", 30,
        "classifier_multi_label_revived_ep30_lr0.001")
    record("classifier multi_label A/B — reference behind the documented "
           "evaluator-contract revival (5/5 criterion matrix; rebuild row "
           "= r4 rebuild_classifier_multi_label_ep30_lr0.001)",
           "classifier_multi_label_revived_ep30_lr0.001")

    # --- real-scale joint fc7: probe, then size the epoch budget
    run("joint_fc7_full", 1, "joint_fc7_full_ep1_lr0.01")
    record("joint fc7 REAL-SCALE probe — 1 epoch, reference trainer on "
           "shipped splits (723 labels + 10335 train images)",
           "joint_fc7_full_ep1_lr0.01")
    probe = results().get("joint_fc7_full_ep1_lr0.01", {})
    wall = probe.get("wall_s")
    if probe.get("status") != "ok" or not wall:
        log(f"probe failed ({probe.get('status')!r}) — stopping the "
            f"full-scale chain; the probe record is the deliverable")
        log("CPU_BATCH_R5 DONE")
        return
    # the 1-ep probe wall = setup (graph closure etc.) + 1 epoch + final
    # eval; a conservative per-epoch estimate is the whole probe wall
    n = min(40, max(10, int(CEILING_S / wall / 5) * 5))
    if CEILING_S / wall < 10:
        log(f"probe wall {wall:.0f}s/epoch: even 10 epochs exceed the "
            f"{CEILING_S / 3600:.1f}h ceiling — probe is the record")
        n = 0
    if n:
        log(f"probe wall {wall:.0f}s -> running {n} epochs both sides")
        run("joint_fc7_full", n, f"joint_fc7_full_ep{n}_lr0.01")
        record(f"joint fc7 REAL-SCALE reference leg ({n} ep, lr 0.01)",
               f"joint_fc7_full_ep{n}_lr0.01")
        run("rebuild_joint_fc7_full", n,
            f"rebuild_joint_fc7_full_ep{n}_lr0.01")
        record(f"joint fc7 REAL-SCALE rebuild leg ({n} ep, lr 0.01, "
               f"identical data)", f"rebuild_joint_fc7_full_ep{n}_lr0.01")
    log("CPU_BATCH_R5 DONE")


if __name__ == "__main__":
    main()
