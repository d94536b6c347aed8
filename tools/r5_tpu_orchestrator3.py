"""Round-5 TPU queue, consolidated and VALUE-ORDERED.

Replaces r5_tpu_orchestrator{,2}: with the round end plausibly closer
than the original queue's ~9 h, the highest-judged-value evidence must
land (and be auto-mirrored) first. Order:

  1. bench_default tee — insurance for the driver's round-end capture
     (bench.py's stale fallback globs experiments/r5_tpu/bench_*.json).
  2. tower-ONLY two-stage flagship (40 ep @ 4 img/leaf): the r4
     verdict's headline untried move (FeatCNN recipe, oe.py:232-289)
     in its cleanest form — classifier-warmed tower, COLD label table
     (the warm table was measured harmful on the pixel path, BASELINE
     r5), compared against cold4 (test m-F1 0.423, hit@1 L3 0.041).
     Its every-4-epoch evals are mirrored live, so even a partial run
     answers the leaf-starvation question.
  3. 8perleaf resume — the third scaling point (r3 demand #4), 11
     epochs left from its checkpoint.
  4. bench_joint tee.
  5. warm-TABLE two-stage (the reference's literal full recipe,
     + --load_emb_from, oe_h.py:1435-1436) — completes the 2x2
     warm-start matrix if time allows.

Same outage gating as before; completed stages are mirrored into
R5_RESULTS_AUTO.md (git-tracked).

Launch: cd /root/repo && nohup setsid python tools/r5_tpu_orchestrator3.py \
            > /tmp/r5_tpu_orch3.log 2>&1 < /dev/null &
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
WARM = "experiments/quality_r4_label/hyp_cone_d10_r4/weights/best_model"
RESULTS = "experiments/quality_r3/results.json"
AUTO = "R5_RESULTS_AUTO.md"
OUTAGE_TOKENS = ("UNAVAILABLE", "TPU backend", "Unable to initialize")


def log(msg):
    print(f"[orch5c {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def results():
    try:
        return json.load(open(RESULTS))
    except (OSError, ValueError):
        return {}


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


def tee_bench(mode, args):
    st = run_gated(f"bench_{mode}", [sys.executable, "bench.py"] + args)
    try:
        txt = open(f"{OUT}/bench_{mode}.log").read()
        keep = []
        for ln in txt.splitlines():
            if not (ln.startswith("{") and '"metric"' in ln):
                continue
            try:
                rec = json.loads(ln)
            except ValueError:
                continue
            # never tee a stale-fallback echo (it would masquerade as a
            # live same-round capture to bench.py's newest-mtime glob)
            if not rec.get("stale"):
                keep.append(ln)
        if keep:
            with open(f"{OUT}/bench_{mode}.json", "w") as f:
                f.write(keep[-1] + "\n")
            log(f"bench_{mode}: {keep[-1]}")
    except OSError:
        pass
    return st


def main():
    py = sys.executable
    wait_for_tpu()

    # 1. insurance tee for the driver's round-end default capture
    tee_bench("default", [])

    # 2. headline: tower-only two-stage
    st = run_gated("flagship_twostage_toweronly",
                   [py, "tools/quality_two_stage_flagship.py", "40", "4"],
                   env={"LE_TS_TAG": "_toweronly"})
    if st == "ok":
        record("flagship two-stage, tower-ONLY cell — classifier-warmed "
               "tower, COLD label table, 40 ep @ 4 img/leaf (vs cold4: "
               "test m-F1 0.423, hit@1 L3 0.041)",
               "joint_cnn_flagship_40ep_4perleaf_twostage_toweronly")

    # 3. third scaling point: resume the 8perleaf leg from its checkpoint
    if "joint_cnn_flagship_40ep_8perleaf" not in results():
        wait_for_tpu()
        st = run_gated("flagship_8perleaf_resume",
                       [py, "tools/quality_cnn_flagship.py", "40", "8"],
                       env={"LE_Q3_RESUME": "1"})
        if st == "ok":
            record("flagship_8perleaf — third scaling point (2/4/8 "
                   "img/leaf; resumed from its epoch-29 checkpoint)",
                   "joint_cnn_flagship_40ep_8perleaf")

    # 4. joint-mode bench tee
    tee_bench("joint", ["joint"])

    # 5. the reference's literal full recipe (warm tower + warm table)
    wait_for_tpu()
    cmd = [py, "tools/quality_two_stage_flagship.py", "40", "4"]
    if os.path.exists(WARM):
        cmd.append(WARM)
    st = run_gated("flagship_twostage_warmtable", cmd,
                   env={"LE_TS_TAG": "_warmtable"})
    if st == "ok":
        record("flagship two-stage, warm-TABLE cell — the reference's "
               "full FeatCNN + --load_emb_from recipe (vs warm4: test "
               "m-F1 0.414, hit@1 L3 0.002) — completes the 2x2 "
               "warm-start matrix",
               "joint_cnn_flagship_40ep_4perleaf_twostage_warmtable")
    log("R5_TPU_ORCH3 DONE")


if __name__ == "__main__":
    main()
