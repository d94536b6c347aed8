"""Headline benchmark: ETHEC ResNet-50 hierarchical training throughput.

Measures steady-state images/sec of the full jitted training step
(ResNet-50 multi-head @ 448², bf16 compute, MultiLevelCE over the real
6/21/135/561 ETHEC taxonomy, adam) on the attached TPU chip with synthetic
input batches (isolates device throughput from host IO, which the driver
benches separately).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline: the reference never measures throughput (BASELINE.md); the
comparison point is the driver-set north star — PyTorch ResNet-50@448 AMP
training on one A100 ≈ 500 images/sec (scaled from canonical ~2000 img/s
@224 benchmarks; 4× pixels) — so vs_baseline = value / 500, and the 3×
target of BASELINE.json corresponds to vs_baseline ≥ 3.0.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import json
import time

import numpy as np

BASELINE_IMG_PER_SEC = 500.0  # A100 PyTorch AMP ResNet-50 @448 train (est.)


def _unique_tower_images(prepared, n_labels):
    """Distinct images the CNN tower processes in one prepared joint step:
    positive AND negative image nodes (the reference-parity sampler
    corrupts label->image edges with image negatives on the image-level
    pass). prepared[1:5] = (pos_from, pos_to, neg_from, neg_to)."""
    ids = np.concatenate([np.asarray(prepared[j]).reshape(-1)
                          for j in (1, 2, 3, 4)])
    return int(len(np.unique(ids[ids >= n_labels])))


def _time_classifier(labelmap, batch_size, steps, warmup, **cfg_kw):
    """Steady-state img/s of one jitted classifier train step."""
    import jax.numpy as jnp
    from learning_embeddings_tpu.train.classifier import (
        ClassifierConfig, ClassifierTrainer)

    cfg = ClassifierConfig(backbone="resnet50", criterion="multi_level_ce",
                           lr=1e-5, optimizer="adam", image_size=448,
                           batch_size=batch_size, seed=0, **cfg_kw)
    trainer = ClassifierTrainer(labelmap, cfg, mesh=None)

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(batch_size, 448, 448, 3).astype(np.float32))
    paths = labelmap.leaf_paths()
    ll = jnp.asarray(
        paths[rng.randint(0, labelmap.levels[-1], batch_size)].astype(np.int32))
    multihot = jnp.zeros((batch_size, labelmap.n_classes), jnp.float32)

    state = trainer.state
    for _ in range(warmup):
        state, loss = trainer.train_step(state, images, ll, multihot)
    _ = float(loss)  # value fetch: block_until_ready does not reliably
    #                  synchronize through the axon remote-execution tunnel

    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = trainer.train_step(state, images, ll, multihot)
    _ = float(loss)  # forces the whole step chain (loss_N <- state_{N-1})
    return batch_size * steps / (time.perf_counter() - t0)


def main(batch_size: int = 128, steps: int = 20, warmup: int = 3):
    from __graft_entry__ import _ethec_labelmap

    labelmap = _ethec_labelmap()
    ips = _time_classifier(labelmap, batch_size, steps, warmup)
    line = {
        "metric": "ETHEC ResNet-50@448 multi-level-CE train throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 3),
    }
    # the supported fine-tune configuration (--freeze_bn: BN in inference
    # mode, the reference's pretrained-finetune regime — finetuner.py:138
    # feature-extracting mode is the extreme of the same axis). Measured
    # +23% over BN-train (BASELINE.md r2-r4). Reported alongside the
    # BN-train default so the round artifact carries the framework's best
    # honest number; fewer steps — the extra remote compile dominates.
    try:
        fb = _time_classifier(labelmap, batch_size, max(steps // 2, 8),
                              2, freeze_bn=True)
        line["freeze_bn"] = round(fb, 2)
        line["freeze_bn_vs_baseline"] = round(fb / BASELINE_IMG_PER_SEC, 3)
    except Exception as e:  # noqa: BLE001 — secondary number must never
        line["freeze_bn_error"] = f"{type(e).__name__}: {e}"  # eat the line
    print(json.dumps(line))


def main_joint(batch_size: int = 16, steps: int = 10, warmup: int = 2,
               image_size: int = 448):
    """North-star workload (BASELINE.json): ResNet-50 + hyperbolic-cone
    JOINT training (--use_CNN) — images/sec counts unique images through
    the CNN tower per step."""
    import jax
    import numpy as np
    from __graft_entry__ import _ethec_labelmap
    from learning_embeddings_tpu.losses.joint_sampling import build_joint_graph
    from learning_embeddings_tpu.train.joint_cnn import (
        JointCNNConfig, JointCNNTrainer)

    labelmap = _ethec_labelmap()
    rng = np.random.RandomState(0)
    n_img = 2048
    leaves = rng.randint(0, labelmap.levels[-1], n_img)
    ll = labelmap.leaf_paths()[leaves]
    graph, train_edges = build_joint_graph(labelmap, ll)
    # only (label -> image) edges in the bench batches: every step drives
    # the CNN tower with a full batch of pixels
    img_edges = train_edges[train_edges[:, 1] >= labelmap.n_classes]
    pixel_bank = rng.rand(64, image_size, image_size, 3).astype(np.float32)

    def pixel_loader(rows):
        return pixel_bank[np.asarray(rows) % len(pixel_bank)]

    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet50",
                         embedding_dim=10, image_size=image_size,
                         batch_size=batch_size, neg_to_pos_ratio=5,
                         alpha=0.05, pick_per_level=True, seed=0)
    trainer = JointCNNTrainer(labelmap, graph, img_edges[:10000],
                              pixel_loader, cfg)
    edges = img_edges[rng.permutation(len(img_edges))]

    def batch(i):
        e = edges[(i * batch_size) % (len(edges) - batch_size):][:batch_size]
        return e[:, 0], e[:, 1]

    # prepare all batches up front: host prep + transfers are input-pipeline
    # work a production host overlaps with compute (and this dev tunnel's
    # 15 MB/s host->device link would otherwise dominate the measurement)
    prepared = [trainer.prepare_batch(*batch(i))
                for i in range(warmup + steps)]

    n_imgs = sum(_unique_tower_images(p, labelmap.n_classes)
                 for p in prepared[warmup:])
    # warm EVERY pixel-bucket shape the timed loop will hit, not just the
    # first `warmup` batches: the step compiles once per bucket, and a
    # fresh remote compile (~10 min through the axon tunnel) landing
    # inside the timed window would silently collapse the reported rate
    warmed = set()
    loss = None
    for p in prepared[:warmup]:
        warmed.add(p[0].shape[0])
        loss, _, _ = trainer.train_prepared(p)
    for p in prepared[warmup:]:
        if p[0].shape[0] not in warmed:
            warmed.add(p[0].shape[0])
            loss, _, _ = trainer.train_prepared(p)
    if loss is not None:
        _ = float(loss)
    t0 = time.perf_counter()
    for p in prepared[warmup:]:
        loss, e_pos, e_neg = trainer.train_prepared(p)
    _ = float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "ETHEC ResNet-50 hyperbolic-cone joint train throughput",
        "value": round(n_imgs / dt, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(n_imgs / dt / BASELINE_IMG_PER_SEC, 3),
    }))


def main_hostfed(batch_size: int = 128, steps: int = 6, n_images: int = 256,
                 src_size: int = 512):
    """Host-fed train bench: the step is fed from the real input path —
    native JPEG loader (decode → resize → crop → flip → normalize) over
    generated JPEGs, NO pre-staging (reference DataLoader-worker path,
    ethec_experiments.py:351-364).

    Reports the host pipeline's standalone throughput AND the end-to-end
    host→device train rate. NOTE (BASELINE.md): this dev harness reaches
    the chip through a ~15 MB/s tunnel, so the end-to-end number here is
    transfer-dominated; on a real TPU host (PCIe) the host pipeline rate
    vs the device step rate determines whether training is input-bound."""
    import tempfile

    import cv2
    import jax.numpy as jnp
    from __graft_entry__ import _ethec_labelmap
    from learning_embeddings_tpu.data import ImagePipeline, encode_records
    from learning_embeddings_tpu.train.classifier import (
        ClassifierConfig, ClassifierTrainer)

    labelmap = _ethec_labelmap()
    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="bench_hostfed_")
    leaves = labelmap.leaf_paths()
    records = []
    for i in range(n_images):
        name = f"im_{i}.jpg"
        cv2.imwrite(os.path.join(tmp, name),
                    rng.randint(0, 255, (src_size, src_size, 3), np.uint8))
        path = leaves[rng.randint(0, labelmap.levels[-1])]
        records.append({"token": f"t{i}", "image_path": "", "image_name": name,
                        "family": labelmap.ix_to_name[0][path[0]],
                        "subfamily": labelmap.ix_to_name[1][path[1]],
                        "genus": labelmap.ix_to_name[2][path[2]],
                        "specific_epithet":
                            labelmap.ix_to_name[3][path[3]].split("_", 1)[1]})
    ds = encode_records(records, labelmap)
    # uint8 transfer format (the run_classifier default): 4x less
    # host->device bandwidth, /255 fused into the first conv on device
    pipe = ImagePipeline(ds, labelmap, tmp, image_size=448,
                         batch_size=batch_size, train=True, num_workers=8,
                         out_dtype="uint8")

    # (a) host pipeline standalone
    order = rng.randint(0, n_images, batch_size * steps)
    t0 = time.perf_counter()
    n = 0
    for batch in pipe.batches(order, seed=0):
        n += len(batch["image"])
    host_ips = n / (time.perf_counter() - t0)

    # (b) end-to-end host-fed training (includes device transfer per step)
    cfg = ClassifierConfig(backbone="resnet50", criterion="multi_level_ce",
                           lr=1e-5, optimizer="adam", image_size=448,
                           batch_size=batch_size, seed=0)
    trainer = ClassifierTrainer(labelmap, cfg, mesh=None)
    state = trainer.state
    warm = next(iter(pipe.batches(order[:batch_size], seed=1)))
    b = trainer.put_batch(warm["image"], warm["level_labels"],
                          warm["multihot"])
    state, loss = trainer.train_step(state, *b)
    _ = float(loss)
    t0 = time.perf_counter()
    n = 0
    for batch in pipe.batches(order, seed=2):
        b = trainer.put_batch(batch["image"], batch["level_labels"],
                              batch["multihot"])
        state, loss = trainer.train_step(state, *b)
        n += len(batch["image"])
    _ = float(loss)
    e2e_ips = n / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "ETHEC ResNet-50@448 train, host-fed (no pre-staging, "
                  "uint8 transfer)",
        "value": round(e2e_ips, 2), "unit": "images/sec/chip",
        "vs_baseline": round(e2e_ips / BASELINE_IMG_PER_SEC, 3),
        "host_pipeline_img_per_s": round(host_ips, 1),
    }))


def main_joint_hostfed(batch_size: int = 16, steps: int = 8,
                       n_images: int = 128, src_size: int = 512,
                       image_size: int = 448):
    """Host-fed JOINT (--use_CNN) bench: every step's unique images are
    decoded+augmented by the native loader from real JPEGs and shipped as
    uint8, with NO pre-staging — measures the production input path of the
    north-star workload (reference loads pixels in dataset workers,
    oe_h.py:583-736)."""
    import tempfile

    import cv2
    from __graft_entry__ import _ethec_labelmap
    from learning_embeddings_tpu.data import native_loader
    from learning_embeddings_tpu.losses.joint_sampling import build_joint_graph
    from learning_embeddings_tpu.train.joint_cnn import (
        JointCNNConfig, JointCNNTrainer)

    labelmap = _ethec_labelmap()
    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="bench_joint_hostfed_")
    paths_disk = []
    for i in range(n_images):
        p = os.path.join(tmp, f"im_{i}.jpg")
        cv2.imwrite(p, rng.randint(0, 255, (src_size, src_size, 3), np.uint8))
        paths_disk.append(p)

    leaves = rng.randint(0, labelmap.levels[-1], 2048)
    ll = labelmap.leaf_paths()[leaves]
    graph, train_edges = build_joint_graph(labelmap, ll)
    img_edges = train_edges[train_edges[:, 1] >= labelmap.n_classes]

    def pixel_loader(rows):
        rows = np.asarray(rows)
        # pad=0: joint train transform = resize + hflip, no crop
        # (oe_h.py:1463-1467)
        batch, status = native_loader.load_augment_batch(
            [paths_disk[int(r) % n_images] for r in rows], image_size,
            pad=0, train=True, seed=int(rows[0]) if len(rows) else 0,
            out_dtype=np.uint8)
        assert (status == 0).all()
        return batch

    cfg = JointCNNConfig(energy="hyp_cone", backbone="resnet50",
                         embedding_dim=10, image_size=image_size,
                         batch_size=batch_size, neg_to_pos_ratio=5,
                         alpha=0.05, pick_per_level=True, seed=0)
    trainer = JointCNNTrainer(labelmap, graph, img_edges[:10000],
                              pixel_loader, cfg)
    edges = img_edges[rng.permutation(len(img_edges))]

    def batch(i):
        e = edges[(i * batch_size) % (len(edges) - batch_size):][:batch_size]
        return e[:, 0], e[:, 1]

    # warm up every pixel-bucket shape the timed loop will hit (the step
    # compiles once per bucket; remote compiles must stay out of the timed
    # loop). Seeding the sampler per step makes the discovery pass see the
    # exact batches the timed pass will produce.
    def prep(i):
        trainer._rng = np.random.RandomState(1000 + i)
        return trainer.prepare_batch(*batch(i))

    warmed = set()
    for i in range(1, steps + 1):
        prepared = prep(i)
        if prepared[0].shape[0] not in warmed:
            warmed.add(prepared[0].shape[0])
            loss, _, _ = trainer.train_prepared(prepared)
            _ = float(loss)
    # host prep of step k+1 overlaps the device step of step k (the
    # production input path: run_joint_cnn trains with the same one-deep
    # prefetch)
    from learning_embeddings_tpu.data.pipeline import prefetch_one

    kept = []   # count unique images AFTER the timed loop (bookkeeping is
    #             measurement-only work, not part of the production path)
    t0 = time.perf_counter()
    for prepared in prefetch_one(prep(i) for i in range(1, steps + 1)):
        kept.append(prepared)
        loss, _, _ = trainer.train_prepared(prepared)
    _ = float(loss)
    dt = time.perf_counter() - t0
    n_imgs = sum(_unique_tower_images(p, labelmap.n_classes) for p in kept)
    print(json.dumps({
        "metric": "ETHEC ResNet-50 hyp-cone joint train, host-fed "
                  "(native JPEG loader, uint8 transfer, one-deep prefetch)",
        "value": round(n_imgs / dt, 2), "unit": "images/sec/chip",
        "vs_baseline": round(n_imgs / dt / BASELINE_IMG_PER_SEC, 3),
    }))


def _dispatch():
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "joint":
        main_joint(batch_size=int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    elif len(sys.argv) > 1 and sys.argv[1] == "hostfed":
        main_hostfed(batch_size=int(sys.argv[2]) if len(sys.argv) > 2 else 128)
    elif len(sys.argv) > 1 and sys.argv[1] == "joint_hostfed":
        main_joint_hostfed(
            batch_size=int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    else:
        bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
        main(batch_size=bs)


# the axon TPU backend goes through transient multi-hour outages that
# surface as "UNAVAILABLE: TPU backend setup/compile error" at client init,
# before any user code runs (it ate round 3's perf capture — BENCH_r03 is a
# traceback). A failed init poisons the in-process jax backend state, so
# retry by re-exec'ing this script with an attempt counter in the env:
# 3 attempts total, 12.5 min apart (outages that clear do so within ~15 min).
_RETRIABLE = ("UNAVAILABLE", "TPU backend", "Unable to initialize backend",
              "DEADLINE_EXCEEDED", "failed to connect")
_MAX_ATTEMPTS = 3
_RETRY_DELAY_S = 750


#: setsid session leaders whose whole groups get suspended around a timed
#: bench: the CPU A/B batches (a 98%-CPU torch leg depresses even the
#: device-fed numbers through the dispatch loop on this 1-core host) and
#: the round-4 TPU quality queue (a second axon client mid-quality-run
#: would contend for the single chip/tunnel during the driver's round-end
#: capture; both the orchestrator and the watcher retry a stage whose
#: client went stale across the pause). Groups ALREADY stopped are
#: skipped — the watcher pauses the orchestrator on purpose, and resuming
#: it from here would put two axon clients on the single chip.
_PAUSE_PREFIXES = ("tools/run_cpu_batch_", "tools/r4_tpu_orchestrator",
                   "tools/r4_warm4_watcher", "tools/r5_tpu_orchestrator")


def _pause_cpu_batches():
    """Best-effort: suspend contending process groups (_PAUSE_PREFIXES,
    setsid leaders — found by EXACT argv[1] prefix in /proc, never by
    pkill/pgrep patterns) for the duration of this bench. Never our OWN
    process group (when the orchestrator itself spawns this bench, the
    bench shares its group — a killpg would self-suspend). Each pause
    spawns a detached insurance timer that SIGCONTs the group after 3 h:
    the outage-retry path execve's this process, so no in-process
    finally/atexit can own the resume across attempts."""
    import signal
    import subprocess
    pgids = []
    own = os.getpgrp()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                argv = f.read().split(b"\0")
            with open(f"/proc/{pid}/stat") as f:
                state = f.read().rsplit(")", 1)[1].split()[0]
        except OSError:
            continue
        if len(argv) < 2 or not argv[1].decode(
                "utf-8", errors="replace").startswith(_PAUSE_PREFIXES):
            continue
        if state in ("T", "t"):     # already stopped — not ours to resume
            continue
        try:
            pgid = os.getpgid(int(pid))
        except OSError:
            continue
        if pgid != int(pid):        # the setsid leader only
            continue
        if pgid == own:             # never self-suspend
            continue
        try:
            os.killpg(pgid, signal.SIGSTOP)
        except OSError:
            continue
        pgids.append(pgid)
        subprocess.Popen(
            ["setsid", "sh", "-c",
             f"sleep 10800; kill -CONT -{pgid} 2>/dev/null"],
            start_new_session=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return pgids


def _resume_cpu_batches(pgids):
    import signal
    for pgid in pgids:
        try:
            os.killpg(pgid, signal.SIGCONT)
        except OSError:
            pass


def _stale_fallback():
    """Last resort when every live attempt hit the outage: re-emit the most
    recent SAME-MODE capture teed by the TPU orchestrator this round
    (experiments/r*_tpu/*/bench_<mode>.json — real TPU measurements, just
    taken earlier than this invocation), explicitly labeled stale. Returns
    True if a line was emitted."""
    import glob
    import sys
    mode = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].isdigit() \
        else "default"
    candidates = sorted(
        glob.glob(f"experiments/r*_tpu/*/bench_{mode}.json")
        + glob.glob(f"experiments/r*_tpu/bench_{mode}.json"),
        key=os.path.getmtime, reverse=True)
    for path in candidates:
        try:
            lines = [ln for ln in open(path).read().splitlines() if ln.strip()]
        except OSError:
            continue
        for ln in reversed(lines):
            try:
                rec = json.loads(ln)
            except ValueError:
                continue
            if not isinstance(rec, dict) or "metric" not in rec:
                continue
            rec["stale"] = True
            rec["stale_reason"] = ("TPU backend outage at bench time; value "
                                   "is this round's most recent live capture")
            rec["captured_utc"] = time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime(os.path.getmtime(path)))
            print(json.dumps(rec))
            return True
    return False


def _run_with_outage_retry():
    import sys
    attempt = int(os.environ.get("LE_BENCH_ATTEMPT", "0"))
    try:
        _dispatch()
    except Exception as e:  # noqa: BLE001 — filtered to init-time outages
        msg = f"{type(e).__name__}: {e}"
        if not any(tok in msg for tok in _RETRIABLE):
            raise
        if attempt + 1 >= _MAX_ATTEMPTS:
            import traceback
            traceback.print_exc()
            if _stale_fallback():
                return
            raise
        import traceback
        traceback.print_exc()
        print(f"bench: transient TPU-backend failure "
              f"(attempt {attempt + 1}/{_MAX_ATTEMPTS}); retrying in "
              f"{_RETRY_DELAY_S}s", file=sys.stderr, flush=True)
        time.sleep(_RETRY_DELAY_S)
        env = dict(os.environ, LE_BENCH_ATTEMPT=str(attempt + 1))
        os.execve(sys.executable, [sys.executable] + sys.argv, env)


if __name__ == "__main__":
    _paused = _pause_cpu_batches()
    try:
        _run_with_outage_retry()
    finally:
        _resume_cpu_batches(_paused)
