"""End-to-end experiment runners — the epoch loops behind the CLI drivers.

Mirrors the reference's run_model/pass_samples skeletons:

* ``run_classifier``      — ETHEC/CIFAR/FMNIST multi-head CNN training
  (finetuner.py:199-375 + experiment.py:155-224): per-epoch train pass,
  eval at intervals, per-level metrics + markdown reports, checkpoints,
  best-model tracking by val micro-F1, final test pass with score dumps.
* ``run_label_embedding``  — label-only order/cone embeddings
  (order_embeddings.py:561-693): threshold calibration on val, fixed
  threshold on test, periodic graph-reconstruction checks.
* ``run_joint_embedding``  — joint image+label embeddings
  (oe_h.py:1512-1965): curriculum, classification-metric model selection,
  reconstruction, dual checkpoints.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, Optional, Sequence

import jax
import numpy as np

from ..data import ImagePipeline, WeightedResampler, shuffled_order
from ..eval import multilevel_metrics, hierarchical_match_counts
from ..eval.multilabel import (
    multilabel_metrics,
    tune_per_class_thresholds,
    tune_single_threshold,
)
from ..eval.reports import Summarize
from .classifier import ClassifierConfig, ClassifierTrainer
from .experiment import Checkpointer, ExperimentDir, MetricsLogger, write_manifest

__all__ = ["run_classifier", "run_label_embedding", "run_joint_embedding",
           "run_joint_cnn"]


# ---------------------------------------------------------------------------
# classifier
# ---------------------------------------------------------------------------

def _eval_pass(trainer, pipe, order):
    """Collect scores / labels / loss over one split. On a mesh, ragged
    eval tails are padded to the full batch (sharding needs even shards)
    and the padded rows are dropped from the results."""
    bs = trainer.cfg.batch_size
    scores, labels, multihots = [], [], []
    loss_sum, loss_rows = 0.0, 0
    pad_loss_sum, pad_loss_rows = 0.0, 0
    for batch in pipe.batches(order):
        n = len(batch["image"])
        padded = trainer.mesh is not None and n < bs
        if padded:
            batch = {k: np.concatenate(
                [v, np.repeat(v[-1:], bs - n, axis=0)]) for k, v in
                batch.items()}
        b = trainer.put_batch(batch["image"], batch["level_labels"],
                              batch["multihot"])
        loss, s = trainer.eval_step(trainer.state, *b)
        scores.append(np.asarray(s)[:n])
        labels.append(batch["level_labels"][:n])
        multihots.append(batch["multihot"][:n])
        if not padded:
            # a padded tail's batch-mean loss includes the duplicated
            # padding rows — keep the loss average exact by counting
            # full batches only (scores/labels are sliced either way)
            loss_sum += float(loss) * n
            loss_rows += n
        else:
            pad_loss_sum += float(loss) * n
            pad_loss_rows += n
    if loss_rows == 0:
        # every batch was a padded tail (split < batch_size on a mesh):
        # report the pad-biased mean rather than a silent 0.0 loss
        loss_sum, loss_rows = pad_loss_sum, pad_loss_rows
    return (np.concatenate(scores), np.concatenate(labels),
            np.concatenate(multihots), loss_sum, max(loss_rows, 1))


def _classifier_metrics(evaluator: str, scores, level_labels, multihot,
                        labelmap, thresholds=None):
    """Score dict + the scalar used for best-model selection
    (reference tracks val micro-F1, finetuner.py:304-307)."""
    if evaluator in ("ML", "MLST"):
        th = thresholds if thresholds is not None else 0.0
        m = multilabel_metrics(scores, multihot, th, labelmap)
        flat = {"micro_f1": m["global"]["micro"]["f1"],
                "macro_f1": m["global"]["macro"]["f1"],
                "accuracy": m["global"]["accuracy_score"],
                "mAP": _mean_ap(scores, multihot)}
        for name in labelmap.level_names:
            flat[f"{name}/micro_f1"] = m[name]["micro"]["f1"]
            flat[f"{name}/macro_f1"] = m[name]["macro"]["f1"]
        return m, flat, flat["micro_f1"]
    m = multilevel_metrics(scores, level_labels, labelmap)
    match = hierarchical_match_counts(scores, level_labels, labelmap)
    flat = {"micro_f1": m["micro"]["f1"], "macro_f1": m["macro"]["f1"],
            "exact_match": match["exact_match"] / max(match["n"], 1)}
    for l, name in enumerate(labelmap.level_names):
        lv = m["levels"][l]
        flat[f"{name}/accuracy"] = lv.accuracy
        flat[f"{name}/micro_f1"] = lv.f1_micro
        flat[f"{name}/macro_f1"] = lv.f1_macro
    return m, flat, flat["micro_f1"]


def _mean_ap(scores, multihot):
    from ..eval.multilabel import per_class_pr

    _, mAP = per_class_pr(scores, multihot)
    return mAP


def _write_level_report(exp: ExperimentDir, phase: str, epoch: int,
                        flat: Dict[str, float]) -> None:
    s = Summarize(os.path.join(exp.stats, f"{phase}{epoch}"))
    s.make_heading(f"Classification Summary - Epoch {epoch} {phase}", 1)
    s.make_table([[k, f"{v:.4f}"] for k, v in sorted(flat.items())],
                 x_labels=["metric", "value"])


def run_classifier(
    labelmap,
    datasets: Dict[str, object],            # split -> EncodedDataset
    image_root: str,
    cfg: ClassifierConfig,
    *,
    experiment_dir: str,
    experiment_name: str,
    n_epochs: int,
    evaluator: str = "MLEVAL",              # ML | MLST | MLEVAL
    eval_interval: int = 1,
    n_workers: int = 4,
    weight_strategy: str = "inv",
    use_grayscale: bool = False,
    resume: bool = False,
    mesh="auto",
    manifest_args: Optional[Dict] = None,
    set_mode: str = "train",
    augment: str = "ethec",
    use_weighted_resampler: bool = True,
    generate_plots: bool = False,
    load_backbone_from: Optional[str] = None,
    n_model: int = 1,
    profile_steps: int = 0,
    input_dtype: str = "uint8",   # host->device transfer format; 'uint8'
    #   transfers raw pixels (4x less bandwidth) and scales on device —
    #   identical to 'float32' on the python pipeline (u8/255 either way);
    #   the native loader's uint8 path rounds the interpolated value once
    #   (≤0.5/255 per pixel vs its f32 path — see native/le_loader.cc)
):
    if mesh == "auto":
        # use every attached chip (pure DP) when the batch divides evenly —
        # the TPU counterpart of the reference's unconditional DataParallel
        # wrap (ethec_experiments.py:240)
        from ..parallel.mesh import make_mesh

        n_dev = jax.device_count()
        n_model = max(1, n_model)
        n_data = max(n_dev // n_model, 1)
        mesh = (make_mesh(n_data=n_data, n_model=n_model)
                if n_dev > 1 and cfg.batch_size % n_data == 0 else None)

    exp = ExperimentDir(experiment_dir, experiment_name)
    write_manifest(exp, manifest_args or {})
    logger = MetricsLogger(exp)
    ckpt = Checkpointer(exp)

    if cfg.lr_steps and cfg.steps_per_epoch <= 1:
        # lr_steps are epoch numbers (reference MultiStepLR) — the optimizer
        # needs the epoch length in optimizer steps to place the boundaries
        cfg = dataclasses.replace(
            cfg,
            steps_per_epoch=max(len(datasets["train"]) // cfg.batch_size, 1))
    trainer = ClassifierTrainer(labelmap, cfg, mesh=mesh,
                                grayscale=use_grayscale)
    if load_backbone_from:
        # pretrained torchvision weights (reference pretrained=True,
        # finetuner.py:117-128)
        trainer.load_backbone_state_dict(load_backbone_from)
    pipes = {
        split: ImagePipeline(
            ds, labelmap, image_root, image_size=cfg.image_size,
            batch_size=cfg.batch_size, train=(split == "train"),
            grayscale=use_grayscale, num_workers=n_workers, augment=augment,
            out_dtype=input_dtype)
        for split, ds in datasets.items()
    }
    resampler = WeightedResampler(datasets["train"].leaf_labels,
                                  labelmap.levels[-1], weight_strategy)
    if not use_weighted_resampler:
        resampler = None

    start_epoch = 0
    thresholds = None
    best_score, best_epoch = -1.0, -1

    # checkpoints carry the loop's best-model bookkeeping alongside the
    # trainer payload so --resume keeps competing against the ORIGINAL
    # best val score instead of overwriting best_model with the first
    # post-resume eval (same contract as the joint runner)
    def _payload():
        return dict(trainer.checkpoint_payload(),
                    best_score=float(best_score),
                    best_epoch=float(best_epoch))

    like = _payload()
    if resume:
        latest = ckpt.find_existing_weights()
        if latest is not None:
            payload = ckpt.load(latest, like)
            best_score = float(payload.pop("best_score"))
            best_epoch = int(payload.pop("best_epoch"))
            trainer.restore_payload(payload)
            start_epoch = latest + 1

    rng = np.random.RandomState(cfg.seed)

    if profile_steps and set_mode == "train":
        # jax.profiler trace of the first N train steps -> exp/stats/trace
        from ..utils.profiling import summarize_trace, trace_steps

        pb = next(iter(pipes["train"].batches(
            np.arange(min(len(datasets["train"]), cfg.batch_size)), seed=0)))
        b = trainer.put_batch(pb["image"], pb["level_labels"], pb["multihot"])
        trainer.state, _ = trainer.train_step(trainer.state, *b)  # compile
        tdir = os.path.join(exp.stats, "trace")

        def one_step():
            trainer.state, loss = trainer.train_step(trainer.state, *b)
            return loss

        trace_steps(one_step, profile_steps, tdir,
                    sync=lambda out: float(out))
        for name, ms, share in summarize_trace(tdir, profile_steps)[:10]:
            logger.scalar(f"profile/{name}_ms", ms, 0)

    def evaluate(split, epoch, tag):
        scores, ll, mh, loss, loss_rows = _eval_pass(
            trainer, pipes[split], np.arange(len(datasets[split])))
        nonlocal thresholds
        if evaluator == "ML" and split == "val":
            thresholds = tune_per_class_thresholds(scores, mh)
        elif evaluator == "MLST" and split == "val":
            thresholds = tune_single_threshold(scores, mh)
        m, flat, score = _classifier_metrics(
            evaluator, scores, ll, mh, labelmap, thresholds)
        logger.scalars(tag, flat, epoch)
        logger.scalar(f"{tag}/loss", loss / loss_rows, epoch)
        _write_level_report(exp, tag, epoch, flat)
        if cfg.head_override == "bottleneck2d":
            # per-eval 2-d label-vector plot (the ETHEC2D behavior,
            # ethec_experiments.py:155-200)
            from ..viz.contours import plot_label_vectors

            weights = [np.asarray(
                trainer.state.params[f"level_fc{l}"]["kernel"])
                for l in range(labelmap.n_levels)]
            plot_label_vectors(
                weights, labelmap,
                os.path.join(exp.stats, f"label_reps_{tag}{epoch}.png"))
        return scores, ll, score, flat

    if set_mode == "train":
        for epoch in range(start_epoch, n_epochs):
            t0 = time.time()
            order = (resampler.order(rng) if resampler is not None
                     else shuffled_order(len(datasets["train"]), rng))
            epoch_loss, n_seen = 0.0, 0
            for batch in pipes["train"].batches(order, seed=epoch):
                b = trainer.put_batch(batch["image"], batch["level_labels"],
                                      batch["multihot"])
                trainer.state, loss = trainer.train_step(trainer.state, *b)
                epoch_loss += float(loss)
                n_seen += len(batch["image"])
            logger.scalar("train/loss", epoch_loss / max(n_seen, 1), epoch)
            logger.scalar("epoch_time_train", time.time() - t0, epoch)

            if epoch % eval_interval == 0 or epoch == n_epochs - 1:
                _, _, val_score, _ = evaluate("val", epoch, "val")
                evaluate("test", epoch, "test")
                if val_score > best_score:
                    best_score, best_epoch = val_score, epoch
                    ckpt.save("best_model", _payload(), wait=False)
            # async epoch checkpoint: the write overlaps the next epoch
            # (orbax snapshots the arrays before returning)
            ckpt.save(epoch, _payload(), wait=False)
            logger.scalar("epoch_time", time.time() - t0, epoch)

    # load best + final test with score dumps (experiment.py:217-224,
    # finetuner.py:263-265)
    ckpt.wait_until_finished()   # surface async save failures here, not
    #                              inside the missing-best_model except
    if best_epoch >= 0 or set_mode != "train":
        # a failed load must not silently score freshly-initialized
        # weights: in eval-only mode it is fatal; during training we only
        # tolerate a genuinely-absent best_model (no eval interval hit)
        try:
            payload = ckpt.load("best_model", like)
            payload.pop("best_score")
            payload.pop("best_epoch")
            trainer.restore_payload(payload)
        except FileNotFoundError:
            if set_mode != "train":
                raise
    if evaluator in ("ML", "MLST") and "val" in datasets and \
            (set_mode != "train" or best_epoch >= 0):
        # calibrate ML/MLST thresholds on val with the weights that will
        # score test (evaluation.py:345-381): eval-only runs have none
        # yet; train runs just reloaded the best epoch, whose thresholds
        # differ from the last epoch's — recalibrate after best reload
        # like the joint/label-embedding runners do
        evaluate("val", max(best_epoch, 0), "best_val")
    scores, ll, test_score, flat = evaluate(
        "test", max(best_epoch, 0), "best_test")
    np.save(os.path.join(exp.stats, "predicted_scores.npy"), scores)
    np.save(os.path.join(exp.stats, "correct_labels.npy"), ll)
    if generate_plots:
        # per-class PR curves + F1-vs-train-frequency (reference
        # generate_plots path, evaluation.py:119-126, 289-340)
        from ..eval.multilabel import render_pr_curves, render_score_vs_freq

        mh_test = datasets["test"].multihot(labelmap)
        class_names = [n for names in labelmap.ix_to_name for n in names]
        render_pr_curves(scores, mh_test, class_names,
                         os.path.join(exp.stats, "pr_curves"))
        m_all, _, _ = _classifier_metrics("MLEVAL", scores, ll, mh_test,
                                          labelmap)
        train_freq = datasets["train"].multihot(labelmap).sum(axis=0)
        per_class_f1 = np.concatenate(
            [lv.per_class_f1 for lv in m_all["levels"]])
        render_score_vs_freq(per_class_f1, train_freq,
                             os.path.join(exp.stats, "f1_vs_train_freq.png"))
    ckpt.wait_until_finished()   # drain in-flight async epoch saves
    logger.close()
    return {"best_val_score": best_score, "best_epoch": best_epoch,
            "test_metrics": flat, "experiment": exp}


# ---------------------------------------------------------------------------
# label-only embeddings
# ---------------------------------------------------------------------------

def run_label_embedding(
    labelmap,
    splits,
    config,
    *,
    experiment_dir: str,
    experiment_name: str,
    n_epochs: int,
    eval_interval: int = 1,
    check_reconstr_every: int = 10,
    resume: bool = False,
    manifest_args: Optional[Dict] = None,
    init_embeddings: Optional[np.ndarray] = None,
    mesh="auto",
):
    from .embedding import EmbeddingTrainer

    if mesh == "auto":
        # shard edge batches over every attached chip when they divide
        # evenly (the reference DataParallel-wraps the Embedder,
        # order_embeddings.py:360)
        from ..parallel.mesh import make_mesh

        n_dev = jax.device_count()
        mesh = (make_mesh(n_data=n_dev, n_model=1)
                if n_dev > 1 and config.batch_size % n_dev == 0 else None)

    exp = ExperimentDir(experiment_dir, experiment_name)
    write_manifest(exp, manifest_args or {})
    logger = MetricsLogger(exp)
    ckpt = Checkpointer(exp)
    trainer = EmbeddingTrainer(labelmap, splits, config, mesh=mesh)
    if init_embeddings is not None:
        trainer.load_embedding_table(init_embeddings)

    start_epoch = 0
    best_f1, best_epoch = -1.0, -1

    # best_f1/best_epoch ride in every checkpoint so --resume keeps
    # competing against the ORIGINAL best instead of overwriting
    # best_model with the first post-resume eval (joint-runner contract).
    def _payload():
        return dict(trainer.checkpoint_payload(),
                    best_f1=float(best_f1), best_epoch=float(best_epoch))

    like = _payload()

    def _restore(payload):
        best = float(payload.pop("best_f1")), int(payload.pop("best_epoch"))
        trainer.restore_payload(payload)
        return best

    if resume:
        latest = ckpt.find_existing_weights()
        if latest is not None:
            best_f1, best_epoch = _restore(ckpt.load(latest, like))
            start_epoch = latest + 1

    viz_every = (5 if config.embedding_dim == 2 else 0)
    rng = np.random.RandomState(config.seed)
    for epoch in range(start_epoch, n_epochs):
        t0 = time.time()
        stats = trainer.train_epoch(rng)
        logger.scalars("train", stats, epoch)
        if viz_every and epoch % viz_every == 0:
            # per-epoch 2-d embedding frames (viz_toy create_images,
            # viz_toy.py:120-170)
            from ..viz.toy import plot_toy_embedding

            plot_toy_embedding(
                np.asarray(trainer.all_embeddings()), labelmap,
                os.path.join(exp.stats, f"frames/epoch_{epoch:04d}.png"),
                energy=config.energy, K=trainer.K,
                title=f"epoch {epoch}")
        if epoch % eval_interval == 0 and len(splits.val):
            val = trainer.evaluate("val")
            logger.scalars("val", {"f1": float(val.f1),
                                   "threshold": float(val.threshold),
                                   "accuracy": float(val.accuracy)}, epoch)
            if float(val.f1) > best_f1:
                best_f1, best_epoch = float(val.f1), epoch
                ckpt.save("best_model", _payload())
        if check_reconstr_every and epoch % check_reconstr_every == 0:
            rec = trainer.reconstruction()
            logger.scalars("reconstruction", {
                "f1": float(rec.f1), "accuracy": float(rec.accuracy),
                "threshold": float(rec.threshold)}, epoch)
        ckpt.save(epoch, _payload())
        logger.scalar("epoch_time", time.time() - t0, epoch)

    results = {"best_val_f1": best_f1, "best_epoch": best_epoch}
    # final test/reconstruction on the BEST model with ITS calibrated
    # threshold (reference load_best_model before the final passes,
    # order_embeddings.py:566,601,715)
    if best_epoch >= 0:
        _restore(ckpt.load("best_model", like))
    if len(splits.test):
        if trainer.optimal_threshold is None and len(splits.val):
            # never sweep the threshold on test data: calibrate on val
            trainer.evaluate("val")
        if trainer.optimal_threshold is None:
            # no val edges exist to calibrate a threshold — skip the test
            # edge score rather than sweep the threshold on test data
            print("run_label_embedding: no val edges — skipping test "
                  "edge-F1 (no calibrated threshold)")
        else:
            test = trainer.evaluate("test")
            results["test_f1"] = float(test.f1)
            logger.scalars("test", {"f1": float(test.f1)}, n_epochs)
    rec = trainer.reconstruction()
    results["reconstruction_f1"] = float(rec.f1)
    logger.close()
    return {**results, "trainer": trainer, "experiment": exp}


# ---------------------------------------------------------------------------
# joint embeddings (shared loop for the fc7 and --use_CNN paths)
# ---------------------------------------------------------------------------

def _run_joint_loop(
    trainer,
    eval_split,          # (split) -> (metrics dict, edge metrics or None)
    *,
    exp: ExperimentDir,
    n_epochs: int,
    eval_interval: int,
    has_val_edges: bool,  # whether eval_split('val') can calibrate a thresh
    resume: bool,
    seed: int,
):
    """The joint-experiment contract both trainers share (reference
    JointEmbeddings.run_model, oe_h.py:1512-1965): per-epoch train, val
    classification metrics select the best model, val edge pass calibrates
    `optimal_threshold` (persisted in every checkpoint, oe_h.py:1876-1909),
    --resume from the latest numbered checkpoint, best reload + val
    recalibration before the final test + reconstruction."""
    logger = MetricsLogger(exp)
    ckpt = Checkpointer(exp)

    # checkpoints carry the loop's best-model bookkeeping alongside the
    # trainer payload, so --resume keeps competing against the ORIGINAL
    # best val score instead of overwriting best_model with the first
    # post-resume eval
    def _payload(best_f1, best_epoch):
        return dict(trainer.checkpoint_payload(),
                    best_f1=float(best_f1), best_epoch=float(best_epoch))

    like = _payload(-1.0, -1)
    best_f1, best_epoch = -1.0, -1
    start_epoch = 0
    if resume:
        latest = ckpt.find_existing_weights()
        if latest is not None:
            payload = ckpt.load(latest, like)
            best_f1 = float(payload.pop("best_f1"))
            best_epoch = int(payload.pop("best_epoch"))
            trainer.restore_payload(payload)
            start_epoch = latest + 1

    def _eval(split):
        m, em = eval_split(split)
        if em is not None and split == "val":
            trainer.optimal_threshold = float(em.threshold)
        return m, em

    rng = np.random.RandomState(seed)
    for epoch in range(start_epoch, n_epochs):
        t0 = time.time()
        stats = trainer.train_epoch(epoch, rng)
        logger.scalars("train", stats, epoch)
        if epoch % eval_interval == 0:
            m, em = _eval("val")
            scal = {k: v for k, v in m.items() if isinstance(v, float)}
            if em is not None:
                scal["edge_f1"] = float(em.f1)
                scal["edge_threshold"] = float(em.threshold)
            logger.scalars("val", scal, epoch)
            if m["micro_f1"] > best_f1:
                best_f1, best_epoch = m["micro_f1"], epoch
                ckpt.save("best_model", _payload(best_f1, best_epoch))
        ckpt.save(epoch, _payload(best_f1, best_epoch))
        logger.scalar("epoch_time", time.time() - t0, epoch)

    # reload the best model + ITS calibrated threshold before the final
    # test pass (reference loads best_model_wts and persists
    # optimal_threshold in every checkpoint, oe_h.py:1882,1909,1959-1965)
    if best_epoch >= 0:
        payload = ckpt.load("best_model", like)
        payload.pop("best_f1")
        payload.pop("best_epoch")
        trainer.restore_payload(payload)
    if trainer.optimal_threshold is None and has_val_edges:
        # never sweep the edge threshold on test data: calibrate on val
        _eval("val")
    rec = trainer.reconstruction()
    logger.scalars("reconstruction", {"f1": float(rec.f1)}, n_epochs)
    mtest, em_test = _eval("test")
    test_metrics = {k: v for k, v in mtest.items() if isinstance(v, float)}
    if em_test is not None:
        test_metrics["edge_f1"] = float(em_test.f1)
    logger.close()
    return {"best_val_micro_f1": best_f1, "best_epoch": best_epoch,
            "test_metrics": test_metrics,
            "reconstruction_f1": float(rec.f1),
            "trainer": trainer, "experiment": exp}


def run_joint_embedding(
    labelmap,
    graph,
    train_edges,
    features,
    config,
    *,
    experiment_dir: str,
    experiment_name: str,
    n_epochs: int,
    eval_interval: int = 1,
    eval_features: Optional[Dict[str, np.ndarray]] = None,
    eval_paths: Optional[Dict[str, np.ndarray]] = None,
    resume: bool = False,
    manifest_args: Optional[Dict] = None,
    mesh=None,
    init_embeddings: Optional[np.ndarray] = None,
    init_threshold: Optional[float] = None,
):
    """eval_features/eval_paths: per split ('val'/'test') fc7 arrays and
    (n, L) global ancestor paths for held-out images. `mesh`: optional
    ('data','model') mesh for the sharded fc7 step (edge batches over
    'data'). init_embeddings/init_threshold: label-table warm start
    (--load_emb_from loads both, oe_h.py:1904-1916)."""
    from .joint import JointEmbeddingTrainer

    exp = ExperimentDir(experiment_dir, experiment_name)
    write_manifest(exp, manifest_args or {})
    trainer = JointEmbeddingTrainer(labelmap, graph, train_edges, features,
                                    config, mesh=mesh)
    if init_embeddings is not None:
        trainer.load_embedding_table(init_embeddings)
    if init_threshold is not None:
        trainer.optimal_threshold = float(init_threshold)

    def eval_split(split):
        if not (eval_features and split in eval_features):
            # no held-out features: score the train images, no edge pass
            # (never sweep a threshold on test data)
            return trainer.classification_metrics(), None
        m = trainer.classification_metrics(
            img_paths_global=eval_paths[split],
            features=eval_features[split])
        th = trainer.optimal_threshold if split == "test" else None
        if split == "test" and th is None:
            return m, None
        em = trainer.edge_metrics(eval_paths[split], eval_features[split],
                                  threshold=th)
        return m, em

    return _run_joint_loop(
        trainer, eval_split, exp=exp, n_epochs=n_epochs,
        eval_interval=eval_interval,
        has_val_edges=bool(eval_features and "val" in eval_features),
        resume=resume, seed=config.seed)


def run_joint_cnn(
    labelmap,
    graph,
    train_edges,
    pixel_loader,
    config,
    *,
    experiment_dir: str,
    experiment_name: str,
    n_epochs: int,
    eval_interval: int = 1,
    eval_sets: Optional[Dict[str, tuple]] = None,   # split -> (paths, loader)
    eval_max_images: Optional[int] = None,
    resume: bool = False,
    manifest_args: Optional[Dict] = None,
    mesh=None,
    init_embeddings: Optional[np.ndarray] = None,
    init_threshold: Optional[float] = None,
    init_tower: Optional[tuple] = None,   # (trunk_params, trunk_stats)
    train_eval_loader=None,
):
    """--use_CNN joint runner: same experiment contract as the fc7 path
    (shared `_run_joint_loop`), with image embeddings computed through the
    CNN tower. eval_sets[split] = ((n, L) global ancestor paths,
    loader(rows)->pixels); when absent, falls back to the train images
    (scored with `train_eval_loader` when given — the train pixel_loader
    augments, which would jitter eval). eval_max_images caps eval
    embedding work per split via a seeded RANDOM subsample — the cap is
    LOGGED (the reference scores full splits, oe_h.py:1971-2178; no
    silent caps; split jsons are taxon-ordered, so a prefix would score
    one branch only)."""
    from .joint_cnn import JointCNNTrainer

    exp = ExperimentDir(experiment_dir, experiment_name)
    write_manifest(exp, manifest_args or {})
    trainer = JointCNNTrainer(labelmap, graph, train_edges, pixel_loader,
                              config, mesh=mesh)
    if init_embeddings is not None:
        trainer.load_embedding_table(init_embeddings)
    if init_threshold is not None:
        trainer.optimal_threshold = float(init_threshold)
    if init_tower is not None:
        # the reference's two-stage FeatCNN recipe: the joint image tower
        # starts from a finetuned classifier's trunk (oe.py:232-289)
        trainer.load_tower_trunk(*init_tower)

    def eval_split(split):
        held_out = bool(eval_sets and split in eval_sets)
        if held_out:
            paths, loader = eval_sets[split]
        else:
            paths = graph.image_paths_global
            loader = train_eval_loader or trainer.pixel_loader
            if train_eval_loader is None:
                print("run_joint_cnn: no eval_sets and no "
                      "train_eval_loader — scoring train images with the "
                      "AUGMENTING train loader (metrics will jitter)")
        paths = np.asarray(paths)
        rows = np.arange(len(paths))
        if eval_max_images is not None and len(rows) > eval_max_images:
            print(f"run_joint_cnn: capping {split} eval at "
                  f"{eval_max_images} of {len(rows)} images, seeded "
                  f"random subsample (--eval_max_images)")
            rows = np.random.RandomState(config.seed + 7).choice(
                len(rows), eval_max_images, replace=False)
        embs = trainer.image_embeddings_for_rows(
            rows, loader=loader, batch_size=config.batch_size)
        m = trainer.classification_metrics(paths[rows], embs)
        if not held_out:
            return m, None        # no edge pass on train images
        th = trainer.optimal_threshold if split == "test" else None
        if split == "test" and th is None:
            return m, None        # never sweep the threshold on test
        em = trainer.edge_metrics(paths[rows], embs, threshold=th)
        return m, em

    return _run_joint_loop(
        trainer, eval_split, exp=exp, n_epochs=n_epochs,
        eval_interval=eval_interval,
        has_val_edges=bool(eval_sets and "val" in eval_sets),
        resume=resume, seed=config.seed)
