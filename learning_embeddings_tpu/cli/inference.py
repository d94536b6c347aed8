"""Inference / interpretability harness — counterpart of
`network/inference.py` (:42-372):

* rebuilds a trained classifier experiment from its `config_params.txt`
  manifest (the de-facto experiment contract, inference.py:43-58),
* `--mode tsne`: dumps penultimate trunk features per split
  (`{split}_representations.npy`, the forward-hook dump of
  inference.py:206-246) and renders a 3-D t-SNE per level,
* `--mode lime`: per-sample × per-level LIME explanations
  (inference.py:248-362) — SLIC superpixels + mask perturbations +
  weighted ridge surrogate, implemented from scratch in `viz/lime.py`
  (the `lime` package is unavailable here); reference call contract kept:
  hide_color=0, num_samples=100, top-5 labels × top-10 features, markdown
  table with green/red predicted labels,
* `--mode occlusion`: a simpler built-in occlusion explainer — slide a
  gray patch over the image and record the per-level score drop.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data import ImagePipeline
from ..eval.reports import Summarize
from ..train.classifier import ClassifierConfig, ClassifierTrainer
from ..train.experiment import Checkpointer, ExperimentDir, read_manifest
from .common import load_ethec_data
from .ethec_experiments import LOSS_MAP


def rebuild_from_manifest(experiment_path: str):
    """(labelmap, datasets, trainer-with-best-weights, manifest)."""
    manifest = read_manifest(os.path.join(experiment_path,
                                          "config_params.txt"))
    data_dir = manifest.get("data_dir", "/root/reference/splits/ETHEC")
    debug = manifest.get("debug", "False") == "True"
    labelmap, datasets, _ = load_ethec_data(data_dir, debug)
    cfg = ClassifierConfig(
        backbone=manifest.get("model", "resnet50"),
        criterion=LOSS_MAP.get(manifest.get("loss", "multi_level"),
                               "multi_level_ce"),
        image_size=int(manifest.get("image_size", 448)),
        batch_size=int(manifest.get("batch_size", 8)),
        seed=int(manifest.get("random_seed", 0)),
        # structural flags: without them --use_2d experiments rebuild the
        # wrong head (params under 'fc' vs 'bottleneck'/'level_fc*') and
        # the checkpoint cannot load
        head_override=("bottleneck2d"
                       if manifest.get("use_2d", "False") == "True"
                       else None),
        optimizer=manifest.get("optimizer_method", "adam"),
    )
    grayscale = manifest.get("use_grayscale", "False") == "True"
    trainer = ClassifierTrainer(labelmap, cfg, grayscale=grayscale)
    exp = ExperimentDir(*os.path.split(experiment_path.rstrip("/")))
    ckpt = Checkpointer(exp)
    # inference never touches the optimizer: templating only the weights
    # keeps this loadable regardless of which optimizer trained the run
    like = {"params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats}
    name = "best_model" if "best_model" in os.listdir(exp.weights) else \
        ckpt.find_existing_weights()
    payload = ckpt.load(name, like)
    trainer.state = trainer.state.replace(**payload)
    return labelmap, datasets, trainer, manifest, exp, grayscale


def run_tsne(experiment_path: str, image_dir: str, splits=("val", "test"),
             max_samples: int = 2000, render: bool = True,
             animate: bool = False):
    import jax
    import jax.numpy as jnp

    labelmap, datasets, trainer, manifest, exp, gray = \
        rebuild_from_manifest(experiment_path)
    outputs = {}
    for split in splits:
        if split not in datasets:
            continue
        ds = datasets[split]
        n = min(len(ds), max_samples)
        pipe = ImagePipeline(ds, labelmap, image_dir,
                             image_size=trainer.cfg.image_size,
                             batch_size=32, train=False, grayscale=gray,
                             num_workers=4)
        feats, labels = [], []
        seen = 0
        for batch in pipe.batches(np.arange(n)):
            feats.append(np.asarray(_trunk_apply(trainer,
                                                 jnp.asarray(batch["image"]))))
            labels.append(batch["level_labels"])
            seen += len(batch["image"])
        F = np.concatenate(feats)
        L = np.concatenate(labels)
        np.save(os.path.join(exp.stats, f"{split}_representations.npy"), F)
        np.save(os.path.join(exp.stats, f"{split}_level_labels.npy"), L)
        outputs[split] = (F, L)
        if render:
            from ..viz.tsne import render_tsne

            render_tsne(F, L, labelmap,
                        os.path.join(exp.stats, f"tsne_{split}"),
                        animate=animate)
    return outputs


def _trunk_apply(trainer, images):
    """Trunk (penultimate) features of the classifier — the reference's
    forward-hook dump on the fc input (inference.py:206-246)."""
    from ..models.resnet import BACKBONES

    trunk = BACKBONES[trainer.cfg.backbone](
        num_classes=None, dtype=trainer.cfg.dtype, features_only=True)
    return trunk.apply(
        {"params": trainer.state.params["trunk"],
         "batch_stats": trainer.state.batch_stats["trunk"]},
        images, train=False)


def run_lime(experiment_path: str, image_dir: str, split: str = "test",
             n_samples: int = 2, num_perturb: int = 100,
             n_slic_segments: int = 48, top_labels: int = 5,
             num_features: int = 10):
    """Per-sample × per-level LIME explanations (inference.py:248-362).

    The reference's per-level `batch_predict` softmaxes the level slice of
    the classifier logits; `explain_instance(hide_color=0, num_samples=100,
    top_labels=5)` then `get_image_and_mask(positive_only=False,
    num_features=10)` per top label, rendered with boundary marks into a
    markdown table whose labels are green when the prediction matches the
    ground truth and red otherwise."""
    import jax
    import jax.numpy as jnp

    from ..viz.lime import (lime_explain, overlay_mask, slic_segments,
                            top_feature_mask)

    labelmap, datasets, trainer, manifest, exp, gray = \
        rebuild_from_manifest(experiment_path)
    ds = datasets[split]
    pipe = ImagePipeline(ds, labelmap, image_dir,
                         image_size=trainer.cfg.image_size, batch_size=1,
                         train=False, grayscale=gray, num_workers=2)

    @jax.jit
    def logits_fn(images):
        return trainer.model.apply(
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats}, images, train=False)

    out_dir = os.path.join(exp.stats, f"lime_{split}")
    summ = Summarize(out_dir)
    summ.make_heading(f"LIME explanations — {split}", 1)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg

    starts = np.asarray(labelmap.level_start)
    stops = starts + np.asarray(labelmap.levels)
    # per-level (level, lo, hi) slices into the raw logits — because the
    # per-level softmax blocks are concatenated in order, the same offsets
    # index the predict() output. A 'leaf' head (last_level_ce) emits
    # leaf logits only: explain just the leaf level at [0, n_leaf)
    S = trainer.cfg.image_size
    width = jax.eval_shape(logits_fn, jax.ShapeDtypeStruct(
        (1, S, S, 1 if gray else 3), jnp.float32)).shape[-1]
    if width == labelmap.n_classes:
        level_slices = [(l, int(starts[l]), int(stops[l]))
                        for l in range(labelmap.n_levels)]
    else:
        level_slices = [(labelmap.n_levels - 1, 0, width)]
    for i, batch in enumerate(pipe.batches(np.arange(min(n_samples,
                                                         len(ds))))):
        img = batch["image"][0]                      # (H, W, C) normalized
        ll = batch["level_labels"][0]
        segments = slic_segments(img, n_segments=n_slic_segments)
        disp = img - img.min()
        disp = disp / max(float(disp.max()), 1e-6)   # [0,1] for rendering

        summ.make_heading(
            f"Data ID: {ds.image_paths[batch['index'][0]]}", 2)
        summ.make_heading("Ground truth", 3)
        for l in range(labelmap.n_levels):
            summ.make_text(f"{int(ll[l])} "
                           f"{labelmap.ix_to_name[l][int(ll[l])]}")
        summ.make_hrule()

        # ONE perturbation pass per sample: the perturbed images are
        # identical for every level (same segments, same masks), so predict
        # all per-level softmaxes at once and slice the surrogate
        # coefficients per level afterwards — identical explanations at
        # 1/n_levels the CNN-forward cost of a per-level loop.
        def predict(images):
            raw = logits_fn(jnp.asarray(images))
            return np.concatenate(
                [np.asarray(jax.nn.softmax(raw[:, a:b], axis=-1))
                 for _, a, b in level_slices], axis=1)

        coefs, probs0 = lime_explain(
            img, predict, segments, num_samples=num_perturb,
            hide_color=0.0, rng=np.random.RandomState(0))
        for l, a, b in level_slices:
            top = np.argsort(-probs0[a:b])[:top_labels]
            cells, x_labels = [], []
            for rank, c in enumerate(top):
                mask = top_feature_mask(coefs[a + c], segments,
                                        num_features=num_features)
                png = f"{i}_{l}_{rank}.png"
                mpimg.imsave(os.path.join(out_dir, png),
                             overlay_mask(disp, segments, mask))
                cells.append(f"![x]({png})")
                color = "green" if int(c) == int(ll[l]) else "red"
                x_labels.append(
                    f'<span style="color:{color}">Predicted: {int(c)} '
                    f'{labelmap.ix_to_name[l][int(c)]}</span>')
            summ.make_heading(
                f"{labelmap.level_names[l]} - Top {len(top)}", 3)
            summ.make_table(data=[cells], x_labels=x_labels)
    print(f"wrote {out_dir}")
    return out_dir


def run_occlusion(experiment_path: str, image_dir: str, split: str = "test",
                  n_samples: int = 4, patch: int = 56, stride: int = 28):
    """Occlusion saliency per level (LIME-equivalent explainer)."""
    import jax
    import jax.numpy as jnp

    labelmap, datasets, trainer, manifest, exp, gray = \
        rebuild_from_manifest(experiment_path)
    ds = datasets[split]
    pipe = ImagePipeline(ds, labelmap, image_dir,
                         image_size=trainer.cfg.image_size, batch_size=1,
                         train=False, grayscale=gray, num_workers=2)

    @jax.jit
    def scores_fn(images):
        raw = trainer.model.apply(
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats}, images, train=False)
        return raw

    # a 'leaf' head (last_level_ce) emits leaf logits only — explain just
    # the leaf level at offset 0; multi-head models explain every level at
    # its level_start offset into the raw logits
    S = trainer.cfg.image_size
    width = jax.eval_shape(scores_fn, jax.ShapeDtypeStruct(
        (1, S, S, 1 if gray else 3), jnp.float32)).shape[-1]
    if width == labelmap.n_classes:
        exp_levels = [(l, int(labelmap.level_start[l]))
                      for l in range(labelmap.n_levels)]
    else:
        exp_levels = [(labelmap.n_levels - 1, 0)]

    S = trainer.cfg.image_size
    patch = min(patch, max(S // 4, 1))      # keep the grid non-empty for
    stride = min(stride, patch)             # small debug image sizes
    out_dir = os.path.join(exp.stats, f"occlusion_{split}")
    summ = Summarize(out_dir)
    summ.make_heading(f"Occlusion explanations — {split}", 1)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for i, batch in enumerate(pipe.batches(np.arange(min(n_samples, len(ds))))):
        img = batch["image"]
        ll = batch["level_labels"][0]
        base = np.asarray(scores_fn(jnp.asarray(img)))[0]
        # occluded grid
        ys = list(range(0, S - patch + 1, stride))
        xs = list(range(0, S - patch + 1, stride))
        occluded = []
        for y in ys:
            for x in xs:
                o = img.copy()
                o[0, y:y + patch, x:x + patch] = 0.5
                occluded.append(o[0])
        occ_scores = []
        for s0 in range(0, len(occluded), 32):
            occ_scores.append(np.asarray(
                scores_fn(jnp.asarray(np.stack(occluded[s0:s0 + 32])))))
        occ = np.concatenate(occ_scores)
        summ.make_heading(f"Sample {i}: {ds.image_paths[batch['index'][0]]}", 2)
        fig, axes = plt.subplots(1, len(exp_levels) + 1,
                                 figsize=(4 * (len(exp_levels) + 1), 4))
        axes[0].imshow(img[0] if img.shape[-1] == 3 else img[0, ..., 0])
        axes[0].set_title("input")
        for j, (l, a) in enumerate(exp_levels):
            gt = a + int(ll[l])
            drop = (base[gt] - occ[:, gt]).reshape(len(ys), len(xs))
            axes[j + 1].imshow(drop, cmap="hot")
            axes[j + 1].set_title(
                f"L{l}: {labelmap.ix_to_name[l][int(ll[l])]}")
        path = os.path.join(out_dir, f"sample_{i}.png")
        fig.savefig(path, bbox_inches="tight", dpi=100)
        plt.close(fig)
        summ.make_image(f"sample_{i}.png", f"occlusion sample {i}")
    print(f"wrote {out_dir}")
    return out_dir


def main(args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment_path", "--path_to_exp",
                        dest="experiment_path", type=str, required=True,
                        help="<experiment_dir>/<experiment_name> "
                             "(--path_to_exp = reference flag name)")
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--mode", type=str, required=True,
                        choices=["lime", "occlusion", "tsne"])
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--n_samples", type=int, default=4)
    parser.add_argument("--animate", action="store_true",
                        help="tsne mode: rotating GIF per level (the "
                             "reference's mp4 counterpart)")
    args = parser.parse_args(args)
    if args.mode == "tsne":
        run_tsne(args.experiment_path, args.image_dir, splits=(args.split,),
                 animate=args.animate)
    elif args.mode == "lime":
        run_lime(args.experiment_path, args.image_dir, split=args.split,
                 n_samples=args.n_samples)
    else:
        run_occlusion(args.experiment_path, args.image_dir, split=args.split,
                      n_samples=args.n_samples)


if __name__ == "__main__":
    main()
