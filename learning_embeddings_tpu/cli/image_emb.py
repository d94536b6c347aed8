"""fc7 feature precompute — counterpart of `order_embeddings_images.py`
`ImageEmb.load_generate_and_save` (:50-140): load a finetuned classifier's
trunk, forward every image of each split, dump features per split.

Output contract: <output_dir>/<split>.npz with {paths: (N,) str,
features: (N, F) float32} (replacing the reference's pickled
filename→2048-list dict npy)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data import ImagePipeline
from ..models.resnet import BACKBONES
from .common import add_common_flags, load_ethec_data


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default=None,
                        help="default <data_dir>/embeddings")
    parser.add_argument("--model", type=str, default="resnet50")
    parser.add_argument("--experiment_load_dir", type=str, default=None,
                        help="Experiment dir holding best_model weights of "
                             "a finetuned classifier (Inference.get_model); "
                             "random-init trunk when omitted.")
    parser.add_argument("--image_size", type=int, default=448)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--n_workers", type=int, default=8)
    return parser


def main(args=None):
    import jax
    import jax.numpy as jnp

    args = build_parser().parse_args(args)
    labelmap, datasets, _ = load_ethec_data(args.data_dir, args.debug)
    out_dir = args.output_dir or os.path.join(args.data_dir, "embeddings")
    os.makedirs(out_dir, exist_ok=True)

    trunk = BACKBONES[args.model](num_classes=None, features_only=True)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)
    variables = trunk.init(rng, dummy, train=False)
    if args.experiment_load_dir:
        from ..train.experiment import Checkpointer, ExperimentDir

        exp = ExperimentDir(*os.path.split(args.experiment_load_dir.rstrip("/")))
        ckpt = Checkpointer(exp)
        # raw restore: a classifier checkpoint's structure (params nested
        # under 'trunk'/'fc', optimizer state, bookkeeping keys) doesn't
        # match this bare-trunk module, so a template load can't work —
        # the trunk subtree is extracted below
        payload = ckpt.load_raw("best_model")
        params = payload["params"].get("trunk", payload["params"])
        variables = {"params": params,
                     "batch_stats": payload["batch_stats"].get(
                         "trunk", payload["batch_stats"])}

    @jax.jit
    def forward(images):
        return trunk.apply(variables, images, train=False)

    for split, ds in datasets.items():
        pipe = ImagePipeline(ds, labelmap, args.image_dir,
                             image_size=args.image_size,
                             batch_size=args.batch_size, train=False,
                             num_workers=args.n_workers)
        feats = []
        for batch in pipe.batches(np.arange(len(ds))):
            feats.append(np.asarray(forward(jnp.asarray(batch["image"]))))
        features = np.concatenate(feats) if feats else np.zeros((0, 1))
        path = os.path.join(out_dir, f"{split}.npz")
        np.savez(path, paths=np.asarray(ds.image_paths), features=features)
        print(f"wrote {path}: {features.shape}")


if __name__ == "__main__":
    main()
