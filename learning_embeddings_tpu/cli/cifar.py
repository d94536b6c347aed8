"""CIFAR-10/100 hierarchical classifier driver — counterpart of
`network/finetuner.py` __main__ (:888-914 `train_cifar10`)."""

from __future__ import annotations

import argparse

import numpy as np

from ..data.workloads import (
    ArrayDataset,
    cifar10_labelmap,
    cifar100_labelmap,
    load_cifar10,
    load_cifar100,
    stratified_index_split,
    synthetic_array_dataset,
)
from ..train.classifier import ClassifierConfig
from ..train.runner import run_classifier
from .common import inverse_class_weights, manifest_from_args
from .fashion_mnist import LOSS_MAP


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--dataset", type=str, default="cifar10",
                        help="[cifar10, cifar100]")
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--evaluator", type=str, default="MLST")
    parser.add_argument("--experiment_name", type=str, required=True)
    parser.add_argument("--experiment_dir", type=str, required=True)
    parser.add_argument("--n_epochs", type=int, required=True)
    parser.add_argument("--n_workers", type=int, default=4)
    parser.add_argument("--eval_interval", type=int, default=1)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--optimizer_method", type=str, default="adam")
    parser.add_argument("--model", type=str, default="resnet18")
    parser.add_argument("--loss", type=str, required=True)
    parser.add_argument("--freeze_weights", action="store_true")
    parser.add_argument("--set_mode", type=str, required=True)
    parser.add_argument("--data_root", type=str, default="../database")
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--random_seed", type=int, default=0)
    parser.add_argument("--class_weights", action="store_true",
                        help="Re-weigh the loss by inverse class freq.")
    parser.add_argument("--level_weights", nargs="*", default=None,
                        type=float, help="Per-level loss weights.")
    parser.add_argument("--f32_input", action="store_true",
                        help="Transfer float32 pixels host->device instead "
                             "of the default uint8-with-on-device-scale.")
    parser.add_argument("--freeze_bn", action="store_true",
                        help="Frozen BN running statistics (fine-tune "
                             "config; TPU throughput win).")
    parser.add_argument("--bn_stats_rows", type=int, default=0)
    parser.add_argument("--n_model", type=int, default=1)
    parser.add_argument("--lr_step", type=int, nargs="*",
                        default=[],
                        help="Epochs where lr *= lr_decay "
                             "(reference MultiStepLR, finetuner.py:102)")
    parser.add_argument("--lr_decay", type=float, default=0.1)
    return parser


def main(args=None):
    args = build_parser().parse_args(args)
    if args.dataset == "cifar100":
        labelmap = cifar100_labelmap()
        loader = load_cifar100
    else:
        labelmap = cifar10_labelmap()
        loader = load_cifar10
    try:
        tr_i, tr_l, te_i, te_l = loader(args.data_root)
        images = np.concatenate([tr_i, te_i])
        labels = np.concatenate([tr_l, te_l]).astype(np.int32)
    except FileNotFoundError:
        print(f"== {args.dataset} files not found; using a synthetic stand-in")
        n = 600 if args.debug else 6000
        ds = synthetic_array_dataset(labelmap, n, size=32, seed=args.random_seed)
        images, labels = ds.images, ds.leaf_labels
    if args.debug:
        images, labels = images[:600], labels[:600]

    tr, va, te = stratified_index_split(labels, seed=args.random_seed)
    datasets = {
        "train": ArrayDataset(images[tr], labels[tr], labelmap),
        "val": ArrayDataset(images[va], labels[va], labelmap),
        "test": ArrayDataset(images[te], labels[te], labelmap),
    }
    class_weights = None
    if args.class_weights:
        class_weights = inverse_class_weights(datasets["train"], labelmap)
    cfg = ClassifierConfig(
        backbone=args.model,
        criterion=LOSS_MAP[args.loss],
        level_weights=(tuple(args.level_weights)
                       if args.level_weights else None),
        class_weights=class_weights,
        lr=args.lr,
        optimizer=args.optimizer_method,
        freeze_trunk=args.freeze_weights,
        image_size=args.image_size,
        batch_size=args.batch_size,
        seed=args.random_seed,
        lr_steps=tuple(getattr(args, "lr_step", []) or []),
        lr_decay=args.lr_decay,
        freeze_bn=args.freeze_bn,
        bn_stats_rows=args.bn_stats_rows,
    )
    evaluator = args.evaluator if args.loss == "multi_label" else "MLEVAL"
    return run_classifier(
        labelmap, datasets, "", cfg,
        experiment_dir=args.experiment_dir,
        experiment_name=args.experiment_name,
        n_epochs=args.n_epochs,
        evaluator=evaluator,
        eval_interval=args.eval_interval,
        n_workers=args.n_workers,
        resume=args.resume,
        manifest_args=manifest_from_args(args),
        set_mode=args.set_mode,
        augment="rrc",
        use_weighted_resampler=False,
        n_model=args.n_model,
        input_dtype="float32" if args.f32_input else "uint8",
    )


if __name__ == "__main__":
    main()
