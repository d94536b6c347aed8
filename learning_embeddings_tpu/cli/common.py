"""Shared CLI plumbing: ETHEC dataset loading, debug subsetting, common
argparse flags (the reference repeats these per driver; flag names are kept
identical for drop-in compatibility)."""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..data import encode_records, filter_to_labelmap, load_ethec_json
from ..hierarchy import LabelMap, labelmap_from_records

DEFAULT_DATA_DIR = os.environ.get(
    "ETHEC_SPLITS_DIR", "/root/reference/splits/ETHEC")


def add_common_flags(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--debug", help="Use DEBUG mode.", action="store_true")
    parser.add_argument("--lr", help="Input learning rate.", type=float,
                        default=0.001)
    parser.add_argument("--batch_size", help="Batch size.", type=int, default=8)
    parser.add_argument("--experiment_name", help="Experiment name.",
                        type=str, required=True)
    parser.add_argument("--experiment_dir", help="Experiment directory.",
                        type=str, required=True)
    parser.add_argument("--n_epochs", type=int, required=True,
                        help="Number of epochs to run training for.")
    parser.add_argument("--n_workers", help="Number of workers.", type=int,
                        default=4)
    parser.add_argument("--eval_interval", type=int, default=1,
                        help="Evaluate model every N intervals.")
    parser.add_argument("--resume", action="store_true",
                        help="Continue training from last checkpoint.")
    parser.add_argument("--optimizer_method", help="[adam, sgd]", type=str,
                        default="adam")
    parser.add_argument("--merged", action="store_true",
                        help="Use dataset which has genus and species combined.")
    parser.add_argument("--set_mode", type=str, required=True,
                        help="If use training or testing mode (loads best model).")
    parser.add_argument("--lr_step", nargs="*", default=[], type=int,
                        help="List of epochs to multiply lr by 0.1")
    parser.add_argument("--lr_decay", type=float, default=0.1,
                        help="Factor applied to the lr at each lr_step "
                             "epoch (reference MultiStepLR gamma).")
    parser.add_argument("--data_dir", type=str, default=DEFAULT_DATA_DIR,
                        help="Directory holding train/val/test.json splits.")
    parser.add_argument("--random_seed", type=int, default=0)
    parser.add_argument("--f32_input", action="store_true",
                        help="Transfer float32 pixels host->device instead "
                             "of the default uint8-with-on-device-scale "
                             "(4x less transfer bandwidth; identical on the "
                             "python pipeline, the native loader's uint8 "
                             "path differs by one rounding step).")


def inverse_class_weights(dataset, labelmap):
    """Inverse-class-frequency loss weights over the train multihot
    (reference prepare_model class counting, finetuner.py:176-197)."""
    mh = dataset.multihot(labelmap)
    counts = np.maximum(mh.sum(axis=0), 1.0)
    return (1.0 / counts).astype(np.float32)


def load_ethec_data(data_dir: str, debug: bool = False,
                    n_debug_leaves: int = 12):
    """(labelmap, {split: EncodedDataset}, {split: records}).

    The labelmap is built over ALL available splits so indices are stable
    (the reference hard-codes the union taxonomy in db.py). --debug keeps
    only the first `n_debug_leaves` leaf classes
    (ETHECLabelMapMergedSmall semantics, db.py:3661-3747)."""
    records = {}
    for split in ("train", "val", "test"):
        path = os.path.join(data_dir, f"{split}.json")
        if os.path.exists(path):
            records[split] = load_ethec_json(path)
    if not records:
        raise FileNotFoundError(f"no ETHEC split json in {data_dir}")
    # Build the labelmap over the PRE-split pool: the reference's labelmap
    # is the full hard-coded taxonomy (db.py:1117-3563) regardless of which
    # samples land in which split — a resplit that drops small classes must
    # not silently renumber (or shrink) the taxonomy.
    all_records = [r for rs in records.values() for r in rs]
    labelmap = labelmap_from_records(all_records)
    if "train" not in records:
        # train.json is gitignored upstream; fall back to stratified
        # resplitting of whatever is available so the pipeline still runs.
        from ..data import stratified_split

        tr, va, te = stratified_split(all_records, labelmap)
        records = {"train": tr, "val": va, "test": te}
    if debug:
        keep = set(labelmap.ix_to_name[-1][:n_debug_leaves])
        small = [r for r in all_records
                 if f"{r['genus']}_{r['specific_epithet']}" in keep]
        labelmap = labelmap_from_records(small)
        records = {s: filter_to_labelmap(rs, labelmap)
                   for s, rs in records.items()}
    datasets = {s: encode_records(rs, labelmap) for s, rs in records.items()}
    return labelmap, datasets, records


def manifest_from_args(args: argparse.Namespace) -> Dict:
    return dict(vars(args))
