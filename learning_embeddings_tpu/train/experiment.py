"""Experiment runtime scaffolding: manifests, checkpoints, resume, metrics.

Rebuilds the reference `Experiment` base (network/experiment.py:23-224) and
its reproducibility contract (SURVEY.md §5):

* ``ExperimentDir``  — per-experiment directory layout
  (<dir>/<name>/{weights,logs,stats}, experiment.py:40-55)
* ``write_manifest`` / ``read_manifest`` — `config_params.txt` with the
  args dict + git commit/branch (ethec_experiments.py:243-253); the
  inference harness reconstructs experiments from this file, so the format
  (one "key: value" per line, git info appended) is the contract.
* ``Checkpointer`` — orbax save/load of
  {epoch, params, batch_stats/opt_state, loss, optimal_threshold, ...}
  matching the reference payload (experiment.py:192-208 +
  order_embeddings.py:695-707), `latest`/`best_model` symlink-style
  naming, `find_existing_weights` resume (experiment.py:210-215)
* ``MetricsLogger`` — tensorboard scalars (+ plain jsonl mirror).
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import time
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "ExperimentDir",
    "write_manifest",
    "read_manifest",
    "Checkpointer",
    "MetricsLogger",
    "git_info",
]


def git_info(repo_dir: Optional[str] = None) -> Dict[str, str]:
    def run(*args):
        try:
            return subprocess.run(
                ["git", *args], cwd=repo_dir, capture_output=True, text=True,
                timeout=10).stdout.strip()
        except Exception:
            return "unknown"

    return {
        "git_commit": run("rev-parse", "HEAD"),
        "git_branch": run("rev-parse", "--abbrev-ref", "HEAD"),
    }


class ExperimentDir:
    def __init__(self, experiment_dir: str, experiment_name: str):
        self.root = os.path.join(experiment_dir, experiment_name)
        self.weights = os.path.join(self.root, "weights")
        self.logs = os.path.join(self.root, "logs")
        self.stats = os.path.join(self.root, "stats")
        for d in (self.root, self.weights, self.logs, self.stats):
            os.makedirs(d, exist_ok=True)

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "config_params.txt")


def write_manifest(exp: ExperimentDir, args: Dict[str, Any]) -> None:
    """'key: value' lines + git hash/branch (the reference's exact
    config-dump shape, ethec_experiments.py:244-253)."""
    info = dict(args)
    info.update(git_info())
    with open(exp.manifest_path, "w") as f:
        for k in sorted(info):
            f.write(f"{k}: {info[k]}\n")


def read_manifest(path: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            if ": " in line:
                k, v = line.rstrip("\n").split(": ", 1)
                out[k] = v
    return out


def _key_name(entry) -> str:
    """Uniform name for a pytree key-path entry: dict key, namedtuple
    field, or sequence index (orbax's template-less restore turns
    namedtuples into dicts keyed by field name and tuples into lists, so
    name paths — unlike flatten ORDER, which is alphabetical for dicts but
    positional for namedtuples — line up between the two forms)."""
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _retype(template, raw):
    """Rebuild `raw` (nested dicts/lists from a template-less orbax
    restore) in the exact pytree structure of `template`, matching leaves
    by named key-path. Raises KeyError on a leaf the checkpoint lacks —
    a genuine structure mismatch must fail loudly, not fill defaults."""
    raw_leaves = {
        tuple(_key_name(e) for e in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(raw)[0]}
    t_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [raw_leaves[tuple(_key_name(e) for e in path)]
              for path, _ in t_paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class Checkpointer:
    """Orbax-backed checkpoints with the reference's naming scheme:
    numbered epochs + 'best_model' (experiment.py:192-224)."""

    def __init__(self, exp: ExperimentDir):
        self.dir = exp.weights
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name) -> str:
        return os.path.join(os.path.abspath(self.dir), str(name))

    def save(self, name, payload: Dict[str, Any], wait: bool = True) -> None:
        """wait=False leaves the write in flight (orbax's async machinery
        snapshots the arrays first, so training can continue immediately);
        call wait_until_finished() before reading the file back or exiting.
        orbax itself serializes overlapping saves."""
        path = self._path(name)
        self._ckpt.save(path, payload, force=True)
        if wait:
            self._ckpt.wait_until_finished()

    def wait_until_finished(self) -> None:
        self._ckpt.wait_until_finished()

    def load(self, name, like: Dict[str, Any]) -> Dict[str, Any]:
        try:
            return self._ckpt.restore(self._path(name), like)
        except ValueError:
            # top-level key drift between the template and the saved tree
            # (payloads gain bookkeeping keys over time — e.g. best_score /
            # best_f1 / best_epoch — while eval/inference/export callers
            # template only the subtrees they use, and older checkpoints
            # predate new keys): raw-restore, rebuild each subtree in the
            # template's pytree structure (a template-less restore returns
            # plain dicts/lists — optax NamedTuple states must be re-typed
            # or the next optimizer step crashes), drop checkpoint keys the
            # template doesn't ask for, default template keys the
            # checkpoint doesn't have
            raw = self.load_raw(name)
            return {k: (_retype(like[k], raw[k]) if k in raw else like[k])
                    for k in like}

    def load_raw(self, name) -> Dict[str, Any]:
        """Restore without a target template (numpy leaves) — for reading
        another experiment's checkpoint whose optimizer-state structure
        this process doesn't know (e.g. --load_emb_from warm starts,
        oe_h.py:1904-1916).

        Every leaf is restored as HOST numpy via metadata-built
        restore_args: a plain template-less restore replays the saved
        shardings, which crashes cross-backend ("Device TFRT_CPU_0 was
        not found") when e.g. a CPU-trained label table warm-starts a
        TPU joint run — the reference's standard workflow."""
        import warnings

        path = self._path(name)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")   # orbax warns on template-less
            ckptr = ocp.PyTreeCheckpointer()
            meta = ckptr.metadata(path).item_metadata
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta.tree)
            return ckptr.restore(path, restore_args=restore_args)

    def epochs_on_disk(self):
        out = []
        if os.path.isdir(self.dir):
            for d in os.listdir(self.dir):
                if d.isdigit():
                    out.append(int(d))
        return sorted(out)

    def find_existing_weights(self) -> Optional[int]:
        """Latest numbered checkpoint for --resume
        (reference picks from sorted filenames, experiment.py:210-215)."""
        epochs = self.epochs_on_disk()
        return epochs[-1] if epochs else None


class MetricsLogger:
    """Tensorboard scalars + a jsonl mirror (the reference logs everything
    through tensorboardX, experiment.py:53; jsonl keeps metrics greppable
    without TB tooling)."""

    def __init__(self, exp: ExperimentDir, use_tensorboard: bool = True):
        self.jsonl_path = os.path.join(exp.logs, "metrics.jsonl")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=exp.logs)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps({"tag": tag, "value": float(value),
                                "step": int(step), "t": time.time()}) + "\n")

    def scalars(self, prefix: str, values: Dict[str, float], step: int) -> None:
        for k, v in values.items():
            self.scalar(f"{prefix}/{k}", v, step)

    def close(self):
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
