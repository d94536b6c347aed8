"""Multi-head CNN classifier trainer (the reference's CIFAR10/Finetuner
runtime, finetuner.py:89-375, redesigned around one jitted train step).

Criterion dispatch mirrors the reference's isinstance switches
(finetuner.py:142-174 head surgery, :227-238 forward dispatch):

| criterion        | head         | eval scores                     |
|------------------|--------------|---------------------------------|
| multi_level_ce   | multi_head   | raw logits                      |
| last_level_ce    | leaf         | bottom-up propagated probs      |
| masked_ce        | multi_head   | predicted-chain-masked logits   |
| multi_label_sm   | multi_head   | raw logits                      |
| hsoftmax         | hsoftmax     | chained log-probs               |

Data parallelism: jit + NamedSharding over a ('data','model') mesh —
params replicated (XLA inserts the gradient all-reduce), batch sharded on
'data', optionally the wide fc kernel sharded on 'model'.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..hierarchy import LabelMap
from ..losses.classification import (
    hierarchical_softmax_nll,
    make_hierarchical_softmax,
    make_last_level_ce,
    make_masked_ce,
    make_multi_level_ce,
    multi_label_soft_margin,
)
from ..models.heads import HierarchicalCNN
from ..ops.image import device_scale
from ..parallel.mesh import batch_sharding, param_shardings, replicated

CRITERIA = ("multi_level_ce", "last_level_ce", "masked_ce",
            "multi_label_sm", "hsoftmax")

CRITERION_TO_HEAD = {
    "multi_level_ce": "multi_head",
    "last_level_ce": "leaf",
    "masked_ce": "multi_head",
    "multi_label_sm": "multi_head",
    "hsoftmax": "hsoftmax",
}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass
class ClassifierConfig:
    backbone: str = "resnet50"
    criterion: str = "multi_level_ce"
    lr: float = 1e-5
    optimizer: str = "adam"            # adam | sgd (momentum 0.9)
    lr_steps: Sequence[int] = ()       # epochs where lr ×= lr_decay
    lr_decay: float = 0.1
    steps_per_epoch: int = 1           # converts lr_steps (epochs) → steps
    level_weights: Optional[Sequence[float]] = None
    class_weights: Optional[np.ndarray] = None
    freeze_trunk: bool = False         # reference feature_extracting
    image_size: int = 448
    batch_size: int = 64
    seed: int = 0
    dtype: Any = jnp.bfloat16
    tp_patterns: Sequence[str] = ("fc/kernel",)   # head sharded over 'model'
    head_override: Optional[str] = None  # e.g. 'bottleneck2d' (--use_2d)
    remat: bool = False  # rematerialize residual blocks (memory vs FLOPs)
    stem: str = "conv7"  # 's2d' = space-to-depth stem (MXU-efficient, equivalent)
    freeze_bn: bool = False  # train with BN in inference mode (frozen
    #                          running stats — the standard fine-tune config;
    #                          skips the BN stat/stat-grad reduction sweeps)
    bn_stats_rows: int = 0   # >0: ghost-batch BN statistics (GhostBatchNorm)
    bn_impl: str = "flax"    # 'pallas' = fused-reduction train-mode BN
    bn_stats_dtype: str = "float32"  # 'bfloat16' = half-precision BN stat
    #   sweeps (and their gradients) — running stats/normalize stay f32-folded
    grad_accum: int = 1  # accumulate gradients over N micro-batches before
    #   each optimizer update (optax.MultiSteps) — effective batch
    #   N × batch_size without the activation memory; a scaling capability
    #   the reference's DataParallel has no counterpart for
    spatial_partition: bool = False  # shard the image H axis over 'model'
    #   (GSPMD spatial partitioning: XLA inserts conv halo exchanges) — lets
    #   resolutions/batches exceed one chip's activation memory; something
    #   the reference's DataParallel cannot express at all
    donate: bool = True  # donate the input TrainState to the jitted step so
    #   XLA updates params/opt-state in place (halves the state's HBM
    #   footprint across each step). Callers must treat the passed-in state
    #   as consumed; set False for tests that re-step from one state object.


def make_criterion(labelmap: LabelMap, cfg: ClassifierConfig):
    """Returns loss_and_scores(raw, level_labels, multihot) -> (loss, scores).

    `scores` is what the evaluator consumes — matching which tensor the
    reference feeds its evaluators per criterion (finetuner.py:227-260)."""
    name = cfg.criterion
    if name == "multi_level_ce":
        f = make_multi_level_ce(labelmap, cfg.level_weights, cfg.class_weights)
        return lambda raw, ll, mh: (f(raw, ll), raw)
    if name == "last_level_ce":
        f = make_last_level_ce(labelmap, cfg.level_weights, cfg.class_weights)

        def fn(raw, ll, mh):
            probs, loss = f(raw, ll)
            return loss, probs
        return fn
    if name == "masked_ce":
        f = make_masked_ce(labelmap, cfg.level_weights)

        def fn(raw, ll, mh):
            outputs, loss = f(raw, ll)
            return loss, outputs
        return fn
    if name == "multi_label_sm":
        w = None if cfg.class_weights is None else jnp.asarray(cfg.class_weights)
        return lambda raw, ll, mh: (multi_label_soft_margin(raw, mh, w), raw)
    if name == "hsoftmax":
        norm = make_hierarchical_softmax(labelmap)

        def fn(raw, ll, mh):
            all_lp, leaf_lp = norm(raw)
            return hierarchical_softmax_nll(leaf_lp, ll), all_lp
        return fn
    raise ValueError(f"unknown criterion {name!r}; expected {CRITERIA}")


class ClassifierTrainer:
    """Builds model/optimizer/steps; the epoch loop lives in the CLI
    drivers (train/experiment.py provides the shared scaffolding)."""

    def __init__(self, labelmap: LabelMap, cfg: ClassifierConfig,
                 mesh=None, grayscale: bool = False):
        self.labelmap = labelmap
        self.cfg = cfg
        self.mesh = mesh
        self.model = HierarchicalCNN(
            backbone=cfg.backbone,
            levels=tuple(labelmap.levels),
            head=cfg.head_override or CRITERION_TO_HEAD[cfg.criterion],
            dtype=cfg.dtype,
            remat=cfg.remat,
            stem=cfg.stem,
            bn_stats_rows=cfg.bn_stats_rows,
            bn_impl=cfg.bn_impl,
            bn_stats_dtype=cfg.bn_stats_dtype,
        )
        self.criterion = make_criterion(labelmap, cfg)
        self.n_channels = 1 if grayscale else 3

        key = jax.random.PRNGKey(cfg.seed)
        dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, self.n_channels),
                          jnp.float32)
        variables = self.model.init(key, dummy, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())

        self.tx = self._make_optimizer(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )
        if mesh is not None:
            shardings = TrainState(
                step=replicated(mesh),
                params=param_shardings(params, mesh, cfg.tp_patterns),
                batch_stats=param_shardings(batch_stats, mesh, ()),
                opt_state=jax.tree_util.tree_map(
                    lambda _: replicated(mesh), state.opt_state,
                    is_leaf=lambda x: hasattr(x, "shape")),
            )
            # opt_state leaves that mirror params should share their sharding;
            # plain replication is correct for DP and for replicated adam
            # moments of TP-sharded leaves XLA will reshard as needed.
            state = jax.device_put(state, shardings)
            self._state_shardings = shardings
            self._batch_sharding = batch_sharding(mesh)
            if cfg.spatial_partition:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._image_sharding = NamedSharding(
                    mesh, P("data", "model"))   # (B, H, W, C): H on 'model'
            else:
                self._image_sharding = self._batch_sharding
        else:
            self._state_shardings = None
            self._batch_sharding = None
            self._image_sharding = None
        self.state = state
        self.train_step = self._build_train_step()
        self.eval_step = self._build_eval_step()

    # ------------------------------------------------------------------
    def _make_optimizer(self, params):
        cfg = self.cfg
        if cfg.lr_steps:
            # reference MultiStepLR steps once per EPOCH (experiment.py:
            # 158-190) while optax boundaries count optimizer steps —
            # convert via steps_per_epoch (set by run_classifier); under
            # grad accumulation the inner optimizer only sees every k-th
            # micro-step, so the boundary scale shrinks accordingly
            spe = max(int(cfg.steps_per_epoch) // max(cfg.grad_accum, 1), 1)
            boundaries = {int(b) * spe: cfg.lr_decay for b in cfg.lr_steps}
            schedule = optax.piecewise_constant_schedule(cfg.lr, boundaries)
        else:
            schedule = optax.constant_schedule(cfg.lr)
        self.lr_schedule = schedule  # exposed for tests / logging
        base = (optax.adam(schedule) if cfg.optimizer == "adam"
                else optax.sgd(schedule, momentum=0.9))
        if cfg.freeze_trunk:
            # reference feature_extracting: only the head trains
            def label(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "frozen"
                    if str(getattr(path[0], "key", path[0])) == "trunk"
                    else "train", params)
            base = optax.multi_transform(
                {"train": base, "frozen": optax.set_to_zero()}, label)
        if cfg.grad_accum > 1:
            base = optax.MultiSteps(base, every_k_schedule=cfg.grad_accum)
        return base

    # ------------------------------------------------------------------
    def _build_train_step(self):
        model, criterion, tx = self.model, self.criterion, self.tx

        if self.cfg.freeze_bn:
            # BN in inference mode during training: running stats frozen,
            # no stat/stat-grad reduction sweeps over the activations
            def loss_fn(params, batch_stats, images, level_labels, multihot):
                raw = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    device_scale(images), train=False)
                loss, _ = criterion(raw, level_labels, multihot)
                return loss, batch_stats
        else:
            def loss_fn(params, batch_stats, images, level_labels, multihot):
                raw, mutated = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    device_scale(images), train=True,
                    mutable=["batch_stats"])
                loss, _ = criterion(raw, level_labels, multihot)
                return loss, mutated["batch_stats"]

        def step(state: TrainState, images, level_labels, multihot):
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       images, level_labels, multihot)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 batch_stats=new_stats,
                                 opt_state=opt_state), loss

        donate = dict(donate_argnums=0) if self.cfg.donate else {}
        if self.mesh is not None:
            bs = self._batch_sharding
            ss = self._state_shardings
            rep = replicated(self.mesh)
            return jax.jit(step,
                           in_shardings=(ss, self._image_sharding, bs, bs),
                           out_shardings=(ss, rep), **donate)
        return jax.jit(step, **donate)

    def _build_eval_step(self):
        model, criterion = self.model, self.criterion

        def step(state: TrainState, images, level_labels, multihot):
            raw = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                device_scale(images), train=False)
            loss, scores = criterion(raw, level_labels, multihot)
            return loss, scores

        if self.mesh is not None:
            bs = self._batch_sharding
            return jax.jit(step, in_shardings=(
                self._state_shardings, self._image_sharding, bs, bs))
        return jax.jit(step)

    # ------------------------------------------------------------------
    def load_backbone_state_dict(self, path: str) -> None:
        """Start the trunk from a torchvision state-dict file — the
        reference always trains from `pretrained=True` backbones
        (finetuner.py:117-128); this is the documented path from an actual
        torchvision checkpoint to a run (--load_backbone_from)."""
        from flax import serialization

        from ..models.resnet import s2d_stem_kernel
        from ..models.torch_import import (
            import_torchvision_resnet,
            load_state_dict_file,
        )

        sd = load_state_dict_file(path)
        params, stats = import_torchvision_resnet(sd)
        if self.cfg.stem == "s2d":
            params["conv1"]["kernel"] = s2d_stem_kernel(
                params["conv1"]["kernel"])
        cur_params = jax.tree_util.tree_map(lambda x: x, self.state.params)
        cur_stats = jax.tree_util.tree_map(lambda x: x, self.state.batch_stats)
        if self.n_channels != 3:
            # grayscale conv1 surgery keeps its fresh init
            # (ethec_experiments.py:222-238)
            params["conv1"] = {"kernel": np.asarray(
                cur_params["trunk"]["conv1"]["kernel"])}
        trunk_p = serialization.from_state_dict(cur_params["trunk"], params)
        trunk_s = serialization.from_state_dict(cur_stats["trunk"], stats)
        new_params = dict(cur_params)
        new_params["trunk"] = trunk_p
        new_stats = dict(cur_stats)
        new_stats["trunk"] = trunk_s
        state = self.state.replace(params=new_params, batch_stats=new_stats)
        if self._state_shardings is not None:
            state = jax.device_put(state, self._state_shardings)
        self.state = state

    # ------------------------------------------------------------------
    def checkpoint_payload(self) -> dict:
        """Trainer half of the checkpoint contract shared by all four
        trainer families (runners add their loop bookkeeping on top)."""
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state}

    def restore_payload(self, payload: dict) -> None:
        self.state = self.state.replace(**payload)

    # ------------------------------------------------------------------
    def put_batch(self, images, level_labels, multihot):
        if self._batch_sharding is None:
            return (jnp.asarray(images), jnp.asarray(level_labels),
                    jnp.asarray(multihot))
        return (jax.device_put(images, self._image_sharding),
                jax.device_put(level_labels, self._batch_sharding),
                jax.device_put(multihot, self._batch_sharding))
