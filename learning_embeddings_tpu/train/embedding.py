"""Label-hierarchy embedding trainer (the reference's OrderEmbedding runtime).

Rebuilds `order_embeddings.py:308-757` / `order_embeddings_h.py` (label-only
Euclidean / hyperbolic trainers) as a jitted-step epoch loop:

* graph build → transitive closure → negative adjacency → edge splits come
  from hierarchy.graph (replacing networkx),
* per-step negative sampling is the on-device categorical sampler
  (losses.margin.make_negative_sampler),
* the optimizer is optax: adam / sgd for Euclidean modes, riemannian_sgd
  (or conformal-rescaled adam + annulus projection) for hyperbolic,
* val threshold calibration + test at fixed threshold via eval.threshold,
* graph-reconstruction check via eval.reconstruction.

Whole-epoch training runs as one `lax.scan` over pre-batched edge tensors —
one device program per epoch instead of per batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..hierarchy import EdgeSplits, LabelMap
from ..losses.margin import (
    eval_edge_energies,
    level_weights_for_nodes,
    make_negative_sampler,
    margin_loss,
)
from ..models.embedder import LabelEmbedder
from ..optim.rsgd import (
    project_annulus_tree,
    riemannian_adam,
    riemannian_sgd,
    scale_by_conformal_factor,
)
from ..eval import (
    best_threshold_metrics,
    reconstruction_metrics,
    threshold_metrics,
)

ENERGY_TO_MODE = {
    "order": "euclidean",
    "euc_cone": "euc_cone",
    "hyp_cone": "hyp_cone",
}
ENERGY_DEFAULT_K = {"order": None, "euc_cone": 3.0, "hyp_cone": 0.1}


@dataclasses.dataclass
class EmbeddingTrainerConfig:
    energy: str = "hyp_cone"
    embedding_dim: int = 10
    lr: float = 0.1
    batch_size: int = 10
    neg_to_pos_ratio: int = 5
    alpha: float = 1.0
    optimizer: str = "rsgd"          # rsgd | adam | sgd
    pick_per_level: bool = False
    level_weights: Optional[Tuple[float, ...]] = None
    weigh_pos_term: bool = False   # reference --weigh_pos_term: level
    #   weights apply to the positive term ONLY (by default negatives
    #   inherit their positive edge's level weight,
    #   order_embeddings.py:900-916)
    weigh_neg_term: bool = False   # reference --weigh_neg_term: negatives
    #   weighted n_nodes/ratio x 1/deg_tc(corrupted node)
    seed: int = 0
    K: Optional[float] = None        # default per energy
    lr_steps: Tuple[int, ...] = ()   # epochs where lr ×= lr_decay
    lr_decay: float = 0.1
    steps_per_epoch: int = 0         # set by the trainer for the schedule
    donate: bool = True  # donate params/opt-state to the jitted epoch
    #   (in-place update); train_epoch always replaces its refs


class EmbeddingTrainer:
    """Host-side epoch driver around a fully jitted scan-of-steps."""

    def __init__(self, labelmap: LabelMap, splits: EdgeSplits,
                 config: EmbeddingTrainerConfig, mesh=None):
        """mesh: optional ('data','model') mesh — edge batches shard over
        'data', the table/optimizer replicate and GSPMD all-reduces the
        gradients (the reference DataParallel-wraps this Embedder too,
        order_embeddings.py:360)."""
        self.labelmap = labelmap
        self.splits = splits
        self.cfg = config
        self.mesh = mesh
        if mesh is not None and config.batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {config.batch_size} must divide evenly over "
                f"the mesh's {mesh.shape['data']} 'data' shards")
        self.K = config.K if config.K is not None else ENERGY_DEFAULT_K[config.energy]
        mode = ENERGY_TO_MODE[config.energy]
        n = splits.negatives.shape[0]
        self.n_nodes = n
        self.model = LabelEmbedder(n_nodes=n, dim=config.embedding_dim,
                                   mode=mode, K=self.K)
        self.key = jax.random.PRNGKey(config.seed)
        self.key, k0 = jax.random.split(self.key)
        self.params = self.model.init(k0, jnp.zeros((1,), jnp.int32))

        self.sampler = make_negative_sampler(
            splits.negatives, config.neg_to_pos_ratio,
            level_of_node=labelmap.level_of_global(),
            level_start=labelmap.level_start,
            level_stop=labelmap.level_stop,
            pick_per_level=config.pick_per_level,
        )
        self.tx = self._make_optimizer()
        self.opt_state = self.tx.init(self.params)
        self.optimal_threshold = None
        self._energy_kw = {} if self.K is None else {"K": self.K}
        self._epoch_fn = self._build_epoch_fn()
        self._eval_negatives: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    # ------------------------------------------------------------------
    def _make_optimizer(self):
        cfg = self.cfg
        lr = cfg.lr
        if cfg.lr_steps:
            # MultiStepLR (reference lr_step/lr_decay,
            # order_embeddings.py:595-600); boundaries in optimizer steps
            spe = max(cfg.steps_per_epoch,
                      max(len(self.splits.train) // cfg.batch_size, 1))
            lr = optax.piecewise_constant_schedule(
                cfg.lr, {int(e) * spe: cfg.lr_decay for e in cfg.lr_steps})
        if cfg.optimizer == "rsgd":
            assert self.cfg.energy == "hyp_cone", "rsgd is for the ball"
            # pass the schedule through (not cfg.lr): the reference decays
            # its manual-RSGD lr at lr_step epochs (order_embeddings_h.py:775)
            return riemannian_sgd(lr, self.K)
        if cfg.optimizer == "radam":
            assert self.cfg.energy == "hyp_cone", "radam is for the ball"
            return riemannian_adam(lr, self.K)
        base = optax.adam(lr) if cfg.optimizer == "adam" else optax.sgd(
            lr, momentum=0.9)
        if self.cfg.energy == "hyp_cone":
            # hybrid path: riemannian rescale → adam → (annulus projection
            # applied after the update in the step fn)
            return optax.chain(scale_by_conformal_factor(), base)
        return base

    def _build_epoch_fn(self):
        cfg = self.cfg
        model = self.model
        sampler = self.sampler
        tx = self.tx
        energy_kw = self._energy_kw
        level_stop = self.labelmap.level_stop
        lw = cfg.level_weights
        project_hyp = cfg.energy == "hyp_cone" and cfg.optimizer != "rsgd"
        K = self.K

        if cfg.weigh_neg_term:
            # closure degrees for the corrupted-node weighting: the
            # negative adjacency is (all-ones − closure − diag), so the
            # closure is directly available on the splits
            tc = np.asarray(self.splits.closure, bool)
            in_deg = jnp.asarray(tc.sum(axis=0).astype(np.int32))
            out_deg = jnp.asarray(tc.sum(axis=1).astype(np.int32))

        def loss_fn(params, pos_from, pos_to, neg_from, neg_to):
            f = lambda ids: model.apply(params, ids)
            pw = None
            nw = None
            if lw is not None:
                pw = level_weights_for_nodes(pos_to, level_stop, lw)
                if not cfg.weigh_pos_term:
                    # reference default: negatives inherit their positive
                    # edge's level weight (order_embeddings.py:900-916)
                    nw = jnp.repeat(pw, 2 * cfg.neg_to_pos_ratio)
            if cfg.weigh_neg_term:
                from ..losses.margin import degree_neg_weights

                dw = degree_neg_weights(neg_from, neg_to, in_deg, out_deg,
                                        cfg.neg_to_pos_ratio, self.n_nodes)
                nw = dw if nw is None else nw * dw
            loss, (e_pos, e_neg) = margin_loss(
                f(pos_from), f(pos_to), f(neg_from), f(neg_to),
                energy=cfg.energy, alpha=cfg.alpha,
                pos_weights=pw, neg_weights=nw, **energy_kw)
            return loss, (e_pos, e_neg)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(carry, batch):
            params, opt_state, key = carry
            pos_from, pos_to = batch
            key, k = jax.random.split(key)
            neg_from, neg_to = sampler.sample(k, pos_from, pos_to)
            (loss, (e_pos, e_neg)), grads = grad_fn(
                params, pos_from, pos_to, neg_from, neg_to)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if project_hyp:
                params = project_annulus_tree(params, K)
            return (params, opt_state, key), (loss, e_pos, e_neg)

        def epoch(params, opt_state, key, pos_from_b, pos_to_b):
            (params, opt_state, key), (losses, e_pos, e_neg) = jax.lax.scan(
                step, (params, opt_state, key), (pos_from_b, pos_to_b))
            return params, opt_state, key, losses, e_pos, e_neg

        donate = dict(donate_argnums=(0, 1)) if self.cfg.donate else {}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            bsh = NamedSharding(self.mesh, P(None, "data"))   # (nb, bs)
            return jax.jit(epoch, in_shardings=(
                jax.tree_util.tree_map(lambda _: rep, self.params),
                jax.tree_util.tree_map(lambda _: rep, self.opt_state,
                                       is_leaf=lambda x: hasattr(x, "shape")),
                rep, bsh, bsh), **donate)
        return jax.jit(epoch, **donate)

    # ------------------------------------------------------------------
    def _batched_train_edges(self, rng: np.random.RandomState):
        edges = self.splits.train
        perm = rng.permutation(len(edges))
        bs = self.cfg.batch_size
        n_batches = max(len(edges) // bs, 1)
        take = n_batches * bs
        idx = perm[:take] if take <= len(edges) else np.resize(perm, take)
        e = edges[idx].reshape(n_batches, bs, 2)
        return jnp.asarray(e[..., 0]), jnp.asarray(e[..., 1])

    def train_epoch(self, epoch_rng: Optional[np.random.RandomState] = None):
        if epoch_rng is None:
            # persist across calls — a fresh RandomState(seed) per epoch
            # would repeat the identical edge permutation every epoch
            if not hasattr(self, "_epoch_rng"):
                self._epoch_rng = np.random.RandomState(self.cfg.seed)
            epoch_rng = self._epoch_rng
        rng = epoch_rng
        pf, pt = self._batched_train_edges(rng)
        self.key, k = jax.random.split(self.key)
        self.params, self.opt_state, _, losses, e_pos, e_neg = self._epoch_fn(
            self.params, self.opt_state, k, pf, pt)
        return {
            "loss": float(jnp.sum(losses)),
            "e_pos_mean": float(jnp.mean(e_pos)),
            "e_neg_mean": float(jnp.mean(e_neg)),
        }

    # ------------------------------------------------------------------
    def checkpoint_payload(self) -> dict:
        """Trainer half of the shared checkpoint contract. NaN encodes
        "no calibrated threshold yet" — 0.0 is a legitimate calibrated
        value for cone energies (positives can sit exactly at 0 energy)."""
        return {"params": self.params, "opt_state": self.opt_state,
                "optimal_threshold": (
                    float("nan") if self.optimal_threshold is None
                    else float(self.optimal_threshold))}

    def restore_payload(self, payload: dict) -> None:
        self.params = payload["params"]
        self.opt_state = payload["opt_state"]
        thr = float(payload["optimal_threshold"])
        self.optimal_threshold = None if np.isnan(thr) else thr

    # ------------------------------------------------------------------
    def load_embedding_table(self, table: np.ndarray) -> None:
        """Warm start from an external table (--load_cosine_emb /
        --load_emb_from, oe_h.py:1435-1436, order_embeddings.py:722-741).
        2-D cosine warm starts are scaled into the annulus first."""
        table = np.asarray(table, np.float32)
        if self.cfg.energy == "hyp_cone":
            from ..geometry import inner_radius

            r0 = inner_radius(self.K)
            norms = np.linalg.norm(table, axis=1, keepdims=True)
            norms = np.maximum(norms, 1e-12)
            target = r0 + (1 - 2 * r0) * norms / norms.max()
            table = table / norms * target
        self.params = jax.tree_util.tree_map(
            lambda p: jnp.asarray(table) if p.shape == table.shape else p,
            self.params)

    def all_embeddings(self) -> jnp.ndarray:
        return self.model.apply(self.params, jnp.arange(self.n_nodes))

    def _edge_set_with_negatives(self, split: str):
        """Pre-generate 2·ratio corrupted pairs per positive for val/test,
        once, seeded (reference ETHECHierarchy val/test datasets,
        order_embeddings.py:86-130)."""
        if split not in self._eval_negatives:
            edges = getattr(self.splits, split)
            # deterministic per-split seed (python hash() is randomized)
            split_salt = int.from_bytes(split.encode(), "little") % (2**20)
            key = jax.random.PRNGKey(split_salt + self.cfg.seed)
            nf, nt = self.sampler.sample(
                key, jnp.asarray(edges[:, 0]), jnp.asarray(edges[:, 1]))
            self._eval_negatives[split] = (np.asarray(nf), np.asarray(nt))
        return self._eval_negatives[split]

    def evaluate(self, split: str):
        """Energies on a split's positives + its pre-generated negatives;
        val sweeps the threshold (and stores it), test reuses it."""
        edges = getattr(self.splits, split)
        nf, nt = self._edge_set_with_negatives(split)
        emb = self.all_embeddings()
        from ..geometry import ENERGY_FNS
        efn = ENERGY_FNS[self.cfg.energy]
        e_pos = efn(emb[edges[:, 0]], emb[edges[:, 1]], **self._energy_kw)
        e_neg = efn(emb[nf], emb[nt], **self._energy_kw)
        if split == "test" and self.optimal_threshold is not None:
            return threshold_metrics(e_pos, e_neg, self.optimal_threshold)
        m = best_threshold_metrics(e_pos, e_neg)
        if split == "val":
            self.optimal_threshold = float(m.threshold)
        return m

    def reconstruction(self, threshold: Optional[float] = None):
        """All-closure-edges vs all-non-edges check over the label subgraph
        (reference check_graph_embedding)."""
        emb = self.all_embeddings()[: self.labelmap.n_classes]
        closure = self.splits.closure[: self.labelmap.n_classes,
                                      : self.labelmap.n_classes]
        return reconstruction_metrics(
            emb, closure, energy=self.cfg.energy, threshold=threshold,
            mesh=self.mesh, **self._energy_kw)
