"""Joint image+label embedding trainer (the reference's `JointEmbeddings`,
oe.py:1224-1990 / oe_h.py:1318-2247 — the flagship embedding workload).

TPU-first rebuild:

* node ids: labels = global labelmap indices, train images = n_labels + row
  (the reference's int-coding of its mapping_node_to_ix, oe.py:455-465),
* image features: one (n_images, 2048) fc7 array (replacing the
  filename→list feature dict, oe_h.py:2332-2339); image embeddings =
  FeatNet(fc7[row]) with the exp₀ hyperbolic squash,
* unified embedding lookup inside the jitted step: compute the label-table
  and FeatNet branches for the whole id batch and select — static shapes,
  no type-dispatch python loop (replaces calculate_from_and_to_emb,
  oe_h.py:1227-1315),
* negative sampling: structured joint sampler (losses/joint_sampling.py),
* two optimizer groups (labels / images) via optax.multi_transform with
  lr_labels / lr_images (oe_h.py:1512-1526); hyperbolic label path either
  full RSGD or conformal-rescaled adam + annulus projection,
* curriculum level hiding {0:[1,2,3], 20:[2,3], 50:[3], 100:[]}
  (oe_h.py:1534-1536): per stage, edges touching hidden label levels are
  filtered and the sampler's pass cycle is rebuilt,
* eval: joint classification metrics (hit@k / m-F1 via one pairwise-energy
  kernel) + label-subgraph reconstruction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..eval import best_threshold_metrics, reconstruction_metrics
from ..eval.ranking import joint_classification_metrics
from ..geometry import ENERGY_FNS
from ..losses.joint_sampling import filter_stage_edges, JointGraph, make_joint_negative_sampler
from ..losses.margin import variant_loss
from ..models.embedder import FeatNet, LabelEmbedder
from ..optim.rsgd import (
    project_annulus_tree,
    riemannian_adam,
    riemannian_sgd,
    scale_by_conformal_factor,
)

JOINT_MODE = {"order": "euclidean", "euc_cone": "euc_cone",
              "hyp_cone": "hyp_cone_exp0"}
DEFAULT_K = {"order": None, "euc_cone": 3.0, "hyp_cone": 0.1}
# reference curriculum (oe_h.py:1534-1536)
DEFAULT_CURRICULUM = {0: (1, 2, 3), 20: (2, 3), 50: (3,), 100: ()}


def epoch_edge_order(graph: JointGraph, edges: np.ndarray,
                     rng: np.random.RandomState,
                     half_half: bool) -> np.ndarray:
    """Shuffle; with half_half, resample to 50% (label,label) and 50%
    (label,image) edges (reference map_ranges resampling, oe.py:545-584).
    Shared by the fc7 and --use_CNN joint trainers — half_half belongs to
    the edge dataset, which both paths use (oe.py:494-647)."""
    nl = graph.n_labels
    if half_half:
        is_img = edges[:, 1] >= nl
        img_edges = edges[is_img]
        lab_edges = edges[~is_img]
        n = max(len(img_edges), len(lab_edges))
        if len(img_edges) and len(lab_edges):
            take = lambda arr: arr[rng.randint(0, len(arr), n)]
            edges = np.concatenate([take(img_edges), take(lab_edges)])
    return edges[rng.permutation(len(edges))]


def curriculum_levels_for_epoch(curriculum: Dict[int, Tuple[int, ...]],
                                epoch: int) -> Tuple[int, ...]:
    """Hidden levels active at `epoch` (latest stage whose start <= epoch,
    reference levels_to_hide_for_epoch lookup, oe_h.py:1534-1572)."""
    current: Tuple[int, ...] = ()
    for start in sorted(curriculum):
        if epoch >= start:
            current = tuple(curriculum[start])
    return current


def load_label_table(params_labels, table: np.ndarray, energy: str,
                     K: Optional[float]):
    """Warm-start a label-embedding param tree from an external table
    (--load_emb_from / --load_cosine_emb, oe_h.py:1435-1436,
    order_embeddings.py:722-741). Tables not already in the Poincare
    annulus (e.g. 2-D cosine embeddings) are rescaled into it first —
    same rule as EmbeddingTrainer.load_embedding_table."""
    table = np.asarray(table, np.float32)
    if energy == "hyp_cone":
        from ..geometry import inner_radius

        r0 = inner_radius(K)
        norms = np.linalg.norm(table, axis=1, keepdims=True)
        if norms.max() >= 1.0 or norms.min() < r0:
            norms = np.maximum(norms, 1e-12)
            target = r0 + (1 - 2 * r0) * norms / norms.max()
            table = table / norms * target
    loaded = {"n": 0}

    def replace(p):
        if p.shape == table.shape:
            loaded["n"] += 1
            return jnp.asarray(table)
        return p

    out = jax.tree_util.tree_map(replace, params_labels)
    if loaded["n"] != 1:
        raise ValueError(
            f"warm-start table shape {table.shape} matched {loaded['n']} "
            "label-embedding params (expected exactly 1)")
    return out


def joint_edge_metrics(label_emb, image_emb, img_paths_global, graph,
                       *, energy: str, neg_to_pos_ratio: int,
                       pick_per_level: bool, seed: int,
                       threshold=None, **energy_kw):
    """Edge-classification F1 on a held-out split: positives are every
    (ancestor label → image) edge of the split's images; negatives are
    2·ratio corrupted pairs per positive (the reference's joint val/test
    pass, oe_h.py:906-926 + ETHECHierarchyWithImages pre-generation).

    label_emb: (n_labels, d); image_emb: (n_split_images, d) — shared by
    the fc7 trainer (FeatNet on features) and the CNN trainer (tower on
    pixels). threshold=None sweeps best-F1 (val); a float reuses it."""
    from ..eval import threshold_metrics
    from ..losses.joint_sampling import sample_joint_negatives_np

    paths = np.asarray(img_paths_global, np.int32)
    nl = graph.n_labels
    split_graph = JointGraph(
        label_closure=graph.label_closure,
        image_paths_global=paths,
        level_start=graph.level_start,
        level_stop=graph.level_stop)
    n_img, L = paths.shape
    pos_from = paths.reshape(-1)
    pos_to = (nl + np.repeat(np.arange(n_img), L)).astype(np.int32)
    rng = np.random.RandomState(seed)
    # widen: this graph is a val/test split (or an --eval_max_images
    # subsample) — a label covering every image of a small split must
    # yield a metric, not crash a long run mid-eval
    neg_from, neg_to = sample_joint_negatives_np(
        split_graph, neg_to_pos_ratio, rng, pos_from, pos_to,
        pick_per_level=pick_per_level, empty_image_complement="widen")

    lab = jnp.asarray(label_emb)
    img = jnp.asarray(image_emb)

    def emb(ids):
        ids = jnp.asarray(ids)
        lab_e = lab[jnp.minimum(ids, nl - 1)]
        img_e = img[jnp.maximum(ids - nl, 0)]
        return jnp.where((ids >= nl)[:, None], img_e, lab_e)

    efn = ENERGY_FNS[energy]
    e_pos = efn(emb(pos_from), emb(pos_to), **energy_kw)
    e_neg = efn(emb(neg_from), emb(neg_to), **energy_kw)
    if threshold is None:
        return best_threshold_metrics(e_pos, e_neg)
    return threshold_metrics(e_pos, e_neg, threshold)


@dataclasses.dataclass
class JointTrainerConfig:
    energy: str = "hyp_cone"
    embedding_dim: int = 10
    feature_dim: int = 2048
    lr_labels: float = 1e-2
    lr_images: float = 1e-3
    batch_size: int = 10
    neg_to_pos_ratio: int = 5
    alpha: float = 0.05
    optimizer_labels: str = "adam"      # adam | rsgd | radam
    pick_per_level: bool = True
    hide_levels: bool = False
    curriculum: Optional[Dict[int, Tuple[int, ...]]] = None
    half_half: bool = False             # resample 50/50 (l,l)/(l,img) edges
    seed: int = 0
    K: Optional[float] = None
    #: 'margin'  — Σ E⁺ + Σ max(0, α − E⁻) (oe/oe_h joint losses)
    #: 'vendrov' — caption-ranking max-margin of the v1 prototype
    #:             (order_embeddings_images.py:533-542)
    #: 'nll'     — softmax(−d²) NLL (SimpleEuclideanEmbLoss,
    #:             order_embeddings.py:1108-1202; euclidean energies only)
    loss_variant: str = "margin"
    donate: bool = True  # donate params/opt-state to the jitted epoch
    #   (in-place update); train_epoch always replaces its refs


class JointEmbeddingTrainer:
    def __init__(self, labelmap, graph: JointGraph,
                 train_edges: np.ndarray, features: np.ndarray,
                 cfg: JointTrainerConfig, mesh=None):
        """train_edges: (E, 2) node-id pairs (label→label and label→image)
        of the train skeleton (basic edges, like the reference's
        G_train_skeleton_full). features: (n_images, feature_dim) fc7."""
        self.labelmap = labelmap
        self.graph = graph
        self.cfg = cfg
        self.mesh = mesh   # optional ('data','model') mesh: edge batches
        #                    shard over 'data'; params/features replicate
        #                    (GSPMD inserts the gradient all-reduce)
        self.K = cfg.K if cfg.K is not None else DEFAULT_K[cfg.energy]
        mode = JOINT_MODE[cfg.energy]
        self.train_edges = np.asarray(train_edges, np.int32)
        self.features = jnp.asarray(features, jnp.float32)
        if cfg.loss_variant == "nll" and cfg.energy != "order":
            # the reference's SimpleEuclideanEmbLoss is squared-Euclidean
            # distance on flat embeddings (order_embeddings.py:1108-1202) —
            # meaningless on ball/cone coordinates
            raise ValueError("loss_variant='nll' requires the euclidean "
                             "order energy (--loss order_emb_loss)")

        self.embedder = LabelEmbedder(n_nodes=graph.n_labels,
                                      dim=cfg.embedding_dim, mode=mode,
                                      K=self.K)
        self.featnet = FeatNet(dim=cfg.embedding_dim, mode=mode, K=self.K)
        key = jax.random.PRNGKey(cfg.seed)
        k1, k2, self.key = jax.random.split(key, 3)
        self.params = {
            "labels": self.embedder.init(k1, jnp.zeros((1,), jnp.int32)),
            "images": self.featnet.init(
                k2, jnp.zeros((1, cfg.feature_dim), jnp.float32)),
        }
        self.tx = self._make_optimizer()
        self.opt_state = self.tx.init(self.params)
        self._energy_kw = {} if self.K is None else {"K": self.K}
        self.optimal_threshold = None
        self.curriculum = (cfg.curriculum if cfg.curriculum is not None
                           else (DEFAULT_CURRICULUM if cfg.hide_levels else {0: ()}))
        self._stage_cache: Dict[Tuple[int, ...], tuple] = {}

    # ------------------------------------------------------------------
    def _make_optimizer(self):
        cfg = self.cfg
        if cfg.optimizer_labels in ("rsgd", "radam") and \
                cfg.energy != "hyp_cone":
            # match EmbeddingTrainer: Riemannian optimizers are for the
            # Poincare ball, not a silent fall-through to plain adam
            raise ValueError(f"{cfg.optimizer_labels} requires the "
                             "hyperbolic-cone energy")
        if cfg.optimizer_labels == "rsgd":
            label_tx = riemannian_sgd(cfg.lr_labels, self.K)
        elif cfg.optimizer_labels == "radam":
            label_tx = riemannian_adam(cfg.lr_labels, self.K)
        elif self.cfg.energy == "hyp_cone":
            label_tx = optax.chain(scale_by_conformal_factor(),
                                   optax.adam(cfg.lr_labels))
        else:
            label_tx = optax.adam(cfg.lr_labels)
        img_tx = optax.adam(cfg.lr_images)
        return optax.multi_transform(
            {"labels": label_tx, "images": img_tx},
            {"labels": "labels", "images": "images"})

    # ------------------------------------------------------------------
    def node_embeddings(self, params, ids):
        """Unified lookup: label table or FeatNet(fc7) selected by id."""
        nl = self.graph.n_labels
        lab = self.embedder.apply(params["labels"], jnp.minimum(ids, nl - 1))
        img = self.featnet.apply(
            params["images"], self.features[jnp.maximum(ids - nl, 0)])
        return jnp.where((ids >= nl)[:, None], img, lab)

    def levels_for_epoch(self, epoch: int) -> Tuple[int, ...]:
        return curriculum_levels_for_epoch(self.curriculum, epoch)

    def load_embedding_table(self, table: np.ndarray) -> None:
        """Warm-start the label table (--load_emb_from / --load_cosine_emb,
        oe_h.py:1435-1436)."""
        self.params = dict(
            self.params,
            labels=load_label_table(self.params["labels"], table,
                                    self.cfg.energy, self.K))

    # checkpoint payload contract (reference saves model + optimizer +
    # optimal_threshold per epoch, oe_h.py:1876-1909); NaN marks "no
    # calibrated threshold" (0.0 is legitimate for cone energies)
    def checkpoint_payload(self) -> Dict:
        return {"params": self.params, "opt_state": self.opt_state,
                "optimal_threshold": (
                    float("nan") if self.optimal_threshold is None
                    else float(self.optimal_threshold))}

    def restore_payload(self, payload: Dict) -> None:
        self.params = payload["params"]
        self.opt_state = payload["opt_state"]
        thr = float(payload["optimal_threshold"])
        self.optimal_threshold = None if np.isnan(thr) else thr

    def _stage(self, hidden: Tuple[int, ...]):
        """(filtered train edges, epoch_fn) for a curriculum stage."""
        if hidden in self._stage_cache:
            return self._stage_cache[hidden]
        g = self.graph
        edges = filter_stage_edges(g, self.train_edges, hidden)
        sampler = make_joint_negative_sampler(
            g, self.cfg.neg_to_pos_ratio,
            pick_per_level=self.cfg.pick_per_level, levels_to_hide=hidden)
        epoch_fn = self._build_epoch_fn(sampler)
        self._stage_cache[hidden] = (edges, epoch_fn)
        return edges, epoch_fn

    def _build_epoch_fn(self, sampler):
        cfg = self.cfg
        tx = self.tx
        energy_kw = self._energy_kw
        project_hyp = (cfg.energy == "hyp_cone"
                       and cfg.optimizer_labels != "rsgd")
        K = self.K
        node_emb = self.node_embeddings

        def loss_fn(params, pos_from, pos_to, neg_from, neg_to):
            loss, (e_pos, e_neg) = variant_loss(
                cfg.loss_variant,
                node_emb(params, pos_from), node_emb(params, pos_to),
                node_emb(params, neg_from), node_emb(params, neg_to),
                energy=cfg.energy, alpha=cfg.alpha,
                neg_to_pos_ratio=cfg.neg_to_pos_ratio, **energy_kw)
            return loss, (e_pos, e_neg)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(carry, batch):
            params, opt_state, key = carry
            pos_from, pos_to = batch
            key, k = jax.random.split(key)
            neg_from, neg_to = sampler(k, pos_from, pos_to)
            (loss, (e_pos, e_neg)), grads = grad_fn(
                params, pos_from, pos_to, neg_from, neg_to)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if project_hyp:
                params = dict(params,
                              labels=project_annulus_tree(params["labels"], K))
            return (params, opt_state, key), (loss, e_pos, e_neg)

        def epoch(params, opt_state, key, pf, pt):
            (params, opt_state, key), (losses, e_pos, e_neg) = jax.lax.scan(
                step, (params, opt_state, key), (pf, pt))
            return params, opt_state, losses, e_pos, e_neg

        donate = dict(donate_argnums=(0, 1)) if self.cfg.donate else {}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            bsh = NamedSharding(self.mesh, P(None, "data"))  # (nb, bs)
            return jax.jit(
                epoch,
                in_shardings=(jax.tree_util.tree_map(lambda _: rep, self.params),
                              jax.tree_util.tree_map(
                                  lambda _: rep, self.opt_state,
                                  is_leaf=lambda x: hasattr(x, "shape")),
                              rep, bsh, bsh), **donate)
        return jax.jit(epoch, **donate)

    # ------------------------------------------------------------------
    def _epoch_order(self, edges: np.ndarray, rng: np.random.RandomState):
        return epoch_edge_order(self.graph, edges, rng, self.cfg.half_half)

    def train_epoch(self, epoch: int, rng: np.random.RandomState):
        edges, epoch_fn = self._stage(self.levels_for_epoch(epoch))
        edges = self._epoch_order(edges, rng)
        bs = self.cfg.batch_size
        if len(edges) < bs:   # tiny curriculum stage: repeat to one batch
            edges = np.resize(edges, (bs, 2))
        nb = max(len(edges) // bs, 1)
        e = edges[:nb * bs].reshape(nb, bs, 2)
        self.key, k = jax.random.split(self.key)
        self.params, self.opt_state, losses, e_pos, e_neg = epoch_fn(
            self.params, self.opt_state, k,
            jnp.asarray(e[..., 0]), jnp.asarray(e[..., 1]))
        return {
            "loss": float(jnp.sum(losses)),
            "e_pos_mean": float(jnp.mean(e_pos)),
            "e_neg_mean": float(jnp.mean(e_neg)),
        }

    # ------------------------------------------------------------------
    def label_embeddings(self):
        return self.embedder.apply(
            self.params["labels"], jnp.arange(self.graph.n_labels))

    def image_embeddings(self, features=None):
        """FeatNet embeddings of fc7 rows. On a mesh the eval batch shards
        over 'data' like the train step (the reference's eval forward runs
        through the same DataParallel-wrapped net as training,
        oe_h.py:1434-1439, 2018-2053); ragged row counts pad to the shard
        count and the padding is dropped."""
        feats = self.features if features is None else jnp.asarray(features)
        if self.mesh is None:
            return self.featnet.apply(self.params["images"], feats)
        if not hasattr(self, "_embed_jit"):
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = jax.tree_util.tree_map(
                lambda _: NamedSharding(self.mesh, P()),
                self.params["images"])
            self._embed_jit = jax.jit(
                self.featnet.apply,
                in_shardings=(rep, NamedSharding(self.mesh, P("data"))))
        n = feats.shape[0]
        q = self.mesh.shape["data"]
        pad = (-n) % q
        if pad:
            feats = jnp.concatenate(
                [feats, jnp.broadcast_to(feats[-1:],
                                         (pad,) + feats.shape[1:])])
        return self._embed_jit(self.params["images"], feats)[:n]

    def classification_metrics(self, img_paths_global=None, features=None,
                               ks=(1, 3, 5)):
        """hit@k / m-F1 ranking metrics; defaults to the train images."""
        paths = (self.graph.image_paths_global
                 if img_paths_global is None else img_paths_global)
        return joint_classification_metrics(
            self.label_embeddings(),
            self.image_embeddings(features),
            paths, self.labelmap, energy=self.cfg.energy, ks=ks,
            mesh=self.mesh, **self._energy_kw)

    def reconstruction(self, threshold=None):
        nl = self.labelmap.n_classes
        return reconstruction_metrics(
            self.label_embeddings()[:nl],
            self.graph.label_closure[:nl, :nl],
            energy=self.cfg.energy, threshold=threshold, mesh=self.mesh,
            **self._energy_kw)

    def edge_metrics(self, img_paths_global, features, *,
                     threshold=None, seed: int = 17):
        """Edge-classification F1 on a held-out split (joint_edge_metrics
        with this trainer's FeatNet image embeddings). threshold=None
        sweeps best-F1 (val); a float reuses it (test)."""
        return joint_edge_metrics(
            self.label_embeddings(), self.image_embeddings(features),
            img_paths_global, self.graph, energy=self.cfg.energy,
            neg_to_pos_ratio=self.cfg.neg_to_pos_ratio,
            pick_per_level=self.cfg.pick_per_level,
            seed=seed + self.cfg.seed, threshold=threshold,
            **self._energy_kw)
