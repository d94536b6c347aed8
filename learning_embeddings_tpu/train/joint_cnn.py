"""End-to-end CNN joint trainer — the `--use_CNN` path of the reference's
JointEmbeddings (oe_h.py:1394-1409 FeatCNN18, calculate_from_and_to_emb's
pixel branch oe_h.py:970-1010): image embeddings come from a CNN tower on
raw pixels, trained jointly with the label table.

Host/device split (the TPU version of the reference's on-demand
`dataloader.get_image` fetches):

1. negatives sampled on host (numpy mirror of the structured sampler) so
   the sampled image nodes' pixels can be gathered before the step,
2. the unique images of the batch are loaded once (native C++ loader when
   available) and shipped as one (U, S, S, 3) tensor,
3. the jitted step runs the CNN tower once over the unique images and
   scatters embeddings into the edge slots via index arrays — static
   shapes via a fixed per-batch image budget.

Multi-chip: pass a ('data','model') mesh — the reference DataParallel-wraps
this tower too (oe_h.py:1434-1439). The unique-image tower batch and the
edge-slot arrays shard over 'data'; the label table, FeatCNN params and
optimizer state replicate (GSPMD inserts the gradient all-reduce and the
cross-device BN-statistics reductions, preserving global-batch semantics).

This is also the benchmark configuration of BASELINE.json's north star
("ETHEC ResNet-50 + hyperbolic-cone joint training images/sec/chip").
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.joint_sampling import JointGraph, sample_joint_negatives_np
from ..losses.margin import variant_loss
from ..models.embedder import FeatCNN, LabelEmbedder
from ..ops.image import device_scale
from ..optim.rsgd import (project_annulus_tree, riemannian_adam,
                          riemannian_sgd, scale_by_conformal_factor)
from .joint import (DEFAULT_CURRICULUM, DEFAULT_K, JOINT_MODE,
                    curriculum_levels_for_epoch, epoch_edge_order,
                    joint_edge_metrics, load_label_table)


@dataclasses.dataclass
class JointCNNConfig:
    energy: str = "hyp_cone"
    backbone: str = "resnet50"
    embedding_dim: int = 10
    image_size: int = 448
    lr_labels: float = 1e-2
    lr_images: float = 1e-3
    batch_size: int = 10
    neg_to_pos_ratio: int = 5
    alpha: float = 0.05
    optimizer_labels: str = "adam"
    pick_per_level: bool = True
    levels_to_hide: Tuple[int, ...] = ()
    hide_levels: bool = False           # reference --hide_levels curriculum
    curriculum: Optional[Dict[int, Tuple[int, ...]]] = None
    half_half: bool = False             # 50/50 (l,l)/(l,img) edge resample
    loss_variant: str = "margin"   # margin | vendrov | nll (see joint.py)
    seed: int = 0
    K: Optional[float] = None
    tower_dtype: str = "bfloat16"  # compute dtype of the CNN tower (MXU
    #   wants bf16; float32 for exact-parity testing)
    bn_stats_dtype: str = "float32"  # 'bfloat16' = half-precision BN stat
    #   sweeps in the tower (see resnet.GhostBatchNorm.stats_dtype)
    pixel_bucket: Optional[int] = None  # unique-image pad granularity (one
    #   jit compile per bucket); default = batch_size. Raise it when
    #   compiles are expensive (e.g. remote TPU) to collapse the bucket set
    prefetch: bool = True  # overlap host batch prep (sampling + pixel
    #   gather) with the device step via a one-deep background thread
    inflight_steps: int = 4  # dispatch-queue bound: sync on the loss this
    #   many steps back (each queued step pins its HBM input buffers)
    remat: bool = False  # rematerialize tower blocks in backward (trades
    #   recompute FLOPs for activation memory — for 448-scale training
    #   next to large device-resident pixel banks)
    freeze_bn: bool = False  # frozen BN stats in the image tower (no
    #                          stat/stat-grad sweeps — see BASELINE.md)
    freeze_images: bool = False  # --freeze_weights: feature-extracting
    #   image tower — only the final projection ('fc') trains; the trunk
    #   is frozen (the reference stores feature_extracting on the joint
    #   trainer, oe_h.py:1348/2374; classifier semantics finetuner.py:138)
    donate: bool = True  # donate params/stats/opt-state to the jitted step
    #   (in-place update, halves the state's HBM footprint across a step);
    #   train_prepared always replaces its state refs, so only external
    #   holders of self.params/opt_state (tests) need donate=False


class JointCNNTrainer:
    def __init__(self, labelmap, graph: JointGraph, train_edges: np.ndarray,
                 pixel_loader: Callable[[np.ndarray], np.ndarray],
                 cfg: JointCNNConfig, mesh=None):
        """pixel_loader(image_rows) -> (n, S, S, 3) float32 in [0,1] (or
        uint8; the step scales on device). mesh: optional ('data','model')
        jax.sharding.Mesh — tower batch + edge slots shard over 'data'."""
        self.labelmap = labelmap
        self.graph = graph
        self.cfg = cfg
        self.mesh = mesh
        self.K = cfg.K if cfg.K is not None else DEFAULT_K[cfg.energy]
        mode = JOINT_MODE[cfg.energy]
        self.train_edges = np.asarray(train_edges, np.int32)
        self.pixel_loader = pixel_loader
        if cfg.loss_variant == "nll" and cfg.energy != "order":
            # the reference's SimpleEuclideanEmbLoss is squared-Euclidean
            # distance on flat embeddings (order_embeddings.py:1108-1202) —
            # meaningless on ball/cone coordinates
            raise ValueError("loss_variant='nll' requires the euclidean "
                             "order energy (--loss order_emb_loss)")
        if mesh is not None:
            n_data = mesh.shape["data"]
            if cfg.batch_size % n_data:
                raise ValueError(
                    f"batch_size {cfg.batch_size} must divide evenly over "
                    f"the mesh's {n_data} 'data' shards")

        self.embedder = LabelEmbedder(n_nodes=graph.n_labels,
                                      dim=cfg.embedding_dim, mode=mode,
                                      K=self.K)
        self.featcnn = FeatCNN(backbone=cfg.backbone, dim=cfg.embedding_dim,
                               mode=mode, K=self.K,
                               dtype=jnp.dtype(cfg.tower_dtype),
                               remat=cfg.remat,
                               bn_stats_dtype=cfg.bn_stats_dtype)
        key = jax.random.PRNGKey(cfg.seed)
        k1, k2 = jax.random.split(key)
        img_vars = self.featcnn.init(
            k2, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)), train=False)
        self.params = {
            "labels": self.embedder.init(k1, jnp.zeros((1,), jnp.int32)),
            "images": img_vars["params"],
        }
        self.batch_stats = img_vars.get("batch_stats", {})
        self.tx = self._make_optimizer()
        self.opt_state = self.tx.init(self.params)
        self._energy_kw = {} if self.K is None else {"K": self.K}
        self._step = self._build_step()
        self._rng = np.random.RandomState(cfg.seed)
        self.optimal_threshold = None
        # no explicit curriculum: a plain levels_to_hide config is a
        # single-stage "curriculum" (train_epoch re-applies the stage every
        # epoch, so defaulting to {0: ()} would silently reset it)
        self.curriculum = (cfg.curriculum if cfg.curriculum is not None
                           else (DEFAULT_CURRICULUM if cfg.hide_levels
                                 else {0: tuple(cfg.levels_to_hide)}))

    def _make_optimizer(self):
        cfg = self.cfg
        if cfg.optimizer_labels in ("rsgd", "radam") and \
                cfg.energy != "hyp_cone":
            raise ValueError(f"{cfg.optimizer_labels} requires the "
                             "hyperbolic-cone energy")
        if cfg.optimizer_labels == "rsgd":
            label_tx = riemannian_sgd(cfg.lr_labels, self.K)
        elif cfg.optimizer_labels == "radam":
            label_tx = riemannian_adam(cfg.lr_labels, self.K)
        elif cfg.energy == "hyp_cone":
            label_tx = optax.chain(scale_by_conformal_factor(),
                                   optax.adam(cfg.lr_labels))
        else:
            label_tx = optax.adam(cfg.lr_labels)

        def route(params):
            # feature-extracting mode freezes everything in the image
            # tower except the final projection (classifier freeze-trunk
            # semantics, finetuner.py:138)
            img = {k: ("images" if k == "fc" or not self.cfg.freeze_images
                       else "frozen")
                   for k in params["images"]}
            return {"labels": "labels", "images": img}

        return optax.multi_transform(
            {"labels": label_tx, "images": optax.adam(cfg.lr_images),
             "frozen": optax.set_to_zero()},
            route)

    def _build_step(self):
        cfg = self.cfg
        tx = self.tx
        energy_kw = self._energy_kw
        nl = self.graph.n_labels
        project_hyp = (cfg.energy == "hyp_cone"
                       and cfg.optimizer_labels != "rsgd")
        K = self.K

        def emb(params, img_embs, ids, pix):
            lab = self.embedder.apply(params["labels"],
                                      jnp.minimum(ids, nl - 1))
            img = img_embs[jnp.maximum(pix, 0)]
            return jnp.where((pix >= 0)[:, None], img, lab)

        def loss_fn(params, batch_stats, pixels,
                    pf, pt, nf, nt, pix_pf, pix_pt, pix_nf, pix_nt):
            pixels = device_scale(pixels)   # uint8 transfer format support
            if cfg.freeze_bn:
                img_embs = self.featcnn.apply(
                    {"params": params["images"], "batch_stats": batch_stats},
                    pixels, train=False)
                mutated = {"batch_stats": batch_stats}
            else:
                img_embs, mutated = self.featcnn.apply(
                    {"params": params["images"], "batch_stats": batch_stats},
                    pixels, train=True, mutable=["batch_stats"])
            loss, (e_pos, e_neg) = variant_loss(
                cfg.loss_variant,
                emb(params, img_embs, pf, pix_pf),
                emb(params, img_embs, pt, pix_pt),
                emb(params, img_embs, nf, pix_nf),
                emb(params, img_embs, nt, pix_nt),
                energy=cfg.energy, alpha=cfg.alpha,
                neg_to_pos_ratio=cfg.neg_to_pos_ratio, **energy_kw)
            return loss, (mutated["batch_stats"], e_pos, e_neg)

        def step(params, batch_stats, opt_state, pixels,
                 pf, pt, nf, nt, pix_pf, pix_pt, pix_nf, pix_nt):
            (loss, (new_stats, e_pos, e_neg)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats, pixels,
                                       pf, pt, nf, nt,
                                       pix_pf, pix_pt, pix_nf, pix_nt)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if project_hyp:
                params = dict(params,
                              labels=project_annulus_tree(params["labels"], K))
            return params, new_stats, opt_state, loss, e_pos, e_neg

        donate = dict(donate_argnums=(0, 1, 2)) if self.cfg.donate else {}
        if self.mesh is None:
            return jax.jit(step, **donate)

        # GSPMD: tower batch + edge slots over 'data'; params/stats/opt
        # replicated — XLA all-reduces the grads and the BN statistics
        # (global-batch semantics, like the reference's DataParallel wrap
        # of the tower, oe_h.py:1434-1439)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        dat = NamedSharding(self.mesh, P("data"))
        pix_sh = NamedSharding(self.mesh, P("data", None, None, None))

        def rep_tree(t, **kw):
            return jax.tree_util.tree_map(lambda _: rep, t, **kw)

        return jax.jit(step, in_shardings=(
            rep_tree(self.params), rep_tree(self.batch_stats),
            rep_tree(self.opt_state, is_leaf=lambda x: hasattr(x, "shape")),
            pix_sh, dat, dat, dat, dat, dat, dat, dat, dat), **donate)

    # ------------------------------------------------------------------
    def load_embedding_table(self, table: np.ndarray) -> None:
        """Warm-start the label table (--load_emb_from / --load_cosine_emb,
        oe_h.py:1435-1436)."""
        self.params = dict(
            self.params,
            labels=load_label_table(self.params["labels"], table,
                                    self.cfg.energy, self.K))

    def load_tower_trunk(self, trunk_params, trunk_stats) -> None:
        """Warm-start the image tower's trunk from a finetuned classifier —
        the reference's FeatCNN workflow (oe.py:232-289 loads a trained
        resnet50 through `Inference` into the joint tower; oe_h.py:1394-1409
        wires it under --use_CNN). The projection head ('fc') stays freshly
        initialized: the classifier head has classifier shapes. Both models
        build the trunk through the same BACKBONES entry (heads.py /
        embedder.py, name='trunk'), so the pytrees line up structurally."""
        cur = set(self.params["images"]["trunk"])
        new = set(trunk_params)
        if cur != new:
            raise ValueError(
                f"trunk param mismatch: only-ours={sorted(cur - new)[:4]} "
                f"only-theirs={sorted(new - cur)[:4]} (stem/backbone must "
                f"match the classifier's)")
        images = dict(self.params["images"],
                      trunk=jax.tree_util.tree_map(jnp.asarray, trunk_params))
        self.params = dict(self.params, images=images)
        self.batch_stats = dict(
            self.batch_stats,
            trunk=jax.tree_util.tree_map(jnp.asarray, trunk_stats))

    def levels_for_epoch(self, epoch: int) -> Tuple[int, ...]:
        return curriculum_levels_for_epoch(self.curriculum, epoch)

    def checkpoint_payload(self) -> Dict:
        return {"params": self.params, "batch_stats": self.batch_stats,
                "opt_state": self.opt_state,
                "optimal_threshold": (
                    float("nan") if self.optimal_threshold is None
                    else float(self.optimal_threshold))}

    def restore_payload(self, payload: Dict) -> None:
        self.params = payload["params"]
        self.batch_stats = payload["batch_stats"]
        self.opt_state = payload["opt_state"]
        thr = float(payload["optimal_threshold"])
        self.optimal_threshold = None if np.isnan(thr) else thr

    # ------------------------------------------------------------------
    def prepare_batch(self, pos_from: np.ndarray, pos_to: np.ndarray):
        """Host side of one step: negative sampling, unique-pixel gather,
        slot indexing. Returns the argument tuple for `train_prepared` —
        separated so input preparation can be pipelined/prefetched away
        from the device step (and benchmarked separately)."""
        g = self.graph
        nl = g.n_labels
        nf, nt = sample_joint_negatives_np(
            g, self.cfg.neg_to_pos_ratio, self._rng, pos_from, pos_to,
            pick_per_level=self.cfg.pick_per_level,
            levels_to_hide=self.cfg.levels_to_hide)
        all_ids = np.concatenate([pos_from, pos_to, nf, nt])
        img_rows = np.unique(all_ids[all_ids >= nl]) - nl
        if len(img_rows) == 0:
            img_rows = np.zeros((1,), np.int64)   # static-friendly dummy
        # pad the unique-image count to a bucket (multiple of pixel_bucket
        # or batch_size, and of the mesh's data shards) so the jitted step
        # compiles once per bucket and shards evenly
        q = self.cfg.pixel_bucket or self.cfg.batch_size
        if self.mesh is not None:
            q = math.lcm(q, self.mesh.shape["data"])
        bucket = -(-len(img_rows) // q) * q
        padded = np.resize(img_rows, bucket)
        pixels = self.pixel_loader(padded)

        def pix_idx(ids):
            # img_rows is sorted unique (np.unique output): slot lookup is
            # a vectorized searchsorted instead of a per-id python dict
            ids = np.asarray(ids)
            rows = ids - nl
            slots = np.searchsorted(img_rows, rows)
            slots = np.minimum(slots, len(img_rows) - 1)
            valid = (ids >= nl) & (img_rows[slots] == rows)
            return np.where(valid, slots, -1).astype(np.int32)

        return (jnp.asarray(pixels),
                jnp.asarray(pos_from), jnp.asarray(pos_to),
                jnp.asarray(nf), jnp.asarray(nt),
                jnp.asarray(pix_idx(pos_from)), jnp.asarray(pix_idx(pos_to)),
                jnp.asarray(pix_idx(nf)), jnp.asarray(pix_idx(nt)))

    def train_prepared(self, prepared):
        """Device side of one step. Returns (loss_array, e_pos, e_neg) —
        loss stays on device so callers control synchronization."""
        self.params, self.batch_stats, self.opt_state, loss, e_pos, e_neg = \
            self._step(self.params, self.batch_stats, self.opt_state,
                       *prepared)
        return loss, e_pos, e_neg

    def train_batch(self, pos_from: np.ndarray, pos_to: np.ndarray):
        """One step: host prep + jitted update. Returns (loss, e_pos, e_neg)."""
        loss, e_pos, e_neg = self.train_prepared(
            self.prepare_batch(pos_from, pos_to))
        return float(loss), e_pos, e_neg

    def set_levels_to_hide(self, levels: Tuple[int, ...]) -> None:
        """Curriculum stage switch (reference levels_to_hide_for_epoch,
        oe_h.py:1534-1572): hidden levels are excluded from negative
        sampling AND their edges are dropped from the epoch."""
        self.cfg = dataclasses.replace(self.cfg,
                                       levels_to_hide=tuple(levels))

    def _stage_edges(self) -> np.ndarray:
        from ..losses.joint_sampling import filter_stage_edges

        return filter_stage_edges(self.graph, self.train_edges,
                                  self.cfg.levels_to_hide)

    def train_epoch(self, epoch: int, rng: np.random.RandomState):
        """One epoch over the current curriculum stage; reports the same
        stats shape as the fc7 trainer (loss sum + mean energies) so the
        two joint paths' logged curves are comparable."""
        self.set_levels_to_hide(self.levels_for_epoch(epoch))
        stage = self._stage_edges()
        edges = epoch_edge_order(self.graph, stage, rng,
                                 self.cfg.half_half)
        bs = self.cfg.batch_size
        if len(edges) < bs:
            edges = np.resize(edges, (bs, 2))
        nb = max(len(edges) // bs, 1)

        def prepared_batches():
            for b in range(nb):
                e = edges[b * bs:(b + 1) * bs]
                yield self.prepare_batch(e[:, 0], e[:, 1])

        batches = prepared_batches()
        if self.cfg.prefetch:
            # host prep of batch k+1 overlaps the device step of batch k
            from ..data.pipeline import prefetch_one

            batches = prefetch_one(batches)
        # accumulate on device, but BOUND the dispatch queue: host dispatch
        # outruns 100+ms device steps, and every queued step pins its
        # pixel buffers in HBM — an unbounded epoch of queued (U,448,448,3)
        # batches OOMs. Materializing a loss K steps back keeps K steps in
        # flight (overlap preserved) with bounded live buffers.
        losses, eps, ens = [], [], []
        K = max(self.cfg.inflight_steps, 1)
        for prepared in batches:
            loss, e_pos, e_neg = self.train_prepared(prepared)
            losses.append(loss)
            eps.append(jnp.mean(e_pos))
            ens.append(jnp.mean(e_neg))
            if len(losses) % K == 0:
                float(losses[-K])   # value fetch = true sync (tunnel-safe)
        return {"loss": float(jnp.sum(jnp.stack(losses))),
                "e_pos_mean": float(jnp.mean(jnp.stack(eps))),
                "e_neg_mean": float(jnp.mean(jnp.stack(ens)))}

    # ------------------------------------------------------------------
    # evaluation (reference joint eval: calculate_classification_metrics +
    # check_graph_embedding, oe_h.py:1971-2247)
    # ------------------------------------------------------------------
    def image_embeddings_for_rows(self, rows, loader=None,
                                  batch_size: int = 32) -> np.ndarray:
        """Embed arbitrary image rows through the CNN tower in batches.
        On a mesh each chunk shards over 'data' (see
        image_embeddings_from_pixels), so the chunk size rounds up to a
        multiple of the data-shard count."""
        loader = loader or self.pixel_loader
        rows = np.asarray(rows)
        if self.mesh is not None:
            q = self.mesh.shape["data"]
            batch_size = -(-batch_size // q) * q
        out = []
        for i in range(0, len(rows), batch_size):
            chunk = rows[i:i + batch_size]
            n = len(chunk)
            if n < batch_size:
                # pad the ragged tail to the chunk size: one jit compile
                # total (remote TPU compiles are expensive)
                chunk = np.resize(chunk, batch_size)
            px = loader(chunk)
            out.append(np.asarray(self.image_embeddings_from_pixels(px))[:n])
        return np.concatenate(out)

    def classification_metrics(self, img_paths_global, image_embs,
                               ks=(1, 3, 5)):
        """hit@k / m-F1 of ranking labels per image by energy."""
        from ..eval.ranking import joint_classification_metrics

        return joint_classification_metrics(
            self.label_embeddings(), image_embs,
            np.asarray(img_paths_global), self.labelmap,
            energy=self.cfg.energy, ks=ks, mesh=self.mesh,
            **self._energy_kw)

    def edge_metrics(self, img_paths_global, image_embs, *,
                     threshold=None, seed: int = 17):
        """Edge-classification F1 on a held-out split (joint_edge_metrics
        with tower embeddings computed from pixels). threshold=None sweeps
        best-F1 (val); a float reuses it (test)."""
        return joint_edge_metrics(
            self.label_embeddings(), image_embs, img_paths_global,
            self.graph, energy=self.cfg.energy,
            neg_to_pos_ratio=self.cfg.neg_to_pos_ratio,
            pick_per_level=self.cfg.pick_per_level,
            seed=seed + self.cfg.seed, threshold=threshold,
            **self._energy_kw)

    def reconstruction(self, threshold=None):
        from ..eval.reconstruction import reconstruction_metrics

        nl = self.labelmap.n_classes
        return reconstruction_metrics(
            self.label_embeddings()[:nl],
            self.graph.label_closure[:nl, :nl],
            energy=self.cfg.energy, threshold=threshold, mesh=self.mesh,
            **self._energy_kw)

    def image_embeddings_from_pixels(self, pixels):
        """Eval forward of the CNN tower. On a mesh the pixel batch shards
        over 'data' with params/stats replicated — the reference's eval
        loop drives the same DataParallel-wrapped tower as training
        (oe_h.py:1434-1439, 2018-2053); a single-device eval would idle
        every other chip each eval interval."""
        if not hasattr(self, "_embed_jit"):
            def fn(p, s, px):
                return self.featcnn.apply(
                    {"params": p, "batch_stats": s}, device_scale(px),
                    train=False)

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self.mesh, P())
                rep_tree = lambda t: jax.tree_util.tree_map(lambda _: rep, t)
                self._embed_jit = jax.jit(fn, in_shardings=(
                    rep_tree(self.params["images"]),
                    rep_tree(self.batch_stats),
                    NamedSharding(self.mesh, P("data", None, None, None))))
            else:
                self._embed_jit = jax.jit(fn)
        return self._embed_jit(self.params["images"], self.batch_stats,
                               jnp.asarray(pixels))

    def label_embeddings(self):
        return self.embedder.apply(self.params["labels"],
                                   jnp.arange(self.graph.n_labels))
