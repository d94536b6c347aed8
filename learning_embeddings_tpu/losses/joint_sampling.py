"""Structured negative sampling for the joint (image+label) graph.

The reference materializes a dense boolean negative adjacency over ALL
nodes (labels + every train image) — O((n_labels+n_images)²) bytes, saved
as `neg_adjacency.npy` (oe.py:468-474) — and samples corrupted edges with
np.where + random.choice per batch item (oe_h.py:881-905).

Key structural facts of that graph (create_combined_graphs, oe.py:417-491):
  * label→label closure edges: the labelmap's transitive closure,
  * label→image edges: EVERY ancestor level of the image's path,
  * images have no outgoing edges.

Hence membership in the negative adjacency is decidable from (a) the small
label-closure matrix and (b) each image's (L,) ancestor path — no dense
matrix needed. Sampling stays uniform over exactly the same candidate sets:

corrupt 'to' given anchor u (pass at label level l):
    u label : level-l labels − descendants(u) − {u}
    u image : all level-l labels                    (images have no out-edges)
corrupt 'to' given anchor u (pass at image level L):
    u label : images that are NOT descendants of u
    u image : labels − descendants(u) − {u}
corrupt 'from' given anchor v (label level l):
    v label : level-l labels − ancestors(v) − {v}
    v image : level-l labels − {v's ancestor at level l}
corrupt 'from' given anchor v (image level L):
    v label : all images (images never reach labels)
    v image : labels − ancestors(v) − {v}

The image-pass type rule follows the ANCHOR (the kept endpoint), not the
edge: the reference's `type(u/v) == str` test (oe_h.py:869-873) only ever
sees the anchor — the corrupted side is passed as None at the call sites
(oe_h.py:970/975).

Curriculum `levels_to_hide` removes those levels from the pass cycle
(oe_h.py:850-856).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["JointGraph", "build_joint_graph", "make_joint_negative_sampler",
           "sample_joint_negatives_np", "save_joint_graph", "load_joint_graph",
           "filter_stage_edges"]


class JointGraph(NamedTuple):
    """Static arrays describing the combined train graph.

    label_closure: (n_labels, n_labels) bool transitive closure (labels).
    image_paths_global: (n_images, L) int32 — each train image's ancestor
        label (global index) per level. Image node id = n_labels + row.
    level_start/stop: per-level label ranges.
    """

    label_closure: np.ndarray
    image_paths_global: np.ndarray
    level_start: np.ndarray
    level_stop: np.ndarray

    @property
    def n_labels(self) -> int:
        return self.label_closure.shape[0]

    @property
    def n_images(self) -> int:
        return self.image_paths_global.shape[0]

    @property
    def n_levels(self) -> int:
        return self.image_paths_global.shape[1]

    def is_image(self, ids):
        return ids >= self.n_labels

    def positive_mask(self, u: np.ndarray, v: np.ndarray) -> np.ndarray:
        """True where (u, v) is a closure edge of the combined graph."""
        u = np.asarray(u)
        v = np.asarray(v)
        out = np.zeros(u.shape, bool)
        both_label = (u < self.n_labels) & (v < self.n_labels)
        out[both_label] = self.label_closure[u[both_label], v[both_label]]
        li = (u < self.n_labels) & (v >= self.n_labels)
        if li.any():
            paths = self.image_paths_global[v[li] - self.n_labels]
            out[li] = (paths == u[li][:, None]).any(axis=1)
        return out


def build_joint_graph(labelmap, train_level_labels: np.ndarray):
    """(JointGraph, train_edges) from the train split's per-sample level
    labels — the reference's create_combined_graphs (oe.py:417-491):

    * label→label direct edges observed in the data, transitively closed,
    * label→image edges from EVERY ancestor level (basic edges; the closure
      adds nothing on top for images),
    * train_edges = the basic skeleton (G_train_skeleton_full)."""
    from ..hierarchy import label_graph_from_paths, transitive_closure

    ll = np.asarray(train_level_labels)
    basic = label_graph_from_paths(ll, labelmap)
    closure = transitive_closure(basic)
    glob = ll + labelmap.level_start[None, :]
    n_img, L = glob.shape
    nl = labelmap.n_classes
    label_edges = np.stack(np.nonzero(basic), axis=1)
    img_nodes = nl + np.arange(n_img)
    img_edges = np.stack(
        [glob.reshape(-1),
         np.repeat(img_nodes, L)], axis=1)
    train_edges = np.concatenate([label_edges, img_edges]).astype(np.int32)
    graph = JointGraph(
        label_closure=closure,
        image_paths_global=glob.astype(np.int32),
        level_start=np.asarray(labelmap.level_start),
        level_stop=np.asarray(labelmap.level_stop),
    )
    return graph, train_edges


def save_joint_graph(path: str, graph: JointGraph,
                     train_edges: np.ndarray) -> None:
    """Persist the combined graph (replaces the reference's gpickle +
    neg_adjacency.npy cache, oe.py:468-483 / load_combined_graphs)."""
    np.savez_compressed(
        path, label_closure=graph.label_closure,
        image_paths_global=graph.image_paths_global,
        level_start=graph.level_start, level_stop=graph.level_stop,
        train_edges=train_edges)


def load_joint_graph(path: str):
    """(JointGraph, train_edges) from save_joint_graph output."""
    blob = np.load(path)
    graph = JointGraph(
        label_closure=blob["label_closure"],
        image_paths_global=blob["image_paths_global"],
        level_start=blob["level_start"],
        level_stop=blob["level_stop"],
    )
    return graph, blob["train_edges"]


def filter_stage_edges(graph: JointGraph, train_edges: np.ndarray,
                       hidden) -> np.ndarray:
    """Curriculum stage filter: drop every edge touching a hidden label
    level (oe_h.py:1534-1572). Raises if the stage would be empty — the
    silent alternative is training on edges from the very levels the
    curriculum is supposed to hide."""
    hidden = tuple(hidden)
    if not hidden:
        return train_edges
    g = graph
    lvl_of = np.full(g.n_labels + g.n_images, g.n_levels, np.int32)
    for l in range(g.n_levels):
        lvl_of[g.level_start[l]:g.level_stop[l]] = l
    e = np.asarray(train_edges)
    keep = (~np.isin(lvl_of[e[:, 0]], hidden)
            & ~np.isin(lvl_of[e[:, 1]], hidden))
    if not keep.any():
        raise ValueError(
            f"curriculum stage hiding levels {hidden} leaves no training "
            "edges — fix the schedule")
    return e[keep]


def make_joint_negative_sampler(
    graph: JointGraph,
    neg_to_pos_ratio: int,
    *,
    pick_per_level: bool = True,
    levels_to_hide: Sequence[int] = (),
):
    """Jittable (key, pos_from, pos_to) -> (neg_from, neg_to) with the
    reference's slot layout (2R per positive). Rebuild per curriculum stage
    (levels_to_hide is baked in as static masks)."""
    nl = graph.n_labels
    ni = graph.n_images
    L = graph.n_levels
    R = int(neg_to_pos_ratio)

    closure = jnp.asarray(graph.label_closure)              # (nl, nl)
    img_paths = jnp.asarray(graph.image_paths_global)       # (ni, L)

    # pass cycle: levels 0..L-1 and L (= images), minus hidden levels
    # (reference cycle arithmetic, oe_h.py:850-856, 881-883)
    visible = [l for l in range(L + 1) if l not in set(levels_to_hide)]
    if not pick_per_level:
        visible = None
    pass_levels = None if visible is None else np.asarray(
        [visible[r % len(visible)] for r in range(R)], np.int32)

    starts = np.asarray(graph.level_start)
    stops = np.asarray(graph.level_stop)
    label_ix = np.arange(nl)
    level_label_masks = np.stack(
        [(label_ix >= starts[l]) & (label_ix < stops[l]) for l in range(L)])
    level_label_masks = jnp.asarray(level_label_masks)       # (L, nl)

    from .margin import masked_uniform_categorical as _categorical

    def _label_candidates_to(u):
        """(B, nl): labels that are negative successors of u (any level)."""
        u_lab = jnp.minimum(u, nl - 1)
        desc = closure[u_lab]                                 # descendants
        not_self = jax.nn.one_hot(u_lab, nl, dtype=bool)
        lab_mask = ~desc & ~not_self
        # image 'from': every label is a negative successor
        return jnp.where((u >= nl)[:, None], True, lab_mask)

    def _label_candidates_from(v):
        """(B, nl): labels that are negative predecessors of v."""
        v_lab = jnp.minimum(v, nl - 1)
        anc_label = closure[:, v_lab].T | jax.nn.one_hot(v_lab, nl, dtype=bool)
        img_row = jnp.maximum(v - nl, 0)
        anc_img = jnp.zeros((v.shape[0], nl), bool)
        paths = img_paths[img_row]                            # (B, L)
        anc_img = anc_img.at[jnp.arange(v.shape[0])[:, None], paths].set(True)
        anc = jnp.where((v >= nl)[:, None], anc_img, anc_label)
        return ~anc

    def _image_candidates_to(u):
        """(B, ni): images not descended from label u."""
        u_lab = jnp.minimum(u, nl - 1)
        lvl = jnp.searchsorted(jnp.asarray(stops), u_lab, side="right")
        anc_at_lvl = img_paths[:, :].T[lvl]                   # (B, ni)
        return anc_at_lvl != u_lab[:, None]

    # O(1)-per-draw uniform sampling over "images NOT descended from u":
    # per level, sort image rows by their ancestor label — each label's
    # descendant images form ONE contiguous run [run_start[u], +run_cnt[u])
    # in that order, so a uniform draw over the complement is a randint
    # over ni - run_cnt positions plus a skip over the run. Identical
    # distribution to the (B, ni) masked categorical at a tiny fraction of
    # its cost (no per-candidate gumbel noise).
    np_paths = np.asarray(graph.image_paths_global)
    img_order_by_level = []
    run_start_np = np.zeros((L, nl), np.int32)
    run_cnt_np = np.zeros((L, nl), np.int32)
    for l in range(L):
        order_l = np.argsort(np_paths[:, l], kind="stable")
        img_order_by_level.append(order_l)
        anc = np_paths[order_l, l]
        for u in range(int(starts[l]), int(stops[l])):
            lo = np.searchsorted(anc, u, side="left")
            hi = np.searchsorted(anc, u, side="right")
            run_start_np[l, u] = lo
            run_cnt_np[l, u] = hi - lo
    # the empty-complement guard only applies if the image-level pass can
    # actually fire: corrupt-'to' image draws happen on pass slots where
    # pass_levels[r] == L (with pick_per_level=False the unrestricted pass
    # mixes label candidates in, so the row is never empty)
    image_pass_used = pass_levels is not None and bool(
        (pass_levels == L).any())
    if image_pass_used:
        # a label every image descends from has an EMPTY negative-image
        # complement; the clamped draw below would silently return a
        # descendant (a positive trained as a negative). The reference
        # crashes on the empty candidate set (random.choice([]),
        # oe_h.py:881-905) — fail loudly here too. Labels on HIDDEN levels
        # can never anchor a draw (filter_stage_edges drops their edges),
        # so the guard only scans visible label levels — hiding the
        # offending level is a legitimate remedy, not a re-raise.
        empty_compl = run_cnt_np == ni
        for l in set(levels_to_hide):
            if 0 <= l < L:
                empty_compl[:, int(starts[l]):int(stops[l])] = False
        if bool(empty_compl.any()):
            bad = [int(u) for u in np.nonzero(empty_compl.any(0))[0]]
            raise ValueError(
                f"labels {bad} are ancestors of EVERY train image — the "
                "image-level negative pass has no candidates for them; "
                "hide that level or drop pick_per_level")
    img_order_by_level = jnp.asarray(np.stack(img_order_by_level))  # (L, ni)
    run_start = jnp.asarray(run_start_np)
    run_cnt = jnp.asarray(run_cnt_np)
    level_of_label = np.zeros(nl, np.int32)
    for l in range(L):
        level_of_label[starts[l]:stops[l]] = l
    level_of_label = jnp.asarray(level_of_label)

    def _sample_image_not_descended(key, u):
        """(B,) uniform image rows not descended from labels u."""
        u_lab = jnp.minimum(u, nl - 1)
        lvl = level_of_label[u_lab]
        start = run_start[lvl, u_lab]
        cnt = run_cnt[lvl, u_lab]
        n_compl = jnp.maximum(ni - cnt, 1)
        j = jax.random.randint(key, u.shape, 0, n_compl)  # per-element max
        j = j + jnp.where(j >= start, cnt, 0)
        return img_order_by_level[lvl, jnp.minimum(j, ni - 1)]

    def _sample_side(key, anchors, corrupt_to: bool):
        """(B, R) corrupted node ids for one side. Image-pass eligibility
        follows the ANCHOR's type only (the kept endpoint), never the
        discarded one — oe.py:563-647 type(u/v)==str tests."""
        B = anchors.shape[0]
        keys = jax.random.split(key, R)
        cols = []
        for r in range(R):
            lvl = None if pass_levels is None else int(pass_levels[r])
            if corrupt_to:
                lab_mask = _label_candidates_to(anchors)
            else:
                lab_mask = _label_candidates_from(anchors)
            if lvl is None:
                # unrestricted: mix labels and images in one row
                self_col = jax.nn.one_hot(
                    jnp.maximum(anchors - nl, 0), ni, dtype=bool)
                self_col = self_col & (anchors >= nl)[:, None]
                if corrupt_to:
                    img_mask = _image_candidates_to(anchors)
                    img_mask = jnp.where((anchors >= nl)[:, None],
                                         ~self_col, img_mask)
                else:
                    # predecessors of v among images: none (images have no
                    # out-edges) => every image except v is a negative
                    img_mask = ~self_col
                full = jnp.concatenate([lab_mask, img_mask], axis=1)
                cols.append(_categorical(keys[r], full))
            elif lvl < L:
                cols.append(_categorical(
                    keys[r], lab_mask & level_label_masks[lvl][None]))
            else:
                # image-level pass: the corrupted node's TYPE follows the
                # ANCHOR, not the edge — the reference's type(u/v)==str
                # test (oe_h.py:869-873) only ever sees the kept endpoint
                # (calls pass the other as None, oe_h.py:970/975): a label
                # anchor corrupts with an IMAGE, an image anchor with a
                # LABEL. ('from' anchors are always labels here, so
                # corrupt-'to' always draws images.)
                anchor_is_image = anchors >= nl
                # independent keys: the batch mixes label- and image-
                # anchored elements, so both draws are partially consumed
                # in one pass — sharing keys[r] would correlate them
                k_img, k_lab = jax.random.split(keys[r])
                if corrupt_to:
                    img_pick = nl + _sample_image_not_descended(
                        k_img, anchors)
                else:
                    img_pick = nl + jax.random.randint(k_img, (B,), 0, ni)
                lab_pick = _categorical(k_lab, lab_mask)
                cols.append(jnp.where(anchor_is_image, lab_pick, img_pick))
        return jnp.stack(cols, axis=1)                        # (B, R)

    @jax.jit
    def sample(key, pos_from, pos_to):
        B = pos_from.shape[0]
        k1, k2 = jax.random.split(key)
        corrupted_to = _sample_side(k1, pos_from, corrupt_to=True)
        corrupted_from = _sample_side(k2, pos_to, corrupt_to=False)
        nf = jnp.concatenate(
            [jnp.broadcast_to(pos_from[:, None], (B, R)), corrupted_from], 1)
        nt = jnp.concatenate(
            [corrupted_to, jnp.broadcast_to(pos_to[:, None], (B, R))], 1)
        return nf.reshape(-1), nt.reshape(-1)

    return sample


def sample_joint_negatives_np(
    graph: JointGraph,
    neg_to_pos_ratio: int,
    rng: np.random.RandomState,
    pos_from: np.ndarray,
    pos_to: np.ndarray,
    *,
    pick_per_level: bool = True,
    levels_to_hide=(),
    empty_image_complement: str = "raise",
):
    """Host-side mirror of make_joint_negative_sampler (same candidate
    sets, numpy RNG) — used by the end-to-end CNN joint trainer, whose
    image pixels must be gathered on host before the jitted step, and as
    an oracle for testing the device sampler.

    empty_image_complement: what to do when a label is an ancestor of
    EVERY image in `graph` (the image-level pass has no candidates for
    it). 'raise' matches the device sampler's build-time failure — right
    for TRAIN graphs, where the caller can hide the level or drop
    pick_per_level. 'widen' falls back to the label candidate set for
    that draw (the unrestricted pass restricted to its non-empty half) —
    right for EVAL splits / subsamples, whose composition the trainer
    config cannot fix (a tiny split where one label covers every image
    must still produce a metric)."""
    nl, ni, L = graph.n_labels, graph.n_images, graph.n_levels
    R = int(neg_to_pos_ratio)
    B = len(pos_from)
    closure = graph.label_closure
    img_paths = graph.image_paths_global
    starts, stops = graph.level_start, graph.level_stop

    visible = [l for l in range(L + 1) if l not in set(levels_to_hide)]

    def label_cands_to(u):
        if u >= nl:
            return np.ones(nl, bool)
        m = ~closure[u].copy()
        m[u] = False
        return m

    def label_cands_from(v):
        if v >= nl:
            m = np.ones(nl, bool)
            m[img_paths[v - nl]] = False
            return m
        m = ~closure[:, v].copy()
        m[v] = False
        return m

    # run-range image-negative draws (same trick as the device sampler):
    # per level, images sorted by ancestor — a label's descendants form one
    # contiguous run; uniform over the complement is randint + a skip
    _orders = {}

    def _run_range(u):
        lvl = int(np.searchsorted(stops, u, side="right"))
        if lvl not in _orders:
            order_l = np.argsort(img_paths[:, lvl], kind="stable")
            _orders[lvl] = (order_l, img_paths[order_l, lvl])
        order_l, anc = _orders[lvl]
        lo = int(np.searchsorted(anc, u, side="left"))
        hi = int(np.searchsorted(anc, u, side="right"))
        return order_l, lo, hi - lo

    def image_not_descended(u):
        """Uniform image row not descended from u, or None when no image
        qualifies and the caller asked to widen (see docstring)."""
        order_l, start, cnt = _run_range(u)
        n_compl = ni - cnt
        if n_compl <= 0:
            if empty_image_complement == "widen":
                return None
            # no image is a valid negative for u — match the device
            # sampler's build-time failure (and the reference's crash on
            # an empty candidate set) instead of corrupting the loss
            raise ValueError(
                f"label {u} is an ancestor of every image in this graph — "
                "no negative-image candidates (train graph: hide its level "
                "or drop pick_per_level; eval split/subsample: pass "
                "empty_image_complement='widen')")
        j = int(rng.randint(n_compl))
        if j >= start:
            j += cnt
        return int(order_l[j])

    def choice(mask, offset=0):
        cand = np.nonzero(mask)[0]
        if len(cand) == 0:
            cand = np.arange(len(mask))
        return offset + int(cand[rng.randint(len(cand))])

    neg_from = np.empty(2 * R * B, np.int32)
    neg_to = np.empty(2 * R * B, np.int32)
    for i in range(B):
        u, v = int(pos_from[i]), int(pos_to[i])
        for r in range(R):
            lvl = visible[r % len(visible)] if pick_per_level else None
            # corrupt 'to' given u
            if lvl is None:
                lm = label_cands_to(u)
                if u < nl:
                    lvl_u = int(np.searchsorted(stops, u, side="right"))
                    im = img_paths[:, lvl_u] != u
                else:
                    im = ~np.eye(1, ni, u - nl, dtype=bool)[0]
                full = np.concatenate([lm, im])
                c = choice(full)
            elif lvl < L:
                m = label_cands_to(u) & (np.arange(nl) >= starts[lvl]) \
                    & (np.arange(nl) < stops[lvl])
                c = choice(m)
            else:
                # anchor-based type rule (see make_joint_negative_sampler)
                row = None if u >= nl else image_not_descended(u)
                c = (choice(label_cands_to(u)) if row is None
                     else nl + row)
            neg_from[2 * R * i + r] = u
            neg_to[2 * R * i + r] = c
            # corrupt 'from' given v
            if lvl is None:
                lm = label_cands_from(v)
                im = np.ones(ni, bool)
                if v >= nl:
                    im[v - nl] = False
                c = choice(np.concatenate([lm, im]))
            elif lvl < L:
                m = label_cands_from(v) & (np.arange(nl) >= starts[lvl]) \
                    & (np.arange(nl) < stops[lvl])
                c = choice(m)
            else:
                c = (choice(label_cands_from(v)) if v >= nl
                     else nl + rng.randint(ni))
            neg_from[2 * R * i + r + R] = c
            neg_to[2 * R * i + r + R] = v
    return neg_from, neg_to
