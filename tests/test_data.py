"""Data-layer tests: ETHEC records, stratified split rules, pipeline with
synthetic fixture images, weighted resampler distribution."""

import json
import os

import numpy as np
import pytest

from learning_embeddings_tpu.data import (
    ImagePipeline,
    WeightedResampler,
    encode_records,
    filter_to_labelmap,
    load_ethec_json,
    stratified_split,
)
from learning_embeddings_tpu.hierarchy import labelmap_from_records

RNG = np.random.RandomState(0)


def synth_records(n_per_leaf):
    """Records over 2 families / 2 subfamilies / 2 genera / len(n_per_leaf)
    leaves with given per-leaf counts."""
    recs = []
    t = 0
    for leaf_ix, n in enumerate(n_per_leaf):
        for _ in range(n):
            recs.append({
                "token": f"tok{t}",
                "image_path": "imgs",
                "image_name": f"im_{t}.jpg",
                "family": f"F{leaf_ix % 2}",
                "subfamily": f"S{leaf_ix % 2}",
                "genus": f"G{leaf_ix % 2}",
                "specific_epithet": f"e{leaf_ix}",
            })
            t += 1
    return recs


def test_encode_records_roundtrip():
    recs = synth_records([4, 4, 4])
    lm = labelmap_from_records(recs)
    ds = encode_records(recs, lm)
    assert ds.level_labels.shape == (12, 4)
    mh = ds.multihot(lm)
    assert (mh.sum(axis=1) == lm.n_levels).all()
    # leaf label consistent with last level
    np.testing.assert_array_equal(ds.leaf_labels, ds.level_labels[:, -1])


def test_stratified_split_reference_rules():
    # counts: 2 (dropped), 6 (thirds: 2/2/2), 20 (16/2/2)
    recs = synth_records([2, 6, 20])
    lm = labelmap_from_records(recs)
    train, val, test = stratified_split(recs, lm)
    def leaves(rs):
        return sorted(set(f"{r['genus']}_{r['specific_epithet']}" for r in rs))
    # the 2-sample class is dropped everywhere
    assert all("e0" not in l for l in leaves(train) + leaves(val) + leaves(test))
    by_leaf = lambda rs, e: [r for r in rs if r["specific_epithet"] == e]
    assert len(by_leaf(train, "e1")) == 2
    assert len(by_leaf(val, "e1")) == 2
    assert len(by_leaf(test, "e1")) == 2
    assert len(by_leaf(train, "e2")) == 16
    assert len(by_leaf(val, "e2")) == 2
    assert len(by_leaf(test, "e2")) == 2
    # disjoint tokens for the >=10 class
    tr = {r["token"] for r in by_leaf(train, "e2")}
    va = {r["token"] for r in by_leaf(val, "e2")}
    te = {r["token"] for r in by_leaf(test, "e2")}
    assert not (tr & va) and not (tr & te) and not (va & te)


def test_filter_to_labelmap():
    recs = synth_records([5, 5])
    lm_small = labelmap_from_records(recs[:5])   # only leaf e0
    kept = filter_to_labelmap(recs, lm_small)
    assert len(kept) == 5
    assert all(r["specific_epithet"] == "e0" for r in kept)


@pytest.fixture()
def image_dir(tmp_path):
    import cv2

    recs = synth_records([6, 6])
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    for r in recs:
        img = RNG.randint(0, 255, (72, 96, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "imgs" / r["image_name"]), img)
    return tmp_path, recs


def test_pipeline_shapes_and_range(image_dir):
    root, recs = image_dir
    lm = labelmap_from_records(recs)
    ds = encode_records(recs, lm)
    pipe = ImagePipeline(ds, lm, str(root), image_size=64, batch_size=4,
                         train=True, num_workers=2)
    order = np.arange(len(ds))
    batches = list(pipe.batches(order, seed=0))
    assert len(batches) == 3
    b = batches[0]
    assert b["image"].shape == (4, 64, 64, 3)
    assert b["image"].dtype == np.float32
    assert 0.0 <= b["image"].min() and b["image"].max() <= 1.0
    assert b["level_labels"].shape == (4, 4)
    assert b["multihot"].shape == (4, lm.n_classes)


def test_pipeline_eval_deterministic(image_dir):
    root, recs = image_dir
    lm = labelmap_from_records(recs)
    ds = encode_records(recs, lm)
    pipe = ImagePipeline(ds, lm, str(root), image_size=32, batch_size=5,
                         train=False, num_workers=2)
    order = np.arange(len(ds))
    a = list(pipe.batches(order))
    b = list(pipe.batches(order))
    # eval keeps the ragged tail: 12 samples / bs 5 -> 3 batches
    assert len(a) == 3 and a[-1]["image"].shape[0] == 2
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["image"], y["image"])


def test_pipeline_grayscale(image_dir):
    root, recs = image_dir
    lm = labelmap_from_records(recs)
    ds = encode_records(recs, lm)
    pipe = ImagePipeline(ds, lm, str(root), image_size=32, batch_size=4,
                         train=True, grayscale=True, num_workers=2)
    b = next(iter(pipe.batches(np.arange(len(ds)))))
    assert b["image"].shape == (4, 32, 32, 1)


def test_weighted_resampler_balances_classes():
    # leaf 0: 900 samples, leaf 1: 100 — inverse weighting should draw
    # each class ~50%
    leaf = np.array([0] * 900 + [1] * 100)
    rs = WeightedResampler(leaf, n_leaf=2, weight_strategy="inv")
    order = rs.order(np.random.RandomState(0), n_draws=20000)
    frac1 = (leaf[order] == 1).mean()
    assert 0.45 < frac1 < 0.55
    rs2 = WeightedResampler(leaf, n_leaf=2, weight_strategy="inv_sqrt")
    frac1s = (leaf[rs2.order(np.random.RandomState(0), 20000)] == 1).mean()
    assert 0.2 < frac1s < 0.3  # sqrt weighting: 1/sqrt(9) ratio ≈ 0.25


def test_butterfly200_style_records(tmp_path):
    """Butterfly200 uses the same record schema and level names as ETHEC
    (db.py:17-1115) — the generic loader must handle its shape (5 families,
    deeper fan-out) end to end through load_ethec_data."""
    import json
    from learning_embeddings_tpu.cli.common import load_ethec_data

    rng = np.random.RandomState(0)
    fams = [f"Fam{i}" for i in range(5)]
    recs = {}
    for t in range(300):
        f = fams[t % 5]
        sub = f"{f}_sub{t % 3}"          # nested: genus belongs to one
        genus = f"{sub}_g{(t // 15) % 2}"  # subfamily (tree property)
        recs[f"tok{t}"] = {
            "token": f"tok{t}", "image_path": "imgs",
            "image_name": f"b{t}.jpg", "family": f,
            "subfamily": sub, "genus": genus,
            "specific_epithet": f"sp{t % 4}",
        }
    items = list(recs.items())
    for split, sl in [("train", slice(0, 200)), ("val", slice(200, 250)),
                      ("test", slice(250, 300))]:
        with open(tmp_path / f"{split}.json", "w") as fh:
            json.dump(dict(items[sl]), fh)
    lm, datasets, _ = load_ethec_data(str(tmp_path))
    assert lm.n_levels == 4 and lm.levels[0] == 5
    assert sum(len(d) for d in datasets.values()) == 300
    assert (datasets["train"].level_labels < np.asarray(lm.levels)).all()


def test_pipeline_producer_error_propagates(image_dir):
    """A failing image load must raise in the consumer, not hang it on an
    out_q.get() that is never fed (the producer thread died)."""
    root, recs = image_dir
    recs = [dict(r) for r in recs]
    recs[0]["image_name"] = "does_not_exist.jpg"
    lm = labelmap_from_records(recs)
    ds = encode_records(recs, lm)
    pipe = ImagePipeline(ds, lm, str(root), image_size=32, batch_size=4,
                         train=True, num_workers=2)
    with pytest.raises(Exception):
        for _ in pipe.batches(np.arange(len(ds)), seed=0):
            pass
