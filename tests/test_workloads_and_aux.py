"""Tests for CIFAR/FMNIST workloads, multilabel eval, confusion, stats,
preprocessing, reports, and viz smoke."""

import json
import os

import numpy as np
import pytest

from learning_embeddings_tpu.data.workloads import (
    ArrayDataset,
    cifar10_labelmap,
    cifar100_labelmap,
    fmnist_labelmap,
    stratified_index_split,
    synthetic_array_dataset,
)
from learning_embeddings_tpu.eval.multilabel import (
    multilabel_metrics,
    tune_per_class_thresholds,
    tune_single_threshold,
)
from learning_embeddings_tpu.eval.confusion import (
    child_sorted_order,
    cross_level_confusion,
)
from learning_embeddings_tpu.eval.reports import Summarize
from learning_embeddings_tpu.hierarchy import toy_labelmap
from learning_embeddings_tpu.hierarchy.stats import export_d3_json, graph_stats

RNG = np.random.RandomState(0)


def test_cifar10_labelmap_structure():
    lm = cifar10_labelmap()
    assert lm.levels == (2, 4, 10)
    # reference taxonomy: cat -> living/land; truck -> non_living/vehicle
    ll = lm.get_level_labels("living", "land", "cat")
    assert lm.parent_ix[lm.level_start[2] + ll[2]] == lm.level_start[1] + ll[1]
    assert lm.get_children_of(lm.name_to_ix[1]["craft"], 2) == [
        lm.name_to_ix[2]["plane"], lm.name_to_ix[2]["ship"]]


def test_cifar100_labelmap_structure():
    lm = cifar100_labelmap()
    assert lm.levels == (20, 100)
    kids = lm.get_children_of(lm.name_to_ix[0]["trees"], 1)
    names = {lm.ix_to_name[1][k] for k in kids}
    assert names == {"maple_tree", "oak_tree", "palm_tree", "pine_tree",
                     "willow_tree"}


def test_fmnist_labelmap_structure():
    lm = fmnist_labelmap()
    assert lm.levels == (4, 10)
    kids = lm.get_children_of(lm.name_to_ix[0]["footwear"], 1)
    assert {lm.ix_to_name[1][k] for k in kids} == {"Sandal", "Sneaker",
                                                   "Ankle boot"}


def test_stratified_index_split_disjoint():
    labels = RNG.randint(0, 10, 500)
    tr, va, te = stratified_index_split(labels)
    assert len(set(tr) & set(va)) == 0
    assert len(set(tr) & set(te)) == 0
    assert len(tr) + len(va) + len(te) == 500
    for c in range(10):
        n = (labels == c).sum()
        assert abs((labels[tr] == c).sum() - 0.8 * n) <= 2


def test_synthetic_dataset_learnable_structure():
    lm = fmnist_labelmap()
    ds = synthetic_array_dataset(lm, 100, size=16, channels=1)
    assert ds.images.shape == (100, 16, 16, 1)
    assert ds.level_labels.shape == (100, 2)
    mh = ds.multihot(lm)
    assert (mh.sum(1) == 2).all()


def test_multilabel_threshold_tuning_and_metrics():
    lm = toy_labelmap(2, 2)       # 2 + 4 classes
    N = 200
    paths = lm.leaf_paths()
    ll = paths[RNG.randint(0, 4, N)]
    mh = np.zeros((N, lm.n_classes), np.float32)
    mh[np.arange(N)[:, None], ll + lm.level_start[None, :]] = 1
    # separable scores: gt positions high + noise
    scores = RNG.randn(N, lm.n_classes) * 0.3 + mh * 2.0
    th = tune_per_class_thresholds(scores, mh)
    m = multilabel_metrics(scores, mh, th, lm)
    assert m["global"]["micro"]["f1"] > 0.9
    assert m["level_0"]["micro"]["f1"] > 0.9
    st = tune_single_threshold(scores, mh)
    m2 = multilabel_metrics(scores, mh, st, lm)
    assert m2["global"]["micro"]["f1"] > 0.85


def test_cross_level_confusion_and_child_order():
    lm = toy_labelmap(2, 3)
    order = child_sorted_order(lm, 2)
    assert sorted(order.tolist()) == list(range(8))
    N = 50
    paths = lm.leaf_paths()
    ll = paths[RNG.randint(0, 8, N)]
    scores = np.zeros((N, lm.n_classes), np.float32)
    glob = ll + lm.level_start[None, :]
    scores[np.arange(N)[:, None], glob] = 5.0     # perfect predictions
    m, ro, co = cross_level_confusion(scores, ll, lm, pred_level=2, gt_level=1)
    # perfect leaf predictions land inside the gt subfamily's child block
    total = m.sum()
    assert total == N
    # every leaf prediction's parent equals the gt level-1 node
    for i, gt_rel in enumerate(ro):
        row = m[i]
        kids = set(lm.get_children_of(int(gt_rel), 2))
        assert row[[j for j, c in enumerate(co) if int(c) not in kids]].sum() == 0


def test_graph_stats_and_d3_export(tmp_path):
    lm = toy_labelmap(3, 3)
    s = graph_stats(lm)
    assert s["n_nodes"] == 39 and s["n_edges"] == 36
    assert s["max_out_degree"] == 3
    payload = export_d3_json(lm, str(tmp_path / "d3.json"))
    assert len(payload["nodes"]) == 39 and len(payload["links"]) == 36
    assert json.load(open(tmp_path / "d3.json"))["nodes"][0]["level"] == 0


def test_summarize_markdown(tmp_path):
    s = Summarize(str(tmp_path))
    s.make_heading("Title", 1)
    s.make_table([[1.0, 2], [3.5, 4]], x_labels=["a", "b"],
                 y_labels=["r1", "r2"])
    s.make_text("hello")
    content = open(tmp_path / "summary.md").read()
    assert "# Title" in content and "| r1 | 1.0000 | 2 |" in content


def test_contour_crop_finds_specimen():
    import cv2
    from learning_embeddings_tpu.data.preprocess import contour_crop, fixed_crop

    img = np.full((200, 300, 3), 230, np.uint8)       # light background
    cv2.ellipse(img, (150, 100), (60, 35), 0, 0, 360, (40, 30, 20), -1)
    box = contour_crop(img)
    assert box is not None
    x, y, w, h = box
    assert x < 150 < x + w and y < 100 < y + h
    assert w * h < 0.7 * 200 * 300
    fx, fy, fw, fh = fixed_crop(img)
    assert fw == 240 and fh == 160


def test_viz_smoke(tmp_path):
    from learning_embeddings_tpu.viz.hypernymy import plot_hierarchy_embedding
    from learning_embeddings_tpu.viz.contours import (
        plot_dot_product_voronoi, plot_label_vectors)

    lm = toy_labelmap(2, 3)
    emb = RNG.randn(lm.n_classes, 2) * 0.3
    plot_hierarchy_embedding(emb, lm, str(tmp_path / "h.png"),
                             img_emb=RNG.randn(20, 2) * 0.3)
    assert (tmp_path / "h.png").exists()
    plot_label_vectors([RNG.randn(n, 2) for n in lm.levels], lm,
                       str(tmp_path / "v.png"))
    region = plot_dot_product_voronoi(RNG.randn(4, 2),
                                      str(tmp_path / "vor.png"), res=50)
    assert region.shape == (50, 50) and len(np.unique(region)) > 1


def test_embedding_inversion_analysis(tmp_path):
    """plot_contours.py:200-330 parity: sphere inversion of 2-d label
    vectors + tree-edge plot + dot-product reconstruction scoring."""
    from learning_embeddings_tpu.viz.contours import (
        dot_product_reconstruction,
        invert_embeddings,
        plot_inverted_embedding,
    )

    lm = toy_labelmap(2, 3)
    # ideal dot-product order embedding: child = parent direction, larger
    # norm -> closure reconstructs perfectly
    emb = np.zeros((lm.n_classes, 2))
    level_of = lm.level_of_global()
    rng = np.random.RandomState(3)
    for g in range(lm.n_classes):
        p = lm.parent_ix[g]
        base = emb[p] if p >= 0 else np.zeros(2)
        d = rng.randn(2) * 0.05 + (1.0 if p < 0 else 0.0) * rng.randn(2)
        v = base + d
        v = v / max(np.linalg.norm(v), 1e-9)
        emb[g] = v * (1.0 + level_of[g])

    inv = invert_embeddings(emb, scale=3.0)
    # inversion flips the norm ordering: deepest level ends up smallest
    mean_norm = [np.linalg.norm(inv[level_of == l], axis=1).mean()
                 for l in range(lm.n_levels)]
    assert mean_norm[0] > mean_norm[-1]
    # x/‖x‖² preserves direction
    cos = (inv * emb).sum(1) / (
        np.linalg.norm(inv, axis=1) * np.linalg.norm(emb, axis=1))
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)

    out = plot_inverted_embedding(emb, lm, str(tmp_path / "inv.png"))
    assert (tmp_path / "inv.png").exists() and out.shape == emb.shape

    m = dot_product_reconstruction(emb, lm)
    # the dot energy is symmetric while the closure is directed, so high F1
    # is unreachable by construction (same limit as the reference's
    # dot_operator analysis) — assert the sweep produces a valid scoring
    assert 0.0 < float(m.f1) <= 1.0
    assert np.isfinite(float(m.threshold))
    assert float(m.recall) <= 1.0 and float(m.precision) <= 1.0


def _write_minimal_xlsx(path, header, rows):
    """Hand-rolled spreadsheetml zip: shared strings + one sheet."""
    import zipfile

    strings, sidx = [], {}

    def s(v):
        if v not in sidx:
            sidx[v] = len(strings)
            strings.append(v)
        return sidx[v]

    def col(i):
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(65 + r) + out
        return out

    body = []
    for ri, row in enumerate([header] + rows, start=1):
        cells = []
        for ci, v in enumerate(row):
            ref = f"{col(ci)}{ri}"
            if isinstance(v, str):
                cells.append(f'<c r="{ref}" t="s"><v>{s(v)}</v></c>')
            else:
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        body.append(f'<row r="{ri}">{"".join(cells)}</row>')
    sheet = ('<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>'
             + "".join(body) + "</sheetData></worksheet>")
    sst = ('<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
           '2006/main">' + "".join(f"<si><t>{x}</t></si>" for x in strings)
           + "</sst>")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)


def test_generate_database_from_xlsx(tmp_path):
    """xlsx -> token-keyed json (utilities.py:7-46), exercised through the
    dependency-free spreadsheetml reader."""
    import json

    from learning_embeddings_tpu.data.build_db import (
        generate_database_from_xlsx)

    xlsx = tmp_path / "master.xlsx"
    header = ["image_name", "family", "subfamily", "genus",
              "specific_epithet", "image_path"]
    rows = [[f"im_{i}.jpg", "Pieridae", "Pierinae", "Pieris",
             f"sp{i % 3}", "imgs"] for i in range(12)]
    _write_minimal_xlsx(str(xlsx), header, rows)

    db = generate_database_from_xlsx(str(xlsx), str(tmp_path / "db.json"))
    assert len(db) == 12
    rec = next(iter(db.values()))
    assert rec["family"] == "Pieridae" and "token" in rec
    on_disk = json.load(open(tmp_path / "db.json"))
    assert len(on_disk) == 12
    # --mini keeps 10 rows (utilities.py:16-19)
    db_mini = generate_database_from_xlsx(str(xlsx),
                                          str(tmp_path / "mini.json"),
                                          mini=True)
    assert len(db_mini) == 10


def test_xlsx_trailing_empty_and_positional_cells(tmp_path):
    """Writers drop trailing empty <c> elements and may omit r= refs —
    trailing columns must come back as "" (openpyxl parity), positional
    cells must land in the next column."""
    import zipfile

    from learning_embeddings_tpu.data.build_db import (
        generate_database_from_xlsx)

    sheet = (
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>image_name</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>family</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>specific_epithet</t></is></c>'
        '</row>'
        # row 2: trailing empty specific_epithet cell omitted entirely
        '<row r="2">'
        '<c r="A2" t="inlineStr"><is><t>im_0.jpg</t></is></c>'
        '<c r="B2" t="inlineStr"><is><t>Pieridae</t></is></c>'
        '</row>'
        # row 3: second+third cells have no r= -> positional (B3, C3)
        '<row r="3">'
        '<c r="A3" t="inlineStr"><is><t>im_1.jpg</t></is></c>'
        '<c t="inlineStr"><is><t>Nymphalidae</t></is></c>'
        '<c t="inlineStr"><is><t>rapae</t></is></c>'
        '</row>'
        '</sheetData></worksheet>')
    xlsx = tmp_path / "edge.xlsx"
    with zipfile.ZipFile(xlsx, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)

    db = generate_database_from_xlsx(str(xlsx), str(tmp_path / "edge.json"))
    recs = sorted(db.values(), key=lambda r: r["image_name"])
    assert recs[0]["family"] == "Pieridae"
    assert recs[0]["specific_epithet"] == ""     # padded, not missing
    assert recs[1]["family"] == "Nymphalidae"    # positional cell -> col B
    assert recs[1]["specific_epithet"] == "rapae"
