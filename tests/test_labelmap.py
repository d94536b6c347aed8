"""Labelmap / index-arithmetic tests (SURVEY.md §4: labelmap level offsets,
child masks, decode_children are natural test seams)."""

import numpy as np
import pytest

from learning_embeddings_tpu.hierarchy import (
    build_labelmap,
    labelmap_from_records,
    toy_labelmap,
)


def small_labelmap():
    """2 families / 3 subfamilies / 5 genera — hand-checkable."""
    return build_labelmap(
        level_names=("family", "subfamily", "genus"),
        names_by_level=[
            ["fA", "fB"],
            ["sA1", "sA2", "sB1"],
            ["g1", "g2", "g3", "g4", "g5"],
        ],
        child_of_by_name=[
            {"fA": ["sA1", "sA2"], "fB": ["sB1"]},
            {"sA1": ["g1", "g2"], "sA2": ["g3"], "sB1": ["g4", "g5"]},
        ],
    )


def test_levels_and_offsets():
    lm = small_labelmap()
    assert lm.levels == (2, 3, 5)
    assert lm.n_classes == 10
    np.testing.assert_array_equal(lm.level_start, [0, 2, 5])
    np.testing.assert_array_equal(lm.level_stop, [2, 5, 10])


def test_level_labels_and_one_hot():
    lm = small_labelmap()
    ll = lm.get_level_labels("fA", "sA2", "g3")
    np.testing.assert_array_equal(ll, [0, 1, 2])
    oh = lm.get_one_hot("fA", "sA2", "g3")
    assert oh.shape == (10,)
    # global indices 0 (fA), 2+1=3 (sA2), 5+2=7 (g3)
    np.testing.assert_array_equal(np.nonzero(oh)[0], [0, 3, 7])


def test_children_and_parents():
    lm = small_labelmap()
    assert lm.get_children_of(-1, 0) == [0, 1]
    assert lm.get_children_of(0, 1) == [0, 1]   # fA -> sA1, sA2
    assert lm.get_children_of(1, 1) == [2]      # fB -> sB1
    assert lm.get_children_of(2, 2) == [3, 4]   # sB1 -> g4, g5
    # parent pointers (global)
    assert lm.parent_ix[2] == 0   # sA1 -> fA
    assert lm.parent_ix[4] == 1   # sB1 -> fB
    assert lm.parent_ix[8] == 4   # g4 -> sB1
    assert lm.parent_ix[0] == -1


def test_decode_children_matches_reference_semantics():
    # reference db.py:3550-3563: per level, candidates = children of gt
    # parent; new label = index of gt within that candidate list.
    lm = small_labelmap()
    possible, new_labels = lm.decode_children(np.array([1, 2, 4]))
    assert possible["family"] == [0, 1]
    assert possible["subfamily"] == [2]        # children of fB
    assert possible["genus"] == [3, 4]         # children of sB1
    assert new_labels == [1, 0, 1]


def test_leaf_paths():
    lm = small_labelmap()
    paths = lm.leaf_paths()
    assert paths.shape == (5, 3)
    # g4 (leaf rel 3) -> sB1 (rel 2) -> fB (rel 1)
    np.testing.assert_array_equal(paths[3], [1, 2, 3])
    np.testing.assert_array_equal(paths[0], [0, 0, 0])


def test_toy_labelmap_complete_tree():
    lm = toy_labelmap(branching=3, n_levels=3)
    assert lm.levels == (3, 9, 27)
    # node i at level l+1 is child of i // b
    assert lm.get_children_of(1, 1) == [3, 4, 5]
    mask = lm.child_masks[1]
    assert mask.sum() == 27 and (mask.sum(axis=1) == 3).all()


def test_labelmap_from_records_merged_leaf():
    records = [
        {"family": "F1", "subfamily": "S1", "genus": "G1", "specific_epithet": "e1"},
        {"family": "F1", "subfamily": "S1", "genus": "G1", "specific_epithet": "e2"},
        {"family": "F1", "subfamily": "S2", "genus": "G2", "specific_epithet": "e1"},
        {"family": "F2", "subfamily": "S3", "genus": "G3", "specific_epithet": "e3"},
    ]
    lm = labelmap_from_records(records)
    assert lm.level_names[-1] == "genus_specific_epithet"
    assert lm.levels == (2, 3, 3, 4)
    # merged leaf names G1_e1, G1_e2 under genus G1
    g1 = lm.name_to_ix[2]["G1"]
    kids = lm.get_children_of(g1, 3)
    names = [lm.ix_to_name[3][k] for k in kids]
    assert names == ["G1_e1", "G1_e2"]


def test_full_child_mask_and_level_of():
    lm = small_labelmap()
    A = lm.full_child_mask()
    assert A.shape == (10, 10)
    assert A.sum() == 8  # 3 subfamilies + 5 genera
    assert A[0, 2] and A[0, 3] and A[1, 4]
    np.testing.assert_array_equal(
        lm.level_of_global(), [0, 0, 1, 1, 1, 2, 2, 2, 2, 2])


def test_butterfly200_frozen_taxonomy():
    """The shipped Butterfly200 taxonomy must carry the reference's exact
    5/23/116/200 counts (Butterfly200LabelMap, db.py:17-1115) and form a
    valid single-parent tree."""
    from learning_embeddings_tpu.hierarchy import butterfly200_labelmap

    lm = butterfly200_labelmap()
    assert lm.levels == (5, 23, 116, 200)
    assert lm.n_classes == 344
    # reference index order spot checks (db.py:20-27, 173+)
    assert lm.name_to_ix[0]["Papilionidae"] == 0
    assert lm.name_to_ix[0]["Hesperiidae"] == 4
    # every leaf has a full 4-level ancestor path
    paths = lm.leaf_paths()
    assert paths.shape == (200, 4)
    assert (paths >= 0).all()
    # families of all leaves are valid
    assert (paths[:, 0] < 5).all()
