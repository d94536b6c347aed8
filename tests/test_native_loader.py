"""Native C++ loader tests: build, decode/augment correctness, cv2 parity,
pipeline integration."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from learning_embeddings_tpu.data import native_loader


pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native loader build unavailable")

RNG = np.random.RandomState(0)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    paths = []
    for i in range(8):
        p = str(d / f"im_{i}.jpg")
        cv2.imwrite(p, RNG.randint(0, 255, (90, 120, 3), np.uint8))
        paths.append(p)
    return paths


def test_batch_shapes_and_range(jpegs):
    batch, status = native_loader.load_augment_batch(jpegs, 64, train=True)
    assert batch.shape == (8, 64, 64, 3) and batch.dtype == np.float32
    assert (status == 0).all()
    assert 0.0 <= batch.min() and batch.max() <= 1.0


def test_pad0_train_is_resize_plus_flip(jpegs):
    """pad=0 + train=True (the JOINT train transform, oe_h.py:1463-1467):
    the zero-headroom crop degenerates to a plain resize, so every output
    must equal the eval resize or its horizontal mirror."""
    ev, _ = native_loader.load_augment_batch(jpegs, 64, train=False)
    tr, status = native_loader.load_augment_batch(jpegs, 64, pad=0,
                                                  train=True, seed=5)
    assert (status == 0).all()
    flips = 0
    for a, b in zip(tr, ev):
        if np.array_equal(a, b):
            continue
        assert np.array_equal(a, b[:, ::-1]), \
            "pad=0 train output is neither the resize nor its mirror"
        flips += 1
    assert 0 < flips < len(jpegs)   # hflip fires with p=0.5


def test_eval_matches_python_pipeline(jpegs):
    """Eval path (plain resize) must match the cv2 python pipeline pixel
    values closely (same half-pixel bilinear; jpeg decoders may differ by
    a few levels)."""
    from learning_embeddings_tpu.data.pipeline import augment_eval, decode_image

    batch, status = native_loader.load_augment_batch(jpegs, 56, train=False)
    for i, p in enumerate(jpegs[:3]):
        ref = augment_eval(decode_image(p), 56).astype(np.float32) / 255.0
        diff = np.abs(batch[i] - ref).mean()
        assert diff < 0.02, diff


def test_grayscale(jpegs):
    batch, status = native_loader.load_augment_batch(
        jpegs, 32, train=False, grayscale=True)
    assert batch.shape == (8, 32, 32, 1) and (status == 0).all()


def test_determinism_and_seed_variation(jpegs):
    a, _ = native_loader.load_augment_batch(jpegs, 48, train=True, seed=1)
    b, _ = native_loader.load_augment_batch(jpegs, 48, train=True, seed=1)
    c, _ = native_loader.load_augment_batch(jpegs, 48, train=True, seed=2)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_missing_file_status(jpegs):
    batch, status = native_loader.load_augment_batch(
        ["/tmp/definitely_missing.jpg"] + jpegs[:2], 32, train=False)
    assert status[0] != 0 and (status[1:] == 0).all()


def test_uint8_output_matches_f32(jpegs):
    """uint8 batches (the low-bandwidth transfer format) must equal the
    f32 batch up to the one rounding step: |u8/255 - f32| <= 0.5/255."""
    f, _ = native_loader.load_augment_batch(jpegs, 48, train=True, seed=3)
    u, su = native_loader.load_augment_batch(jpegs, 48, train=True, seed=3,
                                             out_dtype=np.uint8)
    assert u.dtype == np.uint8 and u.shape == f.shape
    assert (su == 0).all()
    assert np.abs(u.astype(np.float32) / 255.0 - f).max() <= 0.5 / 255 + 1e-6


def test_pipeline_uint8_mode(jpegs):
    from learning_embeddings_tpu.data import ImagePipeline, encode_records
    from learning_embeddings_tpu.hierarchy import labelmap_from_records

    recs = [{"token": f"t{i}", "image_path": "",
             "image_name": os.path.basename(p),
             "family": "F", "subfamily": "S", "genus": "G",
             "specific_epithet": f"e{i % 2}"} for i, p in enumerate(jpegs)]
    lm = labelmap_from_records(recs)
    ds = encode_records(recs, lm)
    root = os.path.dirname(jpegs[0])
    kw = dict(image_size=40, batch_size=4, train=True, num_workers=2)
    pu = ImagePipeline(ds, lm, root, out_dtype="uint8", **kw)
    pf = ImagePipeline(ds, lm, root, **kw)
    bu = next(iter(pu.batches(np.arange(4), seed=5)))
    bf = next(iter(pf.batches(np.arange(4), seed=5)))
    assert bu["image"].dtype == np.uint8
    assert np.abs(bu["image"].astype(np.float32) / 255.0
                  - bf["image"]).max() <= 0.5 / 255 + 1e-6


def test_resize_matches_cv2_exactly():
    img = RNG.randint(0, 255, (75, 101, 3), np.uint8)
    ours = native_loader.resize_bilinear(img, 40, 64)
    ref = cv2.resize(img, (64, 40), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_pipeline_uses_native_path(jpegs, tmp_path):
    from learning_embeddings_tpu.data import ImagePipeline, encode_records
    from learning_embeddings_tpu.hierarchy import labelmap_from_records

    recs = []
    for i, p in enumerate(jpegs):
        recs.append({"token": f"t{i}", "image_path": "",
                     "image_name": os.path.basename(p),
                     "family": "F", "subfamily": "S", "genus": "G",
                     "specific_epithet": f"e{i % 2}"})
    lm = labelmap_from_records(recs)
    ds = encode_records(recs, lm)
    pipe = ImagePipeline(ds, lm, os.path.dirname(jpegs[0]), image_size=48,
                         batch_size=4, train=True, num_workers=2)
    assert pipe._native
    batches = list(pipe.batches(np.arange(len(ds)), seed=0))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 48, 48, 3)
