"""Host-side input pipeline: decode → augment → batch → prefetch.

Replaces the reference's torchvision/DataLoader stack (transforms at
ethec_experiments.py:263-291; cv2 reads in ETHECDB.__getitem__,
db.py:3792-3798; worker processes) with a thread-pool decode pipeline
(cv2 releases the GIL) and a device-prefetch queue:

train:  resize (S+64, S+64) → random crop (S, S) → random hflip → /255
eval:   resize (S, S) → /255
grayscale variant: grayscale → resize (S, S) → (train: hflip) → /255

Output batches are NHWC float32 in [0, 1] (the reference's ToTensor scale;
normalization was commented out upstream and stays off by default, with
optional mean/std for parity experiments) — or raw NHWC uint8 with
``out_dtype="uint8"``, the TPU-first transfer format: 4x less
host→device bandwidth, with the /255 running on device where XLA fuses
it into the first convolution (numerically identical).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    from PIL import Image

    _HAS_CV2 = False

__all__ = ["ImagePipeline", "decode_image", "augment_train", "augment_eval"]


def decode_image(path: str, grayscale: bool = False) -> np.ndarray:
    """HWC uint8, RGB (or HW1 grayscale)."""
    if _HAS_CV2:
        flag = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR
        img = cv2.imread(path, flag)
        if img is None:
            raise FileNotFoundError(path)
        if grayscale:
            return img[..., None]
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = Image.open(path)  # pragma: no cover
    img = img.convert("L" if grayscale else "RGB")
    arr = np.asarray(img)
    return arr[..., None] if grayscale else arr


def _resize(img: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    if _HAS_CV2:
        out = cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_LINEAR)
        return out[..., None] if out.ndim == 2 else out
    from PIL import Image  # pragma: no cover

    out = np.asarray(Image.fromarray(img.squeeze()).resize((hw[1], hw[0])))
    return out[..., None] if out.ndim == 2 else out


def augment_train(img: np.ndarray, size: int, rng: np.random.RandomState,
                  initial_pad: int = 64) -> np.ndarray:
    """resize (S+64)² → random crop S² → random hflip (train transforms,
    ethec_experiments.py:263-271)."""
    big = _resize(img, (size + initial_pad, size + initial_pad))
    y = rng.randint(0, initial_pad + 1)
    x = rng.randint(0, initial_pad + 1)
    crop = big[y:y + size, x:x + size]
    if rng.rand() < 0.5:
        crop = crop[:, ::-1]
    return crop


def augment_eval(img: np.ndarray, size: int) -> np.ndarray:
    return _resize(img, (size, size))


_PREFETCH_END = object()


def prefetch_one(iterable):
    """One-deep pipelined iteration: item k+1 is computed on a background
    thread while the consumer processes item k — the TPU-host counterpart
    of the reference's DataLoader-worker overlap
    (ethec_experiments.py:351-364). Production of consecutive items stays
    serialized (safe for stateful generators, e.g. samplers drawing from
    one RNG); only production overlaps consumption."""
    from concurrent.futures import ThreadPoolExecutor

    it = iter(iterable)
    ex = ThreadPoolExecutor(max_workers=1)
    try:
        fut = ex.submit(next, it, _PREFETCH_END)
        while True:
            item = fut.result()
            if item is _PREFETCH_END:
                return
            fut = ex.submit(next, it, _PREFETCH_END)
            yield item
    finally:
        ex.shutdown(wait=False)


def augment_joint_train(img: np.ndarray, size: int,
                        rng: np.random.RandomState) -> np.ndarray:
    """resize (S, S) → random hflip — the JOINT trainers' train transform
    (oe_h.py:1463-1467: Resize + RandomHorizontalFlip, no crop, unlike the
    classifier's 512→448-crop pipeline)."""
    out = _resize(img, (size, size))
    if rng.rand() < 0.5:
        out = out[:, ::-1]
    return out


def augment_random_resized_crop(img: np.ndarray, size: int,
                                rng: np.random.RandomState,
                                scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)) -> np.ndarray:
    """torchvision RandomResizedCrop + hflip (the CIFAR/FMNIST train
    transforms, fashion_mnist.py:74-79, finetuner.py:651-657)."""
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        r = np.exp(log_r)
        cw = int(round(np.sqrt(target * r)))
        ch = int(round(np.sqrt(target / r)))
        if 0 < cw <= w and 0 < ch <= h:
            y = rng.randint(0, h - ch + 1)
            x = rng.randint(0, w - cw + 1)
            crop = img[y:y + ch, x:x + cw]
            break
    else:
        s = min(h, w)
        y, x = (h - s) // 2, (w - s) // 2
        crop = img[y:y + s, x:x + s]
    out = _resize(crop, (size, size))
    if rng.rand() < 0.5:
        out = out[:, ::-1]
    return out


class ImagePipeline:
    """Threaded decode+augment over an EncodedDataset; yields NHWC float32
    batches with (level_labels, multihot). Order comes from a caller-supplied
    index sampler (shuffle / weighted resampling)."""

    def __init__(self, dataset, labelmap, image_root: str, *,
                 image_size: int = 448, batch_size: int = 64,
                 train: bool = True, grayscale: bool = False,
                 num_workers: int = 8, prefetch: int = 4,
                 normalize: Optional[Tuple[Sequence[float], Sequence[float]]] = None,
                 augment: str = "ethec", out_dtype: str = "float32"):
        self.ds = dataset
        self.labelmap = labelmap
        self.image_root = image_root
        self.size = image_size
        self.bs = batch_size
        self.train = train
        self.grayscale = grayscale
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.normalize = normalize
        self.augment = augment   # 'ethec' (resize+crop+flip) | 'rrc'
        # 'uint8': skip the host-side /255 — batches stay uint8 for a 4x
        # smaller host->device transfer; trainers scale on device (where
        # XLA fuses the convert into the first conv). Values are identical
        # (u8/255 on device == astype(f32)/255 on host).
        self.out_dtype = out_dtype
        if out_dtype == "uint8" and normalize is not None:
            raise ValueError("uint8 output requires normalize=None "
                             "(mean/std would need float pixels)")
        self._multihot = dataset.multihot(labelmap)
        # native C++ fast path: fused jpeg decode+resize+crop+flip+normalize
        # with its own thread pool (native/le_loader.cc); python/cv2 remains
        # the fallback for non-jpeg inputs, in-memory datasets, 'rrc'
        # augmentation and custom normalization.
        self._native = False
        if (not hasattr(dataset, "images") and augment == "ethec"
                and normalize is None and len(dataset.image_paths) > 0
                and all(p.lower().endswith((".jpg", ".jpeg"))
                        for p in dataset.image_paths)):
            from . import native_loader

            self._native = native_loader.available()
            self._native_loader = native_loader

    def __len__(self):
        return len(self.ds) // self.bs if self.train else -(-len(self.ds) // self.bs)

    def _load_one(self, i: int, seed: int) -> np.ndarray:
        if hasattr(self.ds, "images"):          # in-memory ArrayDataset
            img = self.ds.images[i]
        else:
            img = decode_image(
                os.path.join(self.image_root, self.ds.image_paths[i]),
                self.grayscale)
        if self.train:
            rng = np.random.RandomState(seed)
            if self.augment == "rrc":
                img = augment_random_resized_crop(img, self.size, rng)
            else:
                img = augment_train(img, self.size, rng)
        else:
            img = augment_eval(img, self.size)
        if self.out_dtype == "uint8":
            return img if img.dtype == np.uint8 else \
                np.clip(np.round(img), 0, 255).astype(np.uint8)
        out = img.astype(np.float32) / 255.0
        if self.normalize is not None:
            mean, std = self.normalize
            out = (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
        return out

    def batches(self, order: np.ndarray, seed: int = 0) -> Iterator[dict]:
        """Yield batches following `order` (precomputed index sequence).
        Training drops the ragged tail (DataLoader drop_last parity is off —
        the reference keeps it; we keep full batches for static shapes and
        resample the tail into the next epoch via the sampler)."""
        bs = self.bs
        n_batches = len(order) // bs if self.train else -(-len(order) // bs)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                _produce()
                payload = None            # end-of-epoch sentinel
            except BaseException as exc:
                payload = exc             # delivered instead of hanging the
                #                           consumer on a never-fed get()
            # stop-aware delivery for sentinel AND error alike: the consumer
            # may have abandoned the generator with the queue still full
            while not stop.is_set():
                try:
                    out_q.put(payload, timeout=0.1)
                    break
                except queue.Full:
                    pass

        def _produce():
            with cf.ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idx = order[b * bs:(b + 1) * bs]
                    if self._native:
                        paths = [os.path.join(self.image_root,
                                              self.ds.image_paths[i])
                                 for i in idx]
                        images, status = self._native_loader.load_augment_batch(
                            paths, self.size, pad=64, train=self.train,
                            grayscale=self.grayscale,
                            seed=seed * 1_000_003 + b * bs,
                            out_dtype=np.uint8 if self.out_dtype == "uint8"
                            else np.float32)
                        if (status != 0).any():
                            bad = [paths[j] for j in np.nonzero(status)[0][:3]]
                            raise FileNotFoundError(
                                f"native loader failed on {bad} "
                                f"(codes {status[status != 0][:3]})")
                    else:
                        images = np.stack(list(pool.map(
                            lambda t: self._load_one(t[1],
                                                     seed * 1_000_003 + t[0]),
                            enumerate(idx, start=b * bs))))
                    batch = {
                        "image": images,
                        "level_labels": self.ds.level_labels[idx],
                        "leaf_labels": self.ds.leaf_labels[idx],
                        "multihot": self._multihot[idx],
                        "index": np.asarray(idx),
                    }
                    # stop-aware put: a consumer that abandons the
                    # generator mid-epoch stops draining the bounded
                    # queue — a plain put would block this thread forever
                    while not stop.is_set():
                        try:
                            out_q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            pass

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
