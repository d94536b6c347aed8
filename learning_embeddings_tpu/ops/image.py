"""On-device image input ops."""

from __future__ import annotations

import jax.numpy as jnp


def device_scale(images):
    """uint8 batches (the low-bandwidth transfer format,
    ImagePipeline(out_dtype='uint8')) scale to [0,1] on device; XLA fuses
    the convert into the first conv. float inputs pass through — the
    dtype check is trace-time, so each path compiles cleanly.

    Uses true division by 255.0 (NOT a reciprocal multiply) so the result
    is bit-identical to the host pipeline's ``astype(float32) / 255.0``.
    """
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images
