"""Histogram equalization, bit-exact vs ``cv::equalizeHist``.

The reference preprocess chain runs ``equalizeHist`` before every cascade
pass (``kmsfacedetect.cpp:807``, ``kmseyedetect.cpp:949-964``). OpenCV's
algorithm: build a 256-bin histogram, find the first non-empty bin i0,
scale = 255 / (total - hist[i0]), lut[i] = cvRound(cumsum(i0+1..i) * scale)
(round-half-to-even), lut[i0] = 0; if the image is constant it is returned
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def equalize_hist(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] uint8 → uint8, per-image equalization over the last 2 dims."""
    x = img.astype(jnp.int32)
    batch_shape = x.shape[:-2]
    H, W = x.shape[-2:]
    flat = x.reshape((-1, H * W))

    def one(v):
        hist = jnp.zeros((256,), jnp.int32).at[v].add(1)
        total = v.shape[0]
        nonzero = hist > 0
        i0 = jnp.argmax(nonzero)  # first non-empty bin
        h0 = hist[i0]
        scale = 255.0 / jnp.maximum(total - h0, 1).astype(jnp.float32)
        csum = jnp.cumsum(hist)
        # cumulative sum excluding bins <= i0
        sums = csum - csum[i0]
        lut = jnp.round(sums.astype(jnp.float32) * scale)
        lut = jnp.clip(lut, 0, 255).astype(jnp.uint8)
        lut = lut.at[i0].set(0)
        out = lut[v]
        return jnp.where(h0 == total, v.astype(jnp.uint8), out)

    out = jax.vmap(one)(flat)
    return out.reshape(batch_shape + (H, W))
