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

    # scatter-add histogram: measured fastest on TPU in the fused pipeline
    # (a chunked compare-reduce variant was 1000x slower end-to-end)
    hist = jnp.zeros((flat.shape[0], 256), jnp.int32).at[
        jnp.arange(flat.shape[0])[:, None], flat].add(1)

    total = H * W
    i0 = jnp.argmax(hist > 0, axis=1)              # first non-empty bin
    h0 = jnp.take_along_axis(hist, i0[:, None], axis=1)[:, 0]
    scale = 255.0 / jnp.maximum(total - h0, 1).astype(jnp.float32)
    csum = jnp.cumsum(hist, axis=1)
    c0 = jnp.take_along_axis(csum, i0[:, None], axis=1)
    sums = csum - c0
    lut = jnp.clip(jnp.round(sums.astype(jnp.float32) * scale[:, None]),
                   0, 255).astype(jnp.uint8)
    lut = jnp.where(jnp.arange(256)[None, :] == i0[:, None],
                    jnp.uint8(0), lut)
    out = jnp.take_along_axis(lut, flat, axis=1)
    out = jnp.where((h0 == total)[:, None], flat.astype(jnp.uint8), out)
    return out.reshape(batch_shape + (H, W))
