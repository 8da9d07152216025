"""Colorspace conversions (exact OpenCV uint8 semantics where it matters).

The reference elements receive BGR/BGRA frames from GStreamer and call
``cvtColor(..., CV_BGR2GRAY)`` per frame (``kmsfacedetect.cpp:806``,
``gstnubotracker.cpp:356``). Here conversion is a batched device op; for
planar YUV ingest (I420/NV12) the luma plane is used directly — the
TPU-native fast path that skips colorspace math entirely.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV bit-exact BGR→gray coefficients (Q15: 9798R + 19235G + 3735B).
_R, _G, _B, _SHIFT = 9798, 19235, 3735, 15


def bgr_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] uint8 BGR → [..., H, W] uint8 gray, bit-exact vs OpenCV.

    y = (R*9798 + G*19235 + B*3735 + 2^14) >> 15   (bit-exact COLOR_BGR2GRAY)
    """
    x = img.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = (r * _R + g * _G + b * _B + (1 << (_SHIFT - 1))) >> _SHIFT
    return y.astype(jnp.uint8)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    x = img.astype(jnp.int32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = (r * _R + g * _G + b * _B + (1 << (_SHIFT - 1))) >> _SHIFT
    return y.astype(jnp.uint8)


def bgra_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 4] BGRA → gray (alpha ignored; matches CV_BGRA2GRAY)."""
    return bgr_to_gray(img[..., :3])


def i420_luma(y_plane: jnp.ndarray) -> jnp.ndarray:
    """I420/NV12 luma plane is already the gray channel — identity view."""
    return y_plane


def yuv420_to_bgr(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """BT.601 full-range YUV420 planes → uint8 BGR (for overlay/export paths).

    y: [..., H, W]; u, v: [..., H/2, W/2]. Chroma is nearest-upsampled.
    """
    u2 = jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1).astype(jnp.float32) - 128.0
    v2 = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1).astype(jnp.float32) - 128.0
    yf = y.astype(jnp.float32)
    r = yf + 1.402 * v2
    g = yf - 0.344136 * u2 - 0.714136 * v2
    b = yf + 1.772 * u2
    bgr = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.round(bgr), 0, 255).astype(jnp.uint8)
