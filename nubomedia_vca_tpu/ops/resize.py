"""Image resize ops.

``resize_linear_exact`` is bit-exact vs ``cv::resize(..., INTER_LINEAR_EXACT)``
— the interpolation OpenCV's cascade pyramid uses — so pyramid levels feed the
cascade the *identical* pixels the reference sees (``kmsfacedetect.cpp:805``
resizes each frame to the working width before detection; detectMultiScale
resizes internally per scale).

Scheme (reverse-engineered and verified bit-exact against OpenCV 4.6):
  source position for output x:  fx = ((2x+1)*src - dst) / (2*dst)
  sx = floor(fx); frac = fx - sx (clamped to 0 when sx < 0)
  Q8 coefficients: c1 = round_half_even(frac * 256), c0 = 256 - c1
  horizontal pass in Q8 int, vertical pass in Q16 int,
  final: (v + 2^15) >> 16  (round half up)

Index/coefficient tables depend only on (src, dst) shapes → computed on host
with numpy and closed over by the jitted gather computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=512)
def _linear_exact_tables(src: int, dst: int):
    x = np.arange(dst)
    fx = ((2 * x + 1) * src - dst) / (2 * dst)
    sx = np.floor(fx).astype(np.int64)
    frac = np.where(sx < 0, 0.0, fx - sx)
    s0 = np.clip(sx, 0, src - 1)
    s1 = np.clip(s0 + 1, 0, src - 1)
    c1 = np.round(frac * 256).astype(np.int32)
    c0 = 256 - c1
    return (s0.astype(np.int32), s1.astype(np.int32), c0, c1)


def resize_linear_exact(img: jnp.ndarray, dsize: tuple[int, int]) -> jnp.ndarray:
    """[..., H, W] uint8 → [..., dh, dw] uint8, bit-exact INTER_LINEAR_EXACT.

    dsize is (width, height), matching cv::resize argument order.
    """
    dw, dh = dsize
    sh, sw = img.shape[-2], img.shape[-1]
    if (sw, sh) == (dw, dh):
        return img
    sx0, sx1, cx0, cx1 = _linear_exact_tables(sw, dw)
    sy0, sy1, cy0, cy1 = _linear_exact_tables(sh, dh)
    im = img.astype(jnp.int32)
    # horizontal: [..., H, dw] in Q8
    h = (jnp.take(im, sx0, axis=-1) * cx0[None, :]
         + jnp.take(im, sx1, axis=-1) * cx1[None, :])
    # vertical: [..., dh, dw] in Q16
    v = (jnp.take(h, sy0, axis=-2) * cy0[:, None]
         + jnp.take(h, sy1, axis=-2) * cy1[:, None])
    out = (v + (1 << 15)) >> 16
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def resize_bilinear(img: jnp.ndarray, dsize: tuple[int, int]) -> jnp.ndarray:
    """Float bilinear resize (half-pixel centers) for non-parity paths
    (overlay scaling, CNN preprocessing). Input any float/int, output float32."""
    dw, dh = dsize
    out_shape = img.shape[:-2] + (dh, dw)
    return jax.image.resize(img.astype(jnp.float32), out_shape, method="linear")
