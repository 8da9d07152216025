"""Pallas TPU kernel: fused integral + squared-integral images.

One kernel invocation per frame reads the uint8 image from VMEM once and
produces both summed-area tables (int32, wraparound semantics identical to
ops/integral.py). The 2D prefix sum is computed in VMEM with log-step
shift-adds along each axis (Hillis–Steele), so the only HBM traffic is the
image in and the two tables out — replacing XLA's two separate cumsum
pipelines which each round-trip the array.

Also provides `integral_image_matmul`, an MXU formulation (II = L·X·U with
triangular all-ones matrices, exact in f32 via Precision.HIGHEST for the
value ranges of working-resolution images) — useful where the MXU is idle
anyway; benchmarked in tests/bench notes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _log_shift_cumsum(x, axis):
    """Inclusive prefix sum via Hillis–Steele shift-adds (static unroll)."""
    n = x.shape[axis]
    shift = 1
    while shift < n:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (shift, 0)
        shifted = jnp.pad(x, pad)[
            tuple(slice(0, n) if d == axis else slice(None)
                  for d in range(x.ndim))
        ]
        x = x + shifted
        shift *= 2
    return x


def _integral_kernel(img_ref, ii_ref, sq_ref):
    x = img_ref[0].astype(jnp.int32)
    s = _log_shift_cumsum(_log_shift_cumsum(x, 1), 0)
    q = _log_shift_cumsum(_log_shift_cumsum(x * x, 1), 0)
    ii_ref[0] = jnp.pad(s, ((1, 0), (1, 0)))
    sq_ref[0] = jnp.pad(q, ((1, 0), (1, 0)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def integral_images_pallas(img, interpret: bool = False):
    """[B, H, W] uint8 → (ii [B,H+1,W+1] int32, sq [B,H+1,W+1] int32)."""
    B, H, W = img.shape
    out_shape = (
        jax.ShapeDtypeStruct((B, H + 1, W + 1), jnp.int32),
        jax.ShapeDtypeStruct((B, H + 1, W + 1), jnp.int32),
    )
    return pl.pallas_call(
        _integral_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, H + 1, W + 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H + 1, W + 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(img)


# --------------------------------------------------------- MXU formulation
@functools.lru_cache(maxsize=32)
def _tri_ones(n: int):
    return np.tril(np.ones((n, n), np.float32))


def integral_image_matmul(img):
    """[B,H,W] uint8 → [B,H+1,W+1] int32 via two MXU matmuls:
    II[1:,1:] = L @ X @ L^T with L lower-triangular ones. Exact for images
    whose total sum < 2^24 (true at working resolutions)."""
    B, H, W = img.shape
    x = img.astype(jnp.float32)
    L = jnp.asarray(_tri_ones(H))
    U = jnp.asarray(_tri_ones(W)).T
    hi = jax.lax.Precision.HIGHEST
    s = jnp.einsum("hk,bkw,wj->bhj", L, x, U, precision=hi)
    s = jnp.pad(s, [(0, 0), (1, 0), (1, 0)])
    return s.astype(jnp.int32)
