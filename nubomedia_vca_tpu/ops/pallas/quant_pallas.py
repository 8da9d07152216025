"""Pallas TPU kernel: dynamic int8 quantization (one VMEM pass).

Computes the per-tensor abs-max scale AND the rounded int8 values in a
single kernel invocation — the input is read from VMEM once, instead of
XLA's two passes (reduce for the scale, then scale+round). Used by the
int8 serving variant of the learned detector (models/quant.py) to quantize
activations between layers.

Rounding is round-to-nearest-even (matches jnp.rint, so the Pallas and
XLA quantization paths produce identical int8 tensors — tested). An
optional stochastic-rounding mode (pltpu.stochastic_round) is provided for
quantization-aware fine-tuning, where unbiased rounding matters more than
determinism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_kernel(x_ref, values_ref, scale_ref):
    x = x_ref[:]
    abs_max = jnp.max(jnp.abs(x))
    scale = jnp.maximum(abs_max, 1e-8) / 127.0
    scale_ref[0, 0] = scale
    scaled = x / scale
    values_ref[:] = jnp.clip(jnp.rint(scaled), -127, 127).astype(jnp.int8)


def _quant_kernel_stochastic(x_ref, seed_ref, values_ref, scale_ref):
    pltpu.prng_seed(seed_ref[0])
    x = x_ref[:]
    abs_max = jnp.max(jnp.abs(x))
    scale = jnp.maximum(abs_max, 1e-8) / 127.0
    scale_ref[0, 0] = scale
    scaled = jnp.clip(x / scale, -127.0, 127.0)
    # unbiased stochastic rounding: floor(x + U[0,1)). pltpu.stochastic_round
    # only targets bf16/fp8, so build U from the top 24 PRNG bits (int32
    # path — Mosaic has no u32→f32 cast).
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.int32)
    u = ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
    values_ref[:] = jnp.clip(jnp.floor(scaled + u), -127, 127
                             ).astype(jnp.int8)


_LANES = 1024


def _as_lanes(x):
    """Flatten to [rows, 1024] (zero-padded): a narrow trailing dim would
    be lane-padded to 128 per element by Mosaic (a [N,1] f32 block costs
    N*128*4 bytes of VMEM — measured 157 MB for a 307k-element tensor)."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % _LANES
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, _LANES), n


# single-block kernel ceiling: the f32 input + int8 output + temps live on
# Mosaic's 16M VMEM stack (a [4800,1024] input OOMed at 18.61M); larger
# tensors take the XLA path (same int8 values, two fused passes)
_MAX_ELEMS = 1_500_000


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int8_pallas(x, interpret: bool | None = None):
    """x (any shape) f32 → (values int8 same shape, scale f32 scalar).

    Per-tensor symmetric quantization; one VMEM read of x. Zero padding
    cannot raise the abs-max (|0| <= any |v|), so the scale is exact."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if x.size > _MAX_ELEMS:
        return quantize_int8_xla(x)
    x2, n = _as_lanes(x)
    values, scale = pl.pallas_call(
        _quant_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, jnp.int8),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(x2)
    return values.reshape(-1)[:n].reshape(x.shape), scale[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int8_stochastic_pallas(x, seed, interpret: bool | None = None):
    """Stochastic-rounding variant (for quantization-aware fine-tuning).
    TPU-only (pltpu PRNG has no interpret-mode implementation for all
    targets); falls back to deterministic rounding off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret or x.size > _MAX_ELEMS:
        return quantize_int8_pallas(x, interpret=interpret)
    x2, n = _as_lanes(x)
    seed_arr = jnp.asarray([seed], jnp.int32)
    values, scale = pl.pallas_call(
        _quant_kernel_stochastic,
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, jnp.int8),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=False,
    )(x2, seed_arr)
    return values.reshape(-1)[:n].reshape(x.shape), scale[0, 0]


def quantize_int8_xla(x):
    """Reference XLA implementation (identical results to the Pallas
    deterministic kernel; used off-TPU and in parity tests)."""
    abs_max = jnp.max(jnp.abs(x))
    scale = jnp.maximum(abs_max, 1e-8) / 127.0
    values = jnp.clip(jnp.rint(x / scale), -127, 127).astype(jnp.int8)
    return values, scale
