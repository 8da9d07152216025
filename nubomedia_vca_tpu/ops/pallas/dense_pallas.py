"""Pallas TPU kernel: fused integral + dense cascade phase for one level.

The cascade engine's dense phase (cascade/engine.py `_eval_level`) evaluates
the first few stages for EVERY window position. The XLA path materializes
the integral and squared-integral tables in HBM and re-reads them for each
corner slice; this kernel instead keeps one VMEM residency per frame:

    uint8 level image → (in VMEM) integral, squared integral,
    variance normalization, unrolled dense weak/stage evaluation
    → writes ii (needed later for the survivor patch gather), the
      normalization factors and the alive mask.

The squared-integral table never touches HBM (it is only used densely),
and every dense corner read is a VMEM-local shifted slice. Numeric
semantics are identical to the engine's XLA dense phase (same int32
wraparound + f32 accumulation order), so window-exact OpenCV parity is
preserved; enforced by tests/test_pallas_ops.py in interpret mode and on
TPU by the engine parity suite with the kernel enabled.

Dense evaluation runs at ystep=1 density (all `gy×gx` positions); the
engine subsamples `[::ystep]` outside — on the VPU the extra positions are
cheaper than strided reads. Tilted features in the dense block are not
supported (the 45° table needs a sequential row recurrence); the engine
gates on `_dense_uses_tilt`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .integral_pallas import _log_shift_cumsum


def _corner_sum(tab, corners, gy, gx):
    """Signed 4-corner sum over a [gy, gx] grid of window origins (int32,
    exact/wraparound — same as CascadeEngine._dense_rect_sum at step 1)."""
    acc = None
    for (dy, dx, s) in corners:
        v = jax.lax.slice(tab, (dy, dx), (dy + gy, dx + gx))
        if acc is None:
            acc = v if s > 0 else -v
        else:
            acc = acc + v if s > 0 else acc - v
    return acc


def build_dense_phase(engine, sh: int, sw: int):
    """One fused kernel for a `sh×sw` level of `engine`'s cascade.

    Returns fn: img [B, sh, sw] uint8 →
        (ii [B, sh+1, sw+1] i32, vnf [B, gy, gx] f32, alive [B, gy, gx] i8)
    with gy/gx the full-density window grid (ystep applied by the caller).
    """
    c = engine.cascade
    w0, h0 = c.window_w, c.window_h
    gy, gx = sh - h0 + 1, sw - w0 + 1
    if gy <= 0 or gx <= 0:
        raise ValueError("level smaller than cascade window")
    d = engine._dense
    feat_rects = engine._feat_rects
    norm_corners = engine._norm_corners
    norm_area = float(engine._norm_area)
    n_dense = engine.n_dense_stages
    if engine._dense_uses_tilt:
        raise ValueError("dense block uses tilted features")

    def feature(ii, fid):
        val = None
        for table, corners, wgt in feat_rects[fid]:
            assert table == "sum"
            rs = _corner_sum(ii, corners, gy, gx).astype(jnp.float32)
            term = rs * jnp.float32(wgt)
            val = term if val is None else val + term
        return val

    def kernel(img_ref, ii_ref, vnf_ref, alive_ref):
        x = img_ref[0].astype(jnp.int32)
        ii = jnp.pad(_log_shift_cumsum(_log_shift_cumsum(x, 1), 0),
                     ((1, 0), (1, 0)))
        sq = jnp.pad(_log_shift_cumsum(_log_shift_cumsum(x * x, 1), 0),
                     ((1, 0), (1, 0)))
        ii_ref[0] = ii

        valsum = _corner_sum(ii, norm_corners, gy, gx)
        sqv = _corner_sum(sq, norm_corners, gy, gx)
        # the true window sq-sum is < 255^2*(nw*nh) << 2^31, so the int32
        # wraparound 4-corner sum is already the exact non-negative value;
        # no uint32 view needed (Mosaic lacks a uint32→f32 cast). Value-
        # identical to the engine's bitcast-u32 path.
        vf = valsum.astype(jnp.float32)
        nf = norm_area * sqv.astype(jnp.float32) - vf * vf
        win_valid = nf > 100.0 * norm_area * norm_area
        vnf = jnp.where(win_valid,
                        1.0 / jnp.sqrt(jnp.maximum(nf, 1e-20)), 1.0)
        vnf_ref[0] = vnf

        alive = win_valid
        widx, n_d = 0, len(d["feat0"])
        for s_idx in range(n_dense):
            ssum = jnp.zeros_like(vnf)
            while widx < n_d and d["stage"][widx] == s_idx:
                f0 = feature(ii, int(d["feat0"][widx])) * vnf
                fL = feature(ii, int(d["featL"][widx])) * vnf
                fR = feature(ii, int(d["featR"][widx])) * vnf
                lv = jnp.where(fL < d["thrL"][widx],
                               d["leavesL"][widx][0], d["leavesL"][widx][1])
                rv = jnp.where(fR < d["thrR"][widx],
                               d["leavesR"][widx][0], d["leavesR"][widx][1])
                ssum = ssum + jnp.where(f0 < d["thr0"][widx], lv, rv)
                widx += 1
            alive = alive & (ssum >= d["stage_thr"][s_idx])
        alive_ref[0] = alive.astype(jnp.int8)

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def dense_phase(img, interpret: bool | None = None):
        if interpret is None:
            # off-TPU backends run the kernel in interpret mode (tests)
            interpret = jax.default_backend() != "tpu"
        B = img.shape[0]
        out_shape = (
            jax.ShapeDtypeStruct((B, sh + 1, sw + 1), jnp.int32),
            jax.ShapeDtypeStruct((B, gy, gx), jnp.float32),
            jax.ShapeDtypeStruct((B, gy, gx), jnp.int8),
        )
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, sh, sw), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=tuple(
                pl.BlockSpec((1,) + s.shape[1:], lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
                for s in out_shape),
            out_shape=out_shape,
            interpret=interpret,
        )(img)

    return dense_phase
