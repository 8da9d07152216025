"""Integral images (summed-area tables) — the cascade engine's substrate.

Replaces the integral computation OpenCV does inside ``detectMultiScale``
(reference hot loop: ``kmsfacedetect.cpp:809-811``).  Three tables, shaped
[H+1, W+1] with a zero top row/left column, exactly like ``cv::integral``:

  * ``integral_image``      — plain sums (int32)
  * ``sq_integral_image``   — sums of squares (int32, *wrapping*: the absolute
    values overflow for large frames, but OpenCV's variance normalization only
    ever takes 4-corner differences over an 18×18 window, and int32 wraparound
    arithmetic makes those local differences exact — a TPU-friendly substitute
    for OpenCV's float64 table)
  * ``tilted_integral_image`` — 45°-rotated sums (RSAT) for tilted Haar
    features (eye/smile cascades)

All functions are jittable and batched over a leading batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def integral_image(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] uint8/int32 → [..., H+1, W+1] int32 summed-area table."""
    x = img.astype(jnp.int32)
    s = jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)
    return jnp.pad(s, [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)])


def sq_integral_image(img: jnp.ndarray) -> jnp.ndarray:
    """Integral of squared pixels, int32 with wraparound (see module docs)."""
    x = img.astype(jnp.int32)
    s = jnp.cumsum(jnp.cumsum(x * x, axis=-1), axis=-2)
    return jnp.pad(s, [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)])


def _shift_cols(a: jnp.ndarray, s: int) -> jnp.ndarray:
    """Shift the last axis by s (positive → right), zero-filling."""
    if s == 0:
        return a
    n = a.shape[-1]
    pads = [(0, 0)] * (a.ndim - 1)
    if s > 0:
        return jnp.pad(a, pads + [(s, 0)])[..., :n]
    return jnp.pad(a, pads + [(0, -s)])[..., -s:]


def _skew_rows(a: jnp.ndarray, sign: int, shift=_shift_cols) -> jnp.ndarray:
    """Per-row column shift by the row index: out[y, k] = a[y, k - sign*y]
    (zero-filled), via log-step masked shifts — fully parallel on the VPU,
    usable both under jit and inside Pallas kernels (2D input)."""
    H = a.shape[-2]
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape[-2:], 0)
    b = 0
    while (1 << b) < H:
        s = 1 << b
        shifted = shift(a, sign * s)
        a = jnp.where((rows >> b) & 1 == 1, shifted, a)
        b += 1
    return a


def tilted_2d(x: jnp.ndarray, cumsum=jnp.cumsum,
              shift=_shift_cols) -> jnp.ndarray:
    """RSAT of one int32 image [H, W] → [H+1, W+1] with NO sequential
    recurrence: two skewed column prefix sums.

    With the clip-free padding P=H (columns of zeros each side, width
    Wp=W+2P) and C the exclusive row cumsum, the OpenCV tilted table is

        T(y, x) = Σ_{yy<y} C[yy, x+y-yy-1] − C[yy, x−y+yy]

    Skewing C's rows by ±row-index turns both diagonal accumulations into
    plain column prefix sums, read back by unskewing — every step a
    vectorized shift/select, so the whole table is O(log H) full-array ops
    instead of the classic O(H)-step row recurrence. int32 wraparound
    addition is associative, so the result is bit-identical to the
    recurrence (and to cv::integral).

    `cumsum(a, axis)` (inclusive) and `shift(a, s)` (zero-filled column
    shift) are injectable so the Pallas kernel can substitute VMEM-local
    log-shift scans and `pltpu.roll`-based shifts (Mosaic rejects sublane
    concats on the offset layouts the skew slices produce).
    """
    H, W = x.shape
    if H == 0:
        return jnp.zeros((1, W + 1), jnp.int32)
    P = H
    Wp = W + 2 * P
    W1 = Wp + H + 1
    xp = jnp.pad(x, ((0, 0), (P, P)))
    # exclusive row cumsum, widened to W1 for the skews
    C = jnp.pad(cumsum(xp, 1), ((0, 0), (1, W1 - Wp - 1)))

    def col_excl(a):   # [H, K] → [H+1, K]: sum of rows < y
        return jnp.pad(cumsum(a, 0), ((1, 0), (0, 0)))

    # T1[y, x] = Σ_{yy<y} C[yy, x+y-yy-1]
    S1 = col_excl(_skew_rows(C, +1, shift))     # S1[y,k] = Σ C[yy, k-yy]
    T1 = shift(_skew_rows(S1, -1, shift), 1)    # [y, x] → S1[y, x+y-1]
    # T2[y, x] = Σ_{yy<y} C[yy, x-y+yy]  (coords offset +H to stay ≥ 0)
    S2 = col_excl(_skew_rows(shift(C, H), -1, shift))
    T2 = _skew_rows(S2, +1, shift)[:, H:]       # [y, x] → S2[y, x-y+H]
    T = T1[:, :Wp + 1] - T2[:, :Wp + 1]
    return T[:, P:P + W + 1]


def tilted_integral_image(img: jnp.ndarray) -> jnp.ndarray:
    """45°-rotated summed-area table, matching ``cv::integral``'s third
    output (see `tilted_2d` for the parallel skewed-prefix-sum scheme;
    bit-identical to the classic RSAT recurrence)."""
    x = img.astype(jnp.int32)
    batch_shape = x.shape[:-2]
    H, W = x.shape[-2], x.shape[-1]
    out = jax.vmap(tilted_2d)(x.reshape((-1, H, W)))
    return out.reshape(batch_shape + (H + 1, W + 1))


def tilted_integral_image_scan(img: jnp.ndarray) -> jnp.ndarray:
    """Classic sequential RSAT row recurrence (kept as the parity witness
    for `tilted_integral_image`; O(H) scan steps):

        R(y, x) = R(y-1, x-1) + R(y-1, x+1) - R(y-2, x) + I(y-1, x-1) + I(y-2, x-1)

    The recurrence is only valid where the 45° triangle does not clip the
    image's left/right edge, so the image is zero-padded by H columns on each
    side (padding contributes nothing to sums) and the middle is sliced out.
    """
    x = img.astype(jnp.int32)
    batch_shape = x.shape[:-2]
    H, W = x.shape[-2], x.shape[-1]
    if H == 0:
        return jnp.zeros(batch_shape + (1, W + 1), jnp.int32)
    P = H  # pad so triangles never clip
    Wp = W + 2 * P
    xf = x.reshape((-1, H, W))
    xp = jnp.pad(xf, [(0, 0), (0, 0), (P, P)])

    def one(im):
        zero = jnp.zeros((Wp + 1,), jnp.int32)
        # pixel row i aligned so column x of a T row sees im[i, x-1]
        prow = jnp.pad(im, [(0, 0), (1, 0)])

        def body(carry, i):
            r1, r2, p1 = carry  # T rows y-1, y-2; aligned pixel row y-2
            p0 = prow[i - 1]
            shifted_r = jnp.concatenate([r1[-1:] * 0, r1[:-1]])  # r1[x-1]
            shifted_l = jnp.concatenate([r1[1:], r1[:1] * 0])    # r1[x+1]
            newr = shifted_r + shifted_l - r2 + p0 + p1
            return (newr, r1, p0), newr

        init = (zero, zero, zero)
        _, rows = jax.lax.scan(body, init, jnp.arange(1, H + 1))
        return jnp.concatenate([zero[None], rows], axis=0)

    out = jax.vmap(one)(xp)[:, :, P:P + W + 1]
    return out.reshape(batch_shape + (H + 1, W + 1))


# ---------------------------------------------------------------------------
# numpy twins (loader-side precompute & tests)
# ---------------------------------------------------------------------------

def integral_np(img: np.ndarray) -> np.ndarray:
    s = np.cumsum(np.cumsum(img.astype(np.int64), -1), -2)
    return np.pad(s, [(1, 0), (1, 0)])


def tilted_integral_np(img: np.ndarray) -> np.ndarray:
    """Definition-form tilted integral (slow; tests only).

    T(y, x) = Σ img[y', x'] over y' < y, |x' - (x-1)| <= y - y' - 1
    (matches cv::integral's tilted output exactly).
    """
    H, W = img.shape
    im = img.astype(np.int64)
    T = np.zeros((H + 1, W + 1), np.int64)
    cols = np.arange(W)
    for y in range(1, H + 1):
        acc = 0
        rowsum = np.zeros(W + 1, np.int64)
        for yy in range(y):
            r = y - yy - 1
            for x in range(W + 1):
                lo = max(0, (x - 1) - r)
                hi = min(W - 1, (x - 1) + r)
                if hi >= lo:
                    rowsum[x] += im[yy, lo:hi + 1].sum()
        T[y] = rowsum
    return T
