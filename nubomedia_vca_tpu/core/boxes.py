"""Fixed-capacity box sets — the static-shape replacement for the
reference's ``vector<Rect>`` (JAX needs static shapes; SURVEY.md §7).

A box set is a pair (boxes [..., N, 4] int32 x,y,w,h, valid [..., N] bool).
Helpers here are jittable and shape-preserving.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def centers(boxes):
    """[..., N, 4] → [..., N, 2] (cx, cy) integer centers (x + w/2)."""
    return jnp.stack(
        [boxes[..., 0] + boxes[..., 2] // 2, boxes[..., 1] + boxes[..., 3] // 2],
        axis=-1,
    )


def areas(boxes):
    return boxes[..., 2] * boxes[..., 3]


def iou(a, b) -> float:
    """Scalar IoU of two (x, y, w, h) boxes — host-side python floats.
    The single shared implementation for eval/merge helpers (the device
    path uses iou_matrix below)."""
    ax0, ay0, ax1, ay1 = a[0], a[1], a[0] + a[2], a[1] + a[3]
    bx0, by0, bx1, by1 = b[0], b[1], b[0] + b[2], b[1] + b[3]
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    return inter / max(a[2] * a[3] + b[2] * b[3] - inter, 1e-9)


def iou_matrix(a, b):
    """a [N,4], b [M,4] → [N,M] IoU (float32)."""
    ax1, ay1 = a[:, 0], a[:, 1]
    ax2, ay2 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx1, by1 = b[:, 0], b[:, 1]
    bx2, by2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    iw = jnp.maximum(
        0, jnp.minimum(ax2[:, None], bx2[None, :])
        - jnp.maximum(ax1[:, None], bx1[None, :]))
    ih = jnp.maximum(
        0, jnp.minimum(ay2[:, None], by2[None, :])
        - jnp.maximum(ay1[:, None], by1[None, :]))
    inter = (iw * ih).astype(jnp.float32)
    union = (areas(a)[:, None] + areas(b)[None, :]).astype(jnp.float32) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)


def scale_boxes(boxes, scale):
    """Scale x,y,w,h by a float factor with cvRound (half-even) rounding —
    the reference normalizes detections back to original pixels this way
    (kmsfacedetect.cpp:190,208-211)."""
    return jnp.rint(boxes.astype(jnp.float32) * scale).astype(jnp.int32)


def contains(outer, inner):
    """outer [N,4], inner [M,4] → [N,M] bool: inner fully inside outer."""
    ox1, oy1 = outer[:, 0], outer[:, 1]
    ox2, oy2 = outer[:, 0] + outer[:, 2], outer[:, 1] + outer[:, 3]
    ix1, iy1 = inner[:, 0], inner[:, 1]
    ix2, iy2 = inner[:, 0] + inner[:, 2], inner[:, 1] + inner[:, 3]
    return ((ix1[None, :] >= ox1[:, None]) & (iy1[None, :] >= oy1[:, None])
            & (ix2[None, :] <= ox2[:, None]) & (iy2[None, :] <= oy2[:, None]))


def pad_boxes(arr, capacity: int):
    """Host helper: [n,4] → ([capacity,4] int32, [capacity] bool)."""
    arr = np.asarray(arr, np.int32).reshape(-1, 4)
    n = min(len(arr), capacity)
    out = np.zeros((capacity, 4), np.int32)
    val = np.zeros(capacity, bool)
    out[:n] = arr[:n]
    val[:n] = True
    return out, val
