"""minNeighbors rectangle grouping — exact cv::groupRectangles semantics.

detectMultiScale's final step (and therefore the reference detectors' final
step) clusters raw candidate windows into detections: rectangles are
partitioned into similarity classes (union-find transitive closure of the
SimilarRects predicate), each class is averaged, classes with ≤ groupThreshold
members are dropped, and small classes nested inside stronger ones are
suppressed.

Two implementations:
  * ``group_rectangles_np`` — host numpy, bit-exact vs OpenCV (tested against
    the C++ golden tool). Used by the filter layer after device detection.
  * ``group_rectangles_jax`` — fixed-capacity jittable version for fully
    on-device pipelines (identical math; O(N²) vectorized union-find via
    iterated min-label propagation).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _similar_matrix(rects: np.ndarray, eps: float) -> np.ndarray:
    """[N,4] x,y,w,h → [N,N] bool SimilarRects predicate matrix."""
    x, y, w, h = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    delta = eps * (np.minimum(w[:, None], w[None, :])
                   + np.minimum(h[:, None], h[None, :])) * 0.5
    return (
        (np.abs(x[:, None] - x[None, :]) <= delta)
        & (np.abs(y[:, None] - y[None, :]) <= delta)
        & (np.abs((x + w)[:, None] - (x + w)[None, :]) <= delta)
        & (np.abs((y + h)[:, None] - (y + h)[None, :]) <= delta)
    )


def group_rectangles_np(
    rects: np.ndarray, group_threshold: int, eps: float = 0.2,
    return_weights: bool = False,
):
    """Exact cv::groupRectangles. rects [N,4] int → grouped [M,4] int32."""
    rects = np.asarray(rects, dtype=np.int64).reshape(-1, 4)
    n = len(rects)
    if n == 0:
        out = np.zeros((0, 4), np.int32)
        return (out, np.zeros(0, np.int32)) if return_weights else out

    sim = _similar_matrix(rects, eps)
    # union-find transitive closure
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in np.nonzero(sim[i])[0]:
            if j <= i:
                continue
            ri, rj = find(i), find(int(j))
            if ri != rj:
                parent[rj] = ri

    labels = np.array([find(i) for i in range(n)])
    classes = np.unique(labels)
    sums = np.zeros((len(classes), 4), np.int64)
    counts = np.zeros(len(classes), np.int64)
    for ci, c in enumerate(classes):
        members = rects[labels == c]
        sums[ci] = members.sum(0)
        counts[ci] = len(members)

    # average with cvRound (half-to-even)
    avg = np.rint(sums / counts[:, None]).astype(np.int64)

    # drop weak classes, then suppress small-inside-large
    keep = []
    for i in range(len(classes)):
        n1 = counts[i]
        if n1 <= group_threshold:
            continue
        r1 = avg[i]
        inside = False
        for j in range(len(classes)):
            n2 = counts[j]
            if j == i or n2 <= group_threshold:
                continue
            r2 = avg[j]
            dx = int(np.rint(r2[2] * eps))
            dy = int(np.rint(r2[3] * eps))
            if (
                r1[0] >= r2[0] - dx
                and r1[1] >= r2[1] - dy
                and r1[0] + r1[2] <= r2[0] + r2[2] + dx
                and r1[1] + r1[3] <= r2[1] + r2[3] + dy
                and (n2 > max(3, n1) or n1 < 3)
            ):
                inside = True
                break
        if not inside:
            keep.append(i)

    out = avg[keep].astype(np.int32)
    if return_weights:
        return out, counts[keep].astype(np.int32)
    return out


def group_rectangles_jax(
    rects: jnp.ndarray, valid: jnp.ndarray, group_threshold: int, eps: float = 0.2,
):
    """Jittable fixed-capacity grouping.

    rects: [N, 4] int32 (padded), valid: [N] bool.
    Returns (avg_rects [N,4] int32, out_valid [N] bool, weights [N] int32):
    one output slot per similarity class (at the position of its smallest
    member index); padding slots invalid. Same math as the numpy version.
    """
    rects = rects.astype(jnp.int32)
    n = rects.shape[0]
    x, y, w, h = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    delta = eps * (jnp.minimum(w[:, None], w[None, :])
                   + jnp.minimum(h[:, None], h[None, :])).astype(jnp.float32) * 0.5
    sim = (
        (jnp.abs(x[:, None] - x[None, :]) <= delta)
        & (jnp.abs(y[:, None] - y[None, :]) <= delta)
        & (jnp.abs((x + w)[:, None] - (x + w)[None, :]) <= delta)
        & (jnp.abs((y + h)[:, None] - (y + h)[None, :]) <= delta)
        & valid[:, None] & valid[None, :]
    )

    # exact transitive closure by repeated boolean matrix squaring:
    # after k squarings sim covers all paths of length <= 2^k, so
    # ceil(log2 n) squarings guarantee convergence for ANY component shape
    # (the bit-parity requirement vs the host union-find). The 0/1 matmul
    # only feeds a >0 test, so default (bf16) MXU precision is safe.
    n_rounds = max(1, int(np.ceil(np.log2(max(n, 2)))))

    def body(_, s):
        return jnp.minimum(s + s @ s, 1.0)

    simf = jax.lax.fori_loop(0, n_rounds, body, sim.astype(jnp.float32))
    closed = simf > 0.0
    # class label = smallest connected member index (first True per row)
    labels = jnp.where(valid, jnp.argmax(closed, axis=1).astype(jnp.int32),
                       jnp.int32(n))

    onehot = (labels[:, None] == jnp.arange(n)[None, :]) & valid[:, None]  # [i, class]
    counts = jnp.sum(onehot, axis=0).astype(jnp.int32)          # [class]
    sums = jnp.einsum("ic,ij->cj", onehot.astype(jnp.int32), rects)
    avg = jnp.where(
        counts[:, None] > 0,
        jnp.rint(sums.astype(jnp.float32) / jnp.maximum(counts[:, None], 1)
                 ).astype(jnp.int32),
        0,
    )

    strong = counts > group_threshold
    # small-inside-large suppression
    ax, ay, aw, ah = avg[:, 0], avg[:, 1], avg[:, 2], avg[:, 3]
    dx = jnp.rint(aw * eps).astype(jnp.int32)
    dy = jnp.rint(ah * eps).astype(jnp.int32)
    inside = (
        (ax[:, None] >= (ax - dx)[None, :])
        & (ay[:, None] >= (ay - dy)[None, :])
        & ((ax + aw)[:, None] <= (ax + aw + dx)[None, :])
        & ((ay + ah)[:, None] <= (ay + ah + dy)[None, :])
        & (jnp.arange(n)[:, None] != jnp.arange(n)[None, :])
        & strong[None, :]
        & ((counts[None, :] > jnp.maximum(3, counts[:, None]))
           | (counts[:, None] < 3))
    )
    suppressed = jnp.any(inside, axis=1)
    out_valid = strong & ~suppressed
    return avg, out_valid, counts
