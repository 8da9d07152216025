"""Frame batch types.

The reference receives one BGR/BGRA frame at a time from GStreamer and
mutates it in place (`kmsfacedetect.cpp:282-306` wraps the mapped buffer as
an IplImage). The TPU-native ingest instead batches frames from many streams
into device arrays: gray (luma) for detection, optional color planes for
overlay rendering.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops.color import bgr_to_gray, bgra_to_gray


@dataclasses.dataclass
class FrameBatch:
    """A batch of same-sized frames.

    gray: [B, H, W] uint8 — the detection channel (luma plane for I420/NV12
          ingest, or converted from BGR).
    color: optional [B, H, W, C] uint8 original frames (for overlay output).
    pts: [B] int64 presentation timestamps in nanoseconds (GStreamer pts).
    stream_ids: [B] int32 — which source stream each frame belongs to, when
          batching across streams.
    """

    gray: jnp.ndarray
    color: jnp.ndarray | None = None
    pts: np.ndarray | None = None
    stream_ids: np.ndarray | None = None

    @property
    def batch(self) -> int:
        return int(self.gray.shape[0])

    @property
    def height(self) -> int:
        return int(self.gray.shape[1])

    @property
    def width(self) -> int:
        return int(self.gray.shape[2])

    @classmethod
    def from_gray(cls, frames, pts=None):
        g = jnp.asarray(frames, dtype=jnp.uint8)
        if g.ndim == 2:
            g = g[None]
        return cls(gray=g, pts=_default_pts(g.shape[0], pts))

    @classmethod
    def from_bgr(cls, frames, pts=None):
        c = jnp.asarray(frames, dtype=jnp.uint8)
        if c.ndim == 3:
            c = c[None]
        conv = bgra_to_gray if c.shape[-1] == 4 else bgr_to_gray
        return cls(gray=conv(c), color=c, pts=_default_pts(c.shape[0], pts))

    @classmethod
    def from_i420(cls, y_planes, pts=None):
        """I420/NV12 ingest: the luma plane is used directly (no colorspace
        math on the hot path)."""
        return cls.from_gray(y_planes, pts)


def _default_pts(b: int, pts):
    if pts is None:
        return np.zeros(b, np.int64)
    return np.asarray(pts, np.int64)
