"""Motion tracker — TPU rebuild of NuboTracker (gstnubotracker.cpp).

Reference per-frame pipeline (gstnubotracker.cpp:339-421): gray convert,
absdiff vs previous frame, binary threshold (default 20), motion-history
update (MHI_DURATION 0.2), motion gradient, segmentMotion into blob rects,
area filter (min 50 / max 30000) + distance merge (35 px) of blobs, draw +
rate-limited "tracker-event" signal.

TPU design: the whole recurrence is a jittable per-frame step with carried
state (previous gray frame + MHI), composable into `lax.scan` over frame
windows (SURVEY.md §2.5). Segmentation (OpenCV's floodfill-based
cvSegmentMotion) becomes seeded connected-components by iterative min-label
propagation: pixels are 4-connected when their MHI timestamps differ by at
most seg_thresh, and a component is reported iff it contains a
current-timestamp (seed) pixel — equivalent to flood-filling from every
seed in scan order. Blob bounding boxes come from scatter-min/max over
component roots; the final area-filter + distance-merge runs on host with
the reference's exact iteration-order semantics (__join_objects,
gstnubotracker.cpp:171-200).

Note on units: the reference passes CPU-clock milliseconds as timestamps
while keeping OpenCV-sample constants (0.2 "seconds"), which collapses the
MHI to the current silhouette. We use real pts seconds by default; parity
tests drive both implementations with identical units.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class TrackerConfig:
    """Knobs mirror the GObject properties (gstnubotracker.cpp:22-33)."""

    threshold: int = 20         # binary diff threshold
    min_area: int = 50
    max_area: int = 30000
    distance: int = 35          # blob merge distance
    visual_mode: int = 0
    activate_events: int = 0    # "server events"
    events_ms: int = 30001
    mhi_duration: float = 0.2
    seg_thresh: float = 0.05
    max_blobs: int = 32         # fixed device capacity for segmentation


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrackerState:
    prev_gray: jnp.ndarray   # [H, W] uint8
    mhi: jnp.ndarray         # [H, W] float32
    initialized: jnp.ndarray  # [] bool


def init_state(h: int, w: int) -> TrackerState:
    return TrackerState(
        prev_gray=jnp.zeros((h, w), jnp.uint8),
        mhi=jnp.zeros((h, w), jnp.float32),
        initialized=jnp.zeros((), bool),
    )


def _segment(mhi, ts, seg_thresh, max_blobs):
    """Seeded connected components over the 4-neighbor |Δmhi| <= seg_thresh
    graph. Returns (rects [K,4] int32 x,y,w,h, valid [K] bool)."""
    H, W = mhi.shape
    flat_idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    labels = flat_idx

    INF = jnp.int32(H * W)

    def neighbor_min(lab):
        def shift(a, dy, dx, fill):
            return jnp.roll(a, (dy, dx), axis=(0, 1))
        m = lab
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb_val = jnp.roll(mhi, (dy, dx), axis=(0, 1))
            nb_lab = jnp.roll(lab, (dy, dx), axis=(0, 1))
            # invalidate wrapped edges
            if dy == 1:
                edge = jnp.zeros((H, W), bool).at[0, :].set(True)
            elif dy == -1:
                edge = jnp.zeros((H, W), bool).at[H - 1, :].set(True)
            elif dx == 1:
                edge = jnp.zeros((H, W), bool).at[:, 0].set(True)
            else:
                edge = jnp.zeros((H, W), bool).at[:, W - 1].set(True)
            # zero-MHI pixels are never part of a motion segment (OpenCV
            # pre-marks them in the floodfill mask)
            connected = ((jnp.abs(mhi - nb_val) <= seg_thresh) & ~edge
                         & (mhi > 0) & (nb_val > 0))
            m = jnp.minimum(m, jnp.where(connected, nb_lab, INF))
        return m

    def cond(carry):
        lab, changed = carry
        return changed

    def body(carry):
        lab, _ = carry
        new = neighbor_min(lab)
        # pointer jumping: adopt the label of my label's pixel
        new = jnp.minimum(new, new.reshape(-1)[new])
        return (new, jnp.any(new != lab))

    labels, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.asarray(True)))

    lab_flat = labels.reshape(-1)
    seeds = (mhi == ts).reshape(-1)
    seeded = jnp.zeros((H * W,), bool).at[lab_flat].max(seeds)

    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).reshape(-1)
    big = jnp.int32(1 << 30)
    xmin = jnp.full((H * W,), big, jnp.int32).at[lab_flat].min(xs)
    ymin = jnp.full((H * W,), big, jnp.int32).at[lab_flat].min(ys)
    xmax = jnp.full((H * W,), -1, jnp.int32).at[lab_flat].max(xs)
    ymax = jnp.full((H * W,), -1, jnp.int32).at[lab_flat].max(ys)

    is_root = (lab_flat == jnp.arange(H * W, dtype=jnp.int32)) & seeded
    # compact to capacity: earliest roots first
    keys = jnp.where(is_root, jnp.arange(H * W, 0, -1, dtype=jnp.int32), 0)
    _, sel = jax.lax.top_k(keys, max_blobs)
    valid = jnp.take(is_root, sel)
    rx, ry = jnp.take(xmin, sel), jnp.take(ymin, sel)
    rw = jnp.take(xmax, sel) - rx + 1
    rh = jnp.take(ymax, sel) - ry + 1
    rects = jnp.stack([rx, ry, rw, rh], axis=-1)
    return jnp.where(valid[:, None], rects, 0), valid


def _motion_gradient(mhi, delta1, delta2, aperture=3):
    """cv::motempl::calcMotionGradient: Sobel(aperture) orientation in
    degrees + validity mask from local min/max spread of the MHI."""
    kd = jnp.array([-1.0, 0.0, 1.0])
    ks = jnp.array([1.0, 2.0, 1.0])

    def sep_conv(img, kx, ky):
        # replicate-border separable 3x3 conv (BORDER_REPLICATE like OpenCV)
        p = jnp.pad(img, 1, mode="edge")
        horiz = (p[:, :-2] * kx[0] + p[:, 1:-1] * kx[1] + p[:, 2:] * kx[2])
        return (horiz[:-2] * ky[0] + horiz[1:-1] * ky[1] + horiz[2:] * ky[2])

    dx = sep_conv(mhi, kd, ks)
    dy = sep_conv(mhi, ks, kd)
    orient = jnp.degrees(jnp.arctan2(dy, dx))
    orient = jnp.where(orient < 0, orient + 360.0, orient)
    # local min/max over the aperture window (erode/dilate)
    p = jnp.pad(mhi, 1, mode="edge")
    win = jnp.stack([p[a:a + mhi.shape[0], b:b + mhi.shape[1]]
                     for a in range(3) for b in range(3)])
    dmin, dmax = jnp.min(win, 0), jnp.max(win, 0)
    lo, hi = min(delta1, delta2), max(delta1, delta2)
    spread = dmax - dmin
    mask = (spread >= lo) & (spread <= hi)
    small = (jnp.abs(dx) < 1e-5) & (jnp.abs(dy) < 1e-5)
    orient = jnp.where(small, 0.0, orient)
    return mask, orient


@functools.partial(jax.jit, static_argnames=("threshold", "mhi_duration",
                                             "seg_thresh", "max_blobs"))
def tracker_step(state: TrackerState, gray, ts, *, threshold, mhi_duration,
                 seg_thresh, max_blobs):
    """One frame of the tracker recurrence. Returns (new_state, rects,
    valid, mask, orient)."""
    gray = jnp.asarray(gray, jnp.uint8)
    diff = jnp.abs(gray.astype(jnp.int32) - state.prev_gray.astype(jnp.int32))
    silh = diff > threshold                        # cv::threshold(.., thr, 255)
    ts = jnp.asarray(ts, jnp.float32)
    mhi = jnp.where(silh, ts,
                    jnp.where(state.mhi < ts - mhi_duration, 0.0, state.mhi))
    mhi = jnp.where(state.initialized, mhi, state.mhi)  # first frame: no-op
    rects, valid = _segment(mhi, ts, seg_thresh, max_blobs)
    valid = valid & state.initialized
    mask, orient = _motion_gradient(mhi, 0.05, 0.5)
    new_state = TrackerState(prev_gray=gray, mhi=mhi,
                             initialized=jnp.ones((), bool))
    return new_state, rects, valid, mask, orient


@functools.partial(jax.jit, static_argnames=("threshold", "mhi_duration",
                                             "seg_thresh", "max_blobs"))
def tracker_scan(state: TrackerState, grays, timestamps, *, threshold,
                 mhi_duration, seg_thresh, max_blobs):
    """Whole frame *window* in one device program via `lax.scan` — the
    long-video-context form (SURVEY.md §5: chunked scan over frame windows
    carrying the MHI recurrence). grays [T,H,W], timestamps [T] →
    (final state, rects [T,K,4], valid [T,K])."""

    def body(st, inp):
        g, ts = inp
        st2, rects, valid, _, _ = tracker_step(
            st, g, ts, threshold=threshold, mhi_duration=mhi_duration,
            seg_thresh=seg_thresh, max_blobs=max_blobs)
        return st2, (rects, valid)

    final, (rects, valid) = jax.lax.scan(
        body, state, (jnp.asarray(grays, jnp.uint8),
                      jnp.asarray(timestamps, jnp.float32)))
    return final, rects, valid


# ----------------------------------------------------------------- host layer
def _calc_dist(r1, r2):
    c1 = (r1[0] + r1[2] / 2, r1[1] + r1[3] / 2)
    c2 = (r2[0] + r2[2] / 2, r2[1] + r2[3] / 2)
    return np.sqrt((c1[0] - c2[0]) ** 2 + (c1[1] - c2[1]) ** 2)


def _merge_rects(r1, r2):
    """__merge (gstnubotracker.cpp:131-169): containment or union box."""
    x1, y1 = min(r1[0], r2[0]), min(r1[1], r2[1])
    x2 = max(r1[0] + r1[2], r2[0] + r2[2])
    y2 = max(r1[1] + r1[3], r2[1] + r2[3])
    return (x1, y1, x2 - x1, y2 - y1)


def join_objects(rects, min_area, max_area, distance):
    """__join_objects (gstnubotracker.cpp:171-200): back-to-front area filter
    plus pairwise distance merge with the reference's exact ordering."""
    rs = [tuple(int(v) for v in r) for r in rects]
    a = len(rs) - 1
    while a >= 0:
        area = rs[a][2] * rs[a][3]
        if min_area < area < max_area:
            for b in range(a - 1, -1, -1):
                area_b = rs[b][2] * rs[b][3]
                if min_area < area_b < max_area and \
                        distance > _calc_dist(rs[a], rs[b]):
                    rs[b] = _merge_rects(rs[a], rs[b])
                    del rs[a]
                    break
        else:
            del rs[a]
        a -= 1
    return rs


class Tracker:
    """Stateful wrapper with the reference's host-side blob filtering and
    event emission semantics. MHI/prev-frame recurrence state is kept PER
    STREAM (keyed by the media loop's stream id) — the reference's
    file-static `img_prev` shared across instances (gstnubotracker.cpp:108)
    is a documented hazard we fix, not reproduce."""

    def __init__(self, frame_size: tuple[int, int],
                 config: TrackerConfig | None = None, fps: float = 30.0):
        self.config = config or TrackerConfig()
        self.w, self.h = frame_size
        self.fps = fps
        self._states: dict[int, TrackerState] = {0: init_state(self.h, self.w)}
        self._frame_idx: dict[int, int] = {0: 0}

    # stream-0 views keep the single-stream surface (tests, checkpointing)
    @property
    def state(self) -> TrackerState:
        return self._states[0]

    @state.setter
    def state(self, v: TrackerState) -> None:
        self._states[0] = v

    @property
    def frame_idx(self) -> int:
        return self._frame_idx[0]

    @frame_idx.setter
    def frame_idx(self, v: int) -> None:
        self._frame_idx[0] = v

    def reconfigure(self, config: TrackerConfig) -> None:
        """Apply a config delta to the live tracker; MHI recurrence state
        and frame clocks survive (the reference mutates the running element
        under its mutex, gst_nubo_tracker_set_property)."""
        self.config = config

    def process(self, gray_frames,
                stream: int = 0) -> list[list[tuple[int, int, int, int]]]:
        """Consecutive frames [N,H,W] (or [H,W]) of one stream → per-frame
        blob lists."""
        gray_frames = np.asarray(gray_frames)
        if gray_frames.ndim == 2:
            gray_frames = gray_frames[None]
        cfg = self.config
        state = self._states.get(stream)
        if state is None:
            state = init_state(self.h, self.w)
            self._frame_idx[stream] = 0
        idx = self._frame_idx[stream]
        out = []
        for fr in gray_frames:
            ts = idx / self.fps
            state, rects, valid, _, _ = tracker_step(
                state, fr, ts,
                threshold=cfg.threshold, mhi_duration=cfg.mhi_duration,
                seg_thresh=cfg.seg_thresh, max_blobs=cfg.max_blobs)
            rs = np.asarray(rects)[np.asarray(valid)]
            out.append(join_objects(rs, cfg.min_area, cfg.max_area,
                                    cfg.distance))
            idx += 1
        self._states[stream] = state
        self._frame_idx[stream] = idx
        return out
