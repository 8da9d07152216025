"""Learned detector head — the framework's trainable model family.

The reference ships fixed 2001-era Haar cascades; a modern deployment wants
to fine-tune detectors on its own streams. This module provides a compact
anchor-free conv detector (objectness + box-regression grid) that can be
trained to mimic/replace any cascade (distillation from cascade detections)
— and it is the model used to exercise multi-chip training shardings
(data-parallel batch × tensor-parallel head features).

Pure-JAX (explicit param pytrees) so shardings can be annotated directly;
bfloat16 activations on the MXU path, float32 params/optimizer.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

STRIDE = 16  # total downsample: detection grid cell size in pixels
CTX_DILATION = 4   # context conv: 3x3 dil-4 on the stride-16 grid (+128 px RF)


def init_params(key, channels=(16, 32, 64, 128), head_dim=256,
                ctx: bool = False) -> dict:
    """Backbone: 4 stride-2 3x3 convs; head: 1x1 -> head_dim -> 5 outputs.

    ctx=True adds a dilated CONTEXT conv between backbone and head
    (residual 3x3, dilation CTX_DILATION): it widens the per-cell
    receptive field from ~31 px to ~159 px so a head cell sees the whole
    face, not a nose-sized patch. Proven on the parts model
    (cnn_parts.init_params) where it eliminated cross-class false
    positives; the round-3 textured training backgrounds
    (distill.make_scene) collapsed the plain backbone's precision to
    0.497, so the shipped face checkpoint now trains with ctx=True.
    forward() applies it only when the checkpoint carries a "ctx" entry —
    older ctx-less checkpoints keep loading unchanged."""
    params = {}
    cin = 1
    for i, c in enumerate(channels):
        key, k1 = jax.random.split(key)
        params[f"conv{i}"] = {
            "w": jax.random.normal(k1, (3, 3, cin, c), jnp.float32)
                 * np.sqrt(2.0 / (9 * cin)),
            "b": jnp.zeros((c,), jnp.float32),
        }
        cin = c
    key, k1, k2 = jax.random.split(key, 3)
    params["head1"] = {
        "w": jax.random.normal(k1, (cin, head_dim), jnp.float32)
             * np.sqrt(2.0 / cin),
        "b": jnp.zeros((head_dim,), jnp.float32),
    }
    params["head2"] = {
        "w": jax.random.normal(k2, (head_dim, 5), jnp.float32) * 0.01,
        "b": jnp.zeros((5,), jnp.float32),
    }
    if ctx:
        kctx = jax.random.fold_in(key, 11)
        params["ctx"] = {
            "w": jax.random.normal(kctx, (3, 3, cin, cin), jnp.float32)
                 * np.sqrt(2.0 / (9 * cin)),
            "b": jnp.zeros((cin,), jnp.float32),
        }
    return params


def backbone(params: dict, gray: jnp.ndarray) -> jnp.ndarray:
    """gray [B, H, W] uint8 → [B, H/16, W/16, C] feature grid (the four
    stride-2 convs; ~31 px receptive field per cell)."""
    x = (gray.astype(jnp.bfloat16) / 128.0 - 1.0)[..., None]
    for i in range(4):
        w = params[f"conv{i}"]["w"].astype(jnp.bfloat16)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        x = jax.nn.relu(x + params[f"conv{i}"]["b"].astype(jnp.bfloat16))
    return x


def apply_ctx(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Residual dilated context conv on the feature grid (no-op when the
    checkpoint has no "ctx" entry). Shared by the face model (forward)
    and the multi-part model (cnn_parts.forward)."""
    if "ctx" not in params:
        return x
    w = params["ctx"]["w"].astype(jnp.bfloat16)
    c = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(CTX_DILATION, CTX_DILATION),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    return x + jax.nn.relu(c + params["ctx"]["b"].astype(jnp.bfloat16))


def head(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """feature grid [B, gh, gw, C] → [B, gh, gw, out] (head1/head2)."""
    h = jnp.einsum("bhwc,cd->bhwd", x,
                   params["head1"]["w"].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + params["head1"]["b"])
    out = jnp.einsum("bhwd,de->bhwe", h.astype(jnp.bfloat16),
                     params["head2"]["w"].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out + params["head2"]["b"]


def forward(params: dict, gray: jnp.ndarray) -> jnp.ndarray:
    """gray [B, H, W] uint8 → [B, H/16, W/16, 5] (logit, dx, dy, logw, logh).

    bfloat16 activations; convs/matmuls hit the MXU. The residual context
    conv runs when the checkpoint ships one (init_params ctx=True).
    """
    return head(params, apply_ctx(params, backbone(params, gray)))


def boxes_to_targets(boxes, valid, img_h, img_w,
                     ignore_boxes=None, ignore_valid=None):
    """[B,N,4] boxes + [B,N] valid → detection-grid targets.

    obj [B,gh,gw] ∈ {1, -1, -2, 0}: 1 = center cell (positive), -1 = a
    cell in the 3×3 ring around a center (IGNORED by the objectness loss
    but regression-supervised), -2 = inside an ignore box (no gradient
    at all — used for faces the distillation teacher missed, see
    distill.label_batch), 0 = negative. reg [B,gh,gw,4] (center offset
    within the CELL's own frame /STRIDE, log w/h relative to STRIDE) is
    filled for the whole 3×3 neighborhood, so a borderline neighbor cell
    that fires at inference predicts the SAME face box as the center and
    NMS merges them — the round-3 eval showed 11/15 false positives were
    exactly such near-miss duplicates (IoU 0.17-0.44 vs the face), from
    neighbors firing with unsupervised regression."""
    gh, gw = img_h // STRIDE, img_w // STRIDE
    B, N = valid.shape
    pos = jnp.zeros((B, gh, gw), jnp.float32)
    nb = jnp.zeros((B, gh, gw), jnp.float32)
    reg = jnp.zeros((B, gh, gw, 4), jnp.float32)
    cx = boxes[..., 0] + boxes[..., 2] / 2.0
    cy = boxes[..., 1] + boxes[..., 3] / 2.0
    gx = jnp.clip((cx / STRIDE).astype(jnp.int32), 0, gw - 1)
    gy = jnp.clip((cy / STRIDE).astype(jnp.int32), 0, gh - 1)
    bidx = jnp.arange(B)[:, None] * jnp.ones((1, N), jnp.int32)
    logw = jnp.log(jnp.maximum(boxes[..., 2], 1) / STRIDE)
    logh = jnp.log(jnp.maximum(boxes[..., 3], 1) / STRIDE)
    # neighbors first, center (0,0) LAST so its regression wins conflicts
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
               if (dy, dx) != (0, 0)] + [(0, 0)]
    for dy, dx in offsets:
        gyn = jnp.clip(gy + dy, 0, gh - 1)
        gxn = jnp.clip(gx + dx, 0, gw - 1)
        t = jnp.stack([cx / STRIDE - gxn, cy / STRIDE - gyn, logw, logh],
                      axis=-1)
        reg = reg.at[bidx, gyn, gxn].set(
            jnp.where(valid[..., None], t, reg[bidx, gyn, gxn]))
        nb = nb.at[bidx, gyn, gxn].max(valid.astype(jnp.float32))
        if (dy, dx) == (0, 0):
            pos = pos.at[bidx, gyn, gxn].max(valid.astype(jnp.float32))
    obj = pos - nb * (1.0 - pos)     # 1 pos, -1 ignore-ring, 0 negative
    if ignore_boxes is not None:
        xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * STRIDE
        ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * STRIDE
        x0, y0 = ignore_boxes[..., 0], ignore_boxes[..., 1]
        x1, y1 = x0 + ignore_boxes[..., 2], y0 + ignore_boxes[..., 3]
        inx = (xs >= x0[..., None]) & (xs <= x1[..., None])   # [B,N,gw]
        iny = (ys >= y0[..., None]) & (ys <= y1[..., None])   # [B,N,gh]
        cover = (inx[:, :, None, :] & iny[:, :, :, None]
                 & ignore_valid[..., None, None]).any(axis=1)  # [B,gh,gw]
        obj = jnp.where((obj == 0) & cover, -2.0, obj)
    return obj, reg


POS_WEIGHT = 64.0  # positives are ~1:300 cells; unweighted BCE suppresses them
NEG_FOCAL = 8.0    # extra weight on confident false positives (see loss_fn)


def loss_fn(params, gray, obj_t, reg_t):
    """obj_t ∈ {1, -1, -2, 0} (positive / ignore-ring / ignore-box /
    negative, see boxes_to_targets): the ring contributes regression but
    no objectness gradient — its cells legitimately see most of the
    face, and forcing them to 0 fights the positive next door; ignore
    boxes (teacher-missed faces) contribute nothing."""
    pred = forward(params, gray)
    obj_logit = pred[..., 0]
    pos = (obj_t > 0).astype(jnp.float32)
    ign = (obj_t < 0).astype(jnp.float32)
    regw = (pos + (obj_t == -1).astype(jnp.float32))[..., None]  # 3×3 ring
    bce = optax.sigmoid_binary_cross_entropy(obj_logit, pos)
    # hard-negative emphasis: a negative cell the model scores near 1 (a
    # texture false positive — the round-3 failure mode on real imagery)
    # gets up to NEG_FOCAL extra weight; easy negatives keep weight 1 so
    # the base ranking pressure of plain BCE is preserved
    p = jax.lax.stop_gradient(jax.nn.sigmoid(obj_logit))
    neg_w = (1.0 + NEG_FOCAL * jnp.square(p)) * (1.0 - ign)
    obj_loss = (bce * jnp.where(pos > 0, POS_WEIGHT, neg_w)).mean()
    reg_loss = (jnp.abs(pred[..., 1:] - reg_t)
                * regw).sum() / jnp.maximum(regw.sum(), 1.0)
    return obj_loss + reg_loss, (obj_loss, reg_loss)


def make_optimizer(lr=3e-4, steps: int | None = None):
    """AdamW; when the total step count is known, warmup + cosine decay
    to 2% of peak (constant-LR runs at 3e-4 never settle: the 1500-step
    round-3 retrain plateaued with loss bouncing 0.19-0.47)."""
    if steps:
        lr = optax.warmup_cosine_decay_schedule(
            0.0, lr, min(200, max(steps // 10, 1)), steps, lr * 0.02)
    return optax.adamw(lr, weight_decay=1e-4)


def train_step(params, opt_state, gray, obj_t, reg_t, *, optimizer):
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, gray, obj_t, reg_t)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def decode(pred, threshold=0.5, top_k=32):
    """[B,gh,gw,5] → (boxes [B,K,4] f32 in pixels, scores [B,K], valid)."""
    B, gh, gw, _ = pred.shape
    score = jax.nn.sigmoid(pred[..., 0]).reshape(B, -1)
    vals, idx = jax.lax.top_k(score, top_k)
    gy, gx = idx // gw, idx % gw
    flat = pred.reshape(B, gh * gw, 5)
    sel = jnp.take_along_axis(flat, idx[..., None], axis=1)
    cx = (gx + sel[..., 1]) * STRIDE
    cy = (gy + sel[..., 2]) * STRIDE
    w = jnp.exp(sel[..., 3]) * STRIDE
    h = jnp.exp(sel[..., 4]) * STRIDE
    boxes = jnp.stack([cx - w / 2, cy - h / 2, w, h], axis=-1)
    return boxes, vals, vals > threshold


def nms(boxes, scores, valid, iou_threshold=0.45):
    """Jittable fixed-capacity greedy NMS.

    boxes [K,4] (x,y,w,h) sorted by score desc (decode's top_k order),
    valid [K] → keep mask [K]. A box is suppressed when a higher-scoring
    kept box overlaps it above the IoU threshold.
    """
    K = boxes.shape[0]
    x0, y0 = boxes[:, 0], boxes[:, 1]
    x1, y1 = x0 + boxes[:, 2], y0 + boxes[:, 3]
    area = jnp.maximum(boxes[:, 2], 0) * jnp.maximum(boxes[:, 3], 0)
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    inter = (jnp.maximum(ix1 - ix0, 0) * jnp.maximum(iy1 - iy0, 0))
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)
    higher = (scores[None, :] > scores[:, None]) | (
        (scores[None, :] == scores[:, None])
        & (jnp.arange(K)[None, :] < jnp.arange(K)[:, None]))
    overlap = (iou > iou_threshold) & higher & valid[None, :]

    # greedy sequential semantics via fori_loop over rank order: a box is
    # kept iff no KEPT higher-ranked box suppresses it
    def body(i, keep):
        suppressed = jnp.any(overlap[i] & keep)
        return keep.at[i].set(keep[i] & ~suppressed)

    keep = jax.lax.fori_loop(0, K, body, valid)
    return keep


# ------------------------------------------------------------- persistence
def save_params_npz(path: str, params: dict) -> None:
    """Flat-key npz checkpoint (dependency-free shipping format; the
    orbax train-state path lives in utils/checkpoint.py)."""
    flat = {"/".join(str(k.key) for k in p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    flat = np.load(path)
    params: dict = {}
    for key in flat.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return params


def letterbox_params(frame_w: int, frame_h: int,
                     work_w: int, work_h: int) -> tuple[int, int, int, int]:
    """Aspect-preserving fit of a frame into the working canvas.

    Returns (rw, rh, ox, oy): the frame resizes to rw×rh (uniform scale,
    the largest that fits) and sits at offset (ox, oy) inside the
    work_w×work_h canvas; the remainder is padding. Training scenes are
    native 320×240, so squashing an arbitrary-aspect camera frame to
    320×240 (the round-3 bug this replaces) puts inference outside the
    training distribution AND mis-maps y coordinates (a single
    frame_w-based scale was applied to both axes). 4:3 frames degenerate
    to rw=work_w, rh=work_h, ox=oy=0 — bit-identical to the old path."""
    s = min(work_w / frame_w, work_h / frame_h)
    rw = max(1, int(round(frame_w * s)))
    rh = max(1, int(round(frame_h * s)))
    return rw, rh, (work_w - rw) // 2, (work_h - rh) // 2


DEFAULT_CHECKPOINT = "cnn_face_v1.npz"

# Serving operating point for the shipped checkpoint, measured by
# threshold sweep on the frozen synthetic eval (tests/test_cnn_checkpoint)
# AND the real-image eval (tools/real_eval.py --builtin) — the same
# measured-default pattern as cnn_parts.DEFAULT_THRESHOLDS. Constructors
# resolve threshold=None to this; an explicit threshold (or the
# setThreshold RPC) overrides it. Re-measure whenever the checkpoint is
# retrained.
SERVING_THRESHOLD = 0.5


def find_checkpoint(name: str = DEFAULT_CHECKPOINT) -> str | None:
    import os

    cands = [
        # bundled with the package (ships in the wheel via package-data)
        os.path.join(os.path.dirname(__file__), "..", "assets",
                     "checkpoints", name),
        # repo-root assets/ (training-output convention)
        os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                     "checkpoints", name),
        name,
    ]
    for c in cands:
        if os.path.exists(c):
            return os.path.normpath(c)
    return None


class CnnFaceDetector:
    """Drop-in learned face detector: same process() surface as
    models.face.FaceDetector (list per frame of TrackedFace with temporal
    ID tracking), but the device path is the trained conv net + NMS decode
    instead of the Haar cascade.
    """

    WORK_W, WORK_H = 320, 240    # grid 20x15 at STRIDE 16
    # faces in one frame essentially never overlap >0.35 IoU; anything
    # above that is a near-miss duplicate of one face (round-3 FP
    # analysis: 11/15 FPs were neighbor-cell duplicates at IoU 0.17-0.44)
    NMS_IOU = 0.35
    # two-scale inference option: + a 640-wide pass so faces smaller than
    # ~2 grid cells at 320 are still seen (detections from both scales are
    # merged by one cross-scale NMS in canonical 320-space)
    MULTI_SCALES = ((320, 240), (640, 480))

    def __init__(self, frame_size: tuple[int, int], params: dict | None = None,
                 checkpoint: str | None = None,
                 threshold: float | None = None,
                 n_streams: int = 1, multi_scale: bool = False,
                 detect_event: int = 0, process_x_every_4_frames: int = 4):
        from .base import GopScheduler, EventGate
        from .face import FaceTracks

        self.frame_w, self.frame_h = frame_size
        if params is None:
            path = checkpoint or find_checkpoint()
            if path is None:
                raise FileNotFoundError(
                    "no CNN checkpoint found; train one with "
                    "models/distill.py or pass params=")
            params = load_params_npz(path)
        self.params = params
        self.threshold = (SERVING_THRESHOLD if threshold is None
                          else float(threshold))
        self.multi_scale = bool(multi_scale)
        # aspect-preserving letterbox geometry (canonical WORK canvas)
        self._rw, self._rh, self._ox, self._oy = letterbox_params(
            self.frame_w, self.frame_h, self.WORK_W, self.WORK_H)
        self.scale_back = self.frame_w / self._rw
        self.tracks = [FaceTracks() for _ in range(n_streams)]
        # same GOP-skip / event-gate scheduling as the cascade face
        # detector (the remote object exposes the shared detectByEvent /
        # processXevery4Frames knobs; they must not be dead here)
        self.gop = GopScheduler(process_x_every_4_frames)
        self.gate = EventGate(detect_event, process_x_every_4_frames,
                              scaled=False)
        self._rejit()

    def _rejit(self):
        self._detect_jit = jax.jit(self._device_detect)

    def reconfigure(self, threshold: float | None = None,
                    multi_scale: bool | None = None,
                    detect_event: int | None = None,
                    process_x_every_4_frames: int | None = None) -> None:
        """Apply knob changes to the LIVE detector (track IDs, GOP clock
        and gate budget preserved). Threshold/multi-scale are baked into
        the traced program, so the jit wrapper is rebuilt on change."""
        changed = False
        if threshold is not None and threshold != self.threshold:
            self.threshold = threshold
            changed = True
        if multi_scale is not None and bool(multi_scale) != self.multi_scale:
            self.multi_scale = bool(multi_scale)
            changed = True
        if detect_event is not None:
            self.gate.enabled = bool(detect_event)
        if process_x_every_4_frames is not None:
            self.gop.x = int(process_x_every_4_frames)
            self.gate.x = int(process_x_every_4_frames)
        if changed:
            self._rejit()

    def _scales(self):
        return self.MULTI_SCALES if self.multi_scale \
            else ((self.WORK_W, self.WORK_H),)

    def _multi_detect(self, gray, fwd):
        """Shared single/multi-scale decode: letterbox-resize into each
        working canvas (aspect preserved, edge-replicated padding — no
        artificial dark borders for the objectness head to fire on), run
        `fwd` at every scale, map boxes into canonical WORK-space, one
        NMS across the union (also suppresses cross-scale duplicates)."""
        from ..ops.resize import resize_linear_exact

        all_boxes, all_scores, all_valid = [], [], []
        for (sw, sh) in self._scales():
            k = sw // self.WORK_W
            work = resize_linear_exact(gray, (self._rw * k, self._rh * k))
            oy, ox = self._oy * k, self._ox * k
            pad = ((0, 0), (oy, sh - self._rh * k - oy),
                   (ox, sw - self._rw * k - ox))
            if any(p != (0, 0) for p in pad):
                work = jnp.pad(work, pad, mode="edge")
            pred = fwd(work)
            boxes, scores, valid = decode(pred, self.threshold)
            # a detection whose CENTER lies in the letterbox padding is
            # spurious by construction (the pad is edge-replicated smear,
            # not image content) — drop it before NMS so it can't shadow
            # a real in-content box either
            cx = boxes[..., 0] + boxes[..., 2] * 0.5
            cy = boxes[..., 1] + boxes[..., 3] * 0.5
            inside = ((cx >= ox) & (cx < ox + self._rw * k)
                      & (cy >= oy) & (cy < oy + self._rh * k))
            all_boxes.append(boxes * (self.WORK_W / sw))
            all_scores.append(scores)
            all_valid.append(valid & inside)
        boxes = jnp.concatenate(all_boxes, axis=1)
        scores = jnp.concatenate(all_scores, axis=1)
        valid = jnp.concatenate(all_valid, axis=1)
        keep = jax.vmap(lambda b, s, v: nms(b, s, v, self.NMS_IOU))(
            boxes, scores, valid)
        return boxes, scores, valid & keep

    def _device_detect(self, gray):
        return self._multi_detect(gray, lambda w: forward(self.params, w))

    def detect_boxes(self, gray) -> list[np.ndarray]:
        """Grouped (NMS) face boxes in original coordinates. Batches are
        padded to power-of-two buckets (base.bucket_pad) to bound the set
        of compiled program shapes."""
        from .base import bucket_pad

        gray = np.asarray(gray)
        if gray.ndim == 2:
            gray = gray[None]
        gray, n_real = bucket_pad(gray)
        boxes, _, valid = self._detect_jit(jnp.asarray(gray))
        boxes, valid = np.asarray(boxes), np.asarray(valid)
        out = []
        for b in range(n_real):
            kept = boxes[b][valid[b]] - np.array(
                [self._ox, self._oy, 0, 0], np.float32)
            kept = kept * self.scale_back
            out.append(np.rint(kept).astype(np.int32)
                       if len(kept) else np.zeros((0, 4), np.int32))
        return out

    def process(self, gray, stream: int = 0, events=None):
        """Full per-frame pipeline with GOP skip, event gate and tracking
        — the same schedule as FaceDetector.process (events: upstream
        motion events refueling the detect-event gate)."""
        from .base import gated_gop_mask
        from .face import FaceTracks

        gray = np.asarray(gray)
        if gray.ndim == 2:
            gray = gray[None]
        n = gray.shape[0]
        mask = gated_gop_mask(self.gop, self.gate, n, events)
        while stream >= len(self.tracks):
            self.tracks.append(FaceTracks())
        tracks = self.tracks[stream]
        results = []
        det_iter = iter(self.detect_boxes(gray[mask]) if mask.any() else [])
        for i in range(n):
            if mask[i]:
                results.append(list(tracks.update(next(det_iter), 40)))
            else:
                results.append(list(tracks.faces))
        return results
