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


def init_params(key, channels=(16, 32, 64, 128), head_dim=256) -> dict:
    """Backbone: 4 stride-2 3x3 convs; head: 1x1 -> head_dim -> 5 outputs."""
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

    bfloat16 activations; convs/matmuls hit the MXU.
    """
    return head(params, backbone(params, gray))


def boxes_to_targets(boxes, valid, img_h, img_w):
    """[B,N,4] boxes + [B,N] valid → detection-grid targets.

    obj [B,gh,gw]; reg [B,gh,gw,4] (center offset within cell /STRIDE,
    log w/h relative to STRIDE)."""
    gh, gw = img_h // STRIDE, img_w // STRIDE
    B, N = valid.shape
    obj = jnp.zeros((B, gh, gw), jnp.float32)
    reg = jnp.zeros((B, gh, gw, 4), jnp.float32)
    cx = boxes[..., 0] + boxes[..., 2] / 2.0
    cy = boxes[..., 1] + boxes[..., 3] / 2.0
    gx = jnp.clip((cx / STRIDE).astype(jnp.int32), 0, gw - 1)
    gy = jnp.clip((cy / STRIDE).astype(jnp.int32), 0, gh - 1)
    bidx = jnp.arange(B)[:, None] * jnp.ones((1, N), jnp.int32)
    obj = obj.at[bidx, gy, gx].max(valid.astype(jnp.float32))
    t = jnp.stack([
        cx / STRIDE - gx, cy / STRIDE - gy,
        jnp.log(jnp.maximum(boxes[..., 2], 1) / STRIDE),
        jnp.log(jnp.maximum(boxes[..., 3], 1) / STRIDE),
    ], axis=-1)
    reg = reg.at[bidx, gy, gx].set(
        jnp.where(valid[..., None], t, 0.0))
    return obj, reg


POS_WEIGHT = 64.0  # positives are ~1:300 cells; unweighted BCE suppresses them


def loss_fn(params, gray, obj_t, reg_t):
    pred = forward(params, gray)
    obj_logit = pred[..., 0]
    bce = optax.sigmoid_binary_cross_entropy(obj_logit, obj_t)
    obj_loss = (bce * jnp.where(obj_t > 0, POS_WEIGHT, 1.0)).mean()
    reg_loss = (jnp.abs(pred[..., 1:] - reg_t)
                * obj_t[..., None]).sum() / jnp.maximum(obj_t.sum(), 1.0)
    return obj_loss + reg_loss, (obj_loss, reg_loss)


def make_optimizer(lr=3e-4):
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


DEFAULT_CHECKPOINT = "cnn_face_v1.npz"


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
    # two-scale inference option: + a 640-wide pass so faces smaller than
    # ~2 grid cells at 320 are still seen (detections from both scales are
    # merged by one cross-scale NMS in canonical 320-space)
    MULTI_SCALES = ((320, 240), (640, 480))

    def __init__(self, frame_size: tuple[int, int], params: dict | None = None,
                 checkpoint: str | None = None, threshold: float = 0.5,
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
        self.threshold = threshold
        self.multi_scale = bool(multi_scale)
        self.scale_back = self.frame_w / self.WORK_W
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
        """Shared single/multi-scale decode: run `fwd` at every working
        scale, map boxes into canonical WORK-space, one NMS across the
        union (also suppresses cross-scale duplicates)."""
        from ..ops.resize import resize_linear_exact

        all_boxes, all_scores, all_valid = [], [], []
        for (sw, sh) in self._scales():
            work = resize_linear_exact(gray, (sw, sh))
            pred = fwd(work)
            boxes, scores, valid = decode(pred, self.threshold)
            all_boxes.append(boxes * (self.WORK_W / sw))
            all_scores.append(scores)
            all_valid.append(valid)
        boxes = jnp.concatenate(all_boxes, axis=1)
        scores = jnp.concatenate(all_scores, axis=1)
        valid = jnp.concatenate(all_valid, axis=1)
        keep = jax.vmap(nms)(boxes, scores, valid)
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
            kept = boxes[b][valid[b]] * self.scale_back
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
