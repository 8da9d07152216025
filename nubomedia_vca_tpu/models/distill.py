"""Distillation trainer for the learned face detector.

Teacher: the golden-verified Haar cascade engine (grouped detections on
synthetic scenes — the reference's detector, SURVEY.md §2.4.4). Student:
the anchor-free conv net in models/cnn.py. Scenes are procedurally
generated (the reference ships no media; see tests/fixtures.py), labels
are the TEACHER's boxes, so the student learns to reproduce cascade
behavior — the "distill from cascade detections" path of SURVEY.md §7.

    python -m nubomedia_vca_tpu.models.distill --steps 1500 \
        --out nubomedia_vca_tpu/assets/checkpoints/cnn_face_v1.npz

Training runs on whatever backend jax selects (TPU when available); the
scene generator and teacher labeling run once per epoch-chunk on host.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from . import cnn

W, H = cnn.CnnFaceDetector.WORK_W, cnn.CnnFaceDetector.WORK_H
MAX_FACES = 4


def _draw_face(img, cx, cy, s, rng):
    """Cartoon face tuned to fire haarcascade_frontalface_alt (same
    recipe as tests/fixtures.draw_face, with brightness jitter)."""
    import cv2

    base = int(rng.randint(180, 230))
    cv2.ellipse(img, (cx, cy), (int(0.78 * s), s), 0, 0, 360, base, -1)
    ey = cy - int(0.25 * s)
    ex = int(0.34 * s)
    for sx in (-1, 1):
        cv2.ellipse(img, (cx + sx * ex, ey - int(0.18 * s)),
                    (int(0.22 * s), int(0.06 * s)), 0, 0, 360, 95, -1)
        cv2.ellipse(img, (cx + sx * ex, ey), (int(0.18 * s), int(0.11 * s)),
                    0, 0, 360, 40, -1)
    cv2.line(img, (cx, cy - int(0.05 * s)), (cx, cy + int(0.3 * s)),
             130, max(1, s // 10))
    cv2.ellipse(img, (cx, cy + int(0.55 * s)), (int(0.34 * s), int(0.12 * s)),
                0, 0, 360, 70, -1)


def make_scene(rng) -> np.ndarray:
    img = np.full((H, W), int(rng.randint(90, 150)), np.uint8)
    for _ in range(int(rng.randint(0, MAX_FACES))):
        s = int(rng.randint(24, 70))
        cx = int(rng.randint(s, W - s))
        cy = int(rng.randint(s, H - s))
        _draw_face(img, cx, cy, s, rng)
    noise = rng.randint(-5, 6, (H, W))
    return np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)


def make_teacher():
    from ..cascade.engine import get_engine
    from ..models.face import DEFAULT_FACE_CASCADE

    return get_engine(DEFAULT_FACE_CASCADE, (W, H), 1.25)


def label_batch(teacher, scenes: np.ndarray):
    """Teacher grouped boxes (device) → padded [B, MAX_FACES, 4] + valid."""
    boxes, valid, _, _ = teacher.detect_grouped(scenes, 3)
    boxes, valid = np.asarray(boxes), np.asarray(valid)
    B = scenes.shape[0]
    out = np.zeros((B, MAX_FACES, 4), np.float32)
    out_v = np.zeros((B, MAX_FACES), bool)
    for b in range(B):
        kept = boxes[b][valid[b]][:MAX_FACES]
        out[b, :len(kept)] = kept
        out_v[b, :len(kept)] = True
    return out, out_v


def train(steps: int = 1500, batch: int = 32, seed: int = 0,
          lr: float = 3e-4, log_every: int = 100, out: str | None = None,
          regen_every: int = 50, n_pool: int = 16, save_every: int = 1000,
          max_seconds: float | None = None):
    import time

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    teacher = make_teacher()
    params = cnn.init_params(jax.random.PRNGKey(seed))
    optimizer = cnn.make_optimizer(lr)
    opt_state = optimizer.init(params)

    step_jit = jax.jit(
        lambda p, o, g, ot, rt: cnn.train_step(p, o, g, ot, rt,
                                               optimizer=optimizer))
    targets_jit = jax.jit(
        lambda b, v: cnn.boxes_to_targets(b, v, H, W))

    # data pool of pre-labeled batches, resident on DEVICE (scenes + targets
    # are uploaded once per pool refresh, not per step — the H2D upload per
    # step would otherwise dominate on a tunneled TPU)
    def make_entry():
        scenes = np.stack([make_scene(rng) for _ in range(batch)])
        b, v = label_batch(teacher, scenes)
        obj_t, reg_t = targets_jit(jnp.asarray(b), jnp.asarray(v))
        return jnp.asarray(scenes), obj_t, reg_t

    pool = [make_entry() for _ in range(n_pool)]

    def save(p):
        if out:
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
            cnn.save_params_npz(out, jax.device_get(p))
            print(f"saved {out}", flush=True)

    t0 = time.monotonic()
    loss = None
    for it in range(steps):
        if regen_every and it and it % regen_every == 0:
            pool[it // regen_every % n_pool] = make_entry()
        scenes_d, obj_t, reg_t = pool[it % n_pool]
        params, opt_state, loss = step_jit(
            params, opt_state, scenes_d, obj_t, reg_t)
        if log_every and it % log_every == 0:
            print(f"step {it}: loss {float(np.asarray(loss)):.4f} "
                  f"({time.monotonic() - t0:.0f}s)", flush=True)
        if save_every and it and it % save_every == 0:
            save(params)
        if max_seconds is not None and time.monotonic() - t0 > max_seconds:
            print(f"time budget hit at step {it}", flush=True)
            break

    final = float(np.asarray(loss))
    print(f"final loss {final:.4f}", flush=True)
    save(params)
    return params, final


def evaluate(params, n_scenes: int = 64, seed: int = 123,
             iou_gate: float = 0.5, threshold: float = 0.5):
    """Recall/precision of the student vs the teacher on held-out scenes."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    teacher = make_teacher()
    det = cnn.CnnFaceDetector((W, H), params=params, threshold=threshold)
    scenes = np.stack([make_scene(rng) for _ in range(n_scenes)])
    t_boxes, t_valid = label_batch(teacher, scenes)
    s_boxes = det.detect_boxes(jnp.asarray(scenes))

    from ..core.boxes import iou

    tp = fn = fp = 0
    for i in range(n_scenes):
        teach = [t_boxes[i, j] for j in range(MAX_FACES) if t_valid[i, j]]
        stud = list(s_boxes[i])
        used = set()
        for t in teach:
            best, best_iou = None, iou_gate
            for k, s in enumerate(stud):
                if k in used:
                    continue
                v = iou(t, s)
                if v >= best_iou:
                    best, best_iou = k, v
            if best is None:
                fn += 1
            else:
                tp += 1
                used.add(best)
        fp += len(stud) - len(used)
    recall = tp / max(tp + fn, 1)
    precision = tp / max(tp + fp, 1)
    print(f"recall {recall:.3f} precision {precision:.3f} "
          f"(tp {tp} fn {fn} fp {fp})", flush=True)
    return recall, precision


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="nubomedia_vca_tpu/assets/checkpoints/cnn_face_v1.npz")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--max-seconds", type=float, default=None)
    ns = ap.parse_args(argv)
    params, _ = train(ns.steps, ns.batch, ns.seed, ns.lr, out=ns.out,
                      max_seconds=ns.max_seconds)
    if ns.eval:
        evaluate(params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
