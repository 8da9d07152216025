"""Learned multi-part detector — one conv pass for every part class.

The reference needs five chained cascade elements (face feeding eye/nose/
mouth via GstEvents, SURVEY.md §2.4.8, plus the ear module's own
profile-cascade + flip pass, kmseardetect.cpp:644-726) to produce part
boxes; the learned family collapses that into ONE device program: the
models/cnn.py backbone with a C-class head ([B, gh, gw, C*5]: per-class
objectness + box), so a single forward yields every part of every face —
frontal AND profile, either facing direction (training scenes are randomly
mirrored, standing in for the reference's explicit flip-and-rerun) — in
the batch. Trained SUPERVISED on procedural scenes (models/synth.py
draw_face / draw_profile_face return exact part geometry — no teacher
needed), shipped as assets/checkpoints/cnn_parts_v2.npz.

    python -m nubomedia_vca_tpu.models.cnn_parts --steps 3000 \
        --out nubomedia_vca_tpu/assets/checkpoints/cnn_parts_v2.npz

Like the face checkpoint, this is trained on synthetic scenes only — see
BASELINE.md for the honest real-imagery discussion; tools/real_eval.py's
caveats apply equally here.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from . import cnn

CLASSES = ("face", "eye", "nose", "mouth", "profile", "ear")
C = len(CLASSES)
W, H = cnn.CnnFaceDetector.WORK_W, cnn.CnnFaceDetector.WORK_H
MAX_PER_CLASS = 6


def init_params(key, head_dim: int = 256) -> dict:
    """cnn.init_params backbone + a dilated CONTEXT conv + a C*5 head.

    The context conv (3x3, dilation 4 on the stride-16 grid) widens the
    per-cell receptive field from ~31 px to ~159 px: the profile/frontal
    distinction lives at head scale (52-140 px here), and without it the
    head cell sees only a nose-sized patch — measured 23/33 profile false
    positives firing ON frontal faces with the plain backbone."""
    import jax

    params = cnn.init_params(key, head_dim=head_dim)
    key = jax.random.fold_in(key, 7)
    import jax.numpy as jnp
    params["head2"] = {
        "w": jax.random.normal(key, (head_dim, C * 5), jnp.float32) * 0.01,
        "b": jnp.zeros((C * 5,), jnp.float32),
    }
    kctx = jax.random.fold_in(key, 11)
    cdim = params["head1"]["w"].shape[0]
    params["ctx"] = {
        "w": jax.random.normal(kctx, (3, 3, cdim, cdim), jnp.float32)
             * np.sqrt(2.0 / (9 * cdim)),
        "b": jnp.zeros((cdim,), jnp.float32),
    }
    return params


CTX_DILATION = cnn.CTX_DILATION   # 3x3 dil-4 on the stride-16 grid: +128 px RF


def forward(params, gray):
    """gray [B,H,W] uint8 → [B, gh, gw, C, 5]: cnn backbone → dilated
    context conv (residual, cnn.apply_ctx) → wide head; same MXU path."""
    x = cnn.apply_ctx(params, cnn.backbone(params, gray))
    out = cnn.head(params, x)                # [B, gh, gw, C*5]
    B, gh, gw, _ = out.shape
    return out.reshape(B, gh, gw, C, 5)


def scene_with_parts(rng):
    """320x240 scene + per-class padded boxes from exact synth geometry.

    Mixes frontal faces (face/eye/nose/mouth) and left-facing profile
    heads (profile/ear); the whole scene is then mirrored with 50%
    probability so the detector learns BOTH facing directions — the
    learned-family stand-in for the reference ear module's explicit
    flip-and-rerun pass (kmseardetect.cpp:796-803).

    Backgrounds mix flat noise with procedural textures
    (models/textures.py) so real-world high-frequency structure is a hard
    negative at training time — the texture-brittleness mitigation for
    tools/real_eval.py's round-3 finding."""
    from .synth import draw_face, draw_profile_face, _rects_overlap
    from .textures import any_bg

    img = any_bg(rng, W, H)
    boxes = {k: [] for k in CLASSES}
    heads: list = []            # placed head boxes (overlap exclusion)

    def place(s, margin):
        """Head position not overlapping prior heads, or None. Overlap
        occludes labeled parts under a later drawing — the model would be
        trained to hallucinate parts on blank skin."""
        for _ in range(8):
            cx = int(rng.randint(margin, W - margin))
            cy = int(rng.randint(s, H - s))
            cand = (cx - margin, cy - s, 2 * margin, 2 * s)
            if not any(_rects_overlap(cand, h) for h in heads):
                heads.append(cand)
                return cx, cy
        return None

    for _ in range(int(rng.randint(0, 3))):
        s = int(rng.randint(26, 70))
        pos = place(s, int(0.9 * s))
        if pos is None:
            continue
        geo = draw_face(img, pos[0], pos[1], s)
        boxes["face"].append(geo["face"])
        boxes["eye"].extend(geo["eyes"])
        boxes["nose"].append(geo["nose"])
        boxes["mouth"].append(geo["mouth"])
    for _ in range(int(rng.randint(0, 2))):
        s = int(rng.randint(26, 60))
        pos = place(s, int(0.95 * s))
        if pos is None:
            continue
        geo = draw_profile_face(img, pos[0], pos[1], s)
        boxes["profile"].append(geo["head"])
        boxes["ear"].append(geo["ear"])
    out = np.zeros((C, MAX_PER_CLASS, 4), np.float32)
    val = np.zeros((C, MAX_PER_CLASS), bool)
    for ci, k in enumerate(CLASSES):
        bs = boxes[k][:MAX_PER_CLASS]
        if bs:
            out[ci, :len(bs)] = bs
            val[ci, :len(bs)] = True
    if rng.rand() < 0.5:                      # mirror scene + boxes
        img = np.ascontiguousarray(img[:, ::-1])
        out[..., 0] = np.where(val, W - out[..., 0] - out[..., 2],
                               out[..., 0])
    return img, out, val


# Per-class positive-cell loss weight. Profile/ear instances are rare in
# the scene distribution (one profile head per ~2 scenes vs ~2 eyes per
# scene), so their positive gradients get boosted; eye's surplus recall
# (0.98 at the 0.90 gate) is traded back toward precision by damping its
# positive weight — measured on the v2 checkpoint where eye precision at
# the default threshold was the only gate failure.
CLASS_POS_WEIGHT = (1.0, 0.5, 1.0, 1.0, 2.0, 1.5)


def loss_fn(params, gray, obj_t, reg_t):
    """obj_t [B,C,gh,gw], reg_t [B,C,gh,gw,4] (cnn.loss_fn semantics per
    class, summed)."""
    import jax.numpy as jnp
    import optax

    pred = forward(params, gray)             # [B,gh,gw,C,5]
    obj_logit = jnp.moveaxis(pred[..., 0], 3, 1)          # [B,C,gh,gw]
    reg = jnp.moveaxis(pred[..., 1:], 3, 1)               # [B,C,gh,gw,4]
    pos = (obj_t > 0).astype(jnp.float32)
    ign = (obj_t < 0).astype(jnp.float32)    # ignore-ring (boxes_to_targets)
    regw = (pos + (obj_t == -1).astype(jnp.float32))[..., None]
    bce = optax.sigmoid_binary_cross_entropy(obj_logit, pos)
    cw = jnp.asarray(CLASS_POS_WEIGHT)[None, :, None, None]
    obj_loss = (bce * jnp.where(pos > 0, cnn.POS_WEIGHT * cw,
                                1.0 - ign)).mean()
    reg_loss = (jnp.abs(reg - reg_t)
                * regw).sum() / jnp.maximum(regw.sum(), 1.0)
    return obj_loss + reg_loss, (obj_loss, reg_loss)


def targets(boxes, valid):
    """[B,C,N,4] + [B,C,N] → per-class grids via cnn.boxes_to_targets."""
    import jax

    def per_class(b, v):
        return cnn.boxes_to_targets(b, v, H, W)

    # vmap over the class axis (boxes [B,C,N,4] → swap to [C,B,N,4])
    import jax.numpy as jnp
    b = jnp.swapaxes(jnp.asarray(boxes), 0, 1)
    v = jnp.swapaxes(jnp.asarray(valid), 0, 1)
    obj, reg = jax.vmap(per_class)(b, v)     # [C,B,gh,gw], [C,B,gh,gw,4]
    return jnp.swapaxes(obj, 0, 1), jnp.swapaxes(reg, 0, 1)


DEFAULT_CHECKPOINT = "cnn_parts_v2.npz"   # v2: + profile/ear classes


def train(steps: int = 3000, batch: int = 32, seed: int = 0, lr: float = 3e-4,
          out: str | None = None, n_pool: int = 12, regen_every: int = 50,
          log_every: int = 200, max_seconds: float | None = None,
          init: str | None = None):
    import time

    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.RandomState(seed)
    if init:
        params = cnn.load_params_npz(init)   # fine-tune continuation
    else:
        params = init_params(jax.random.PRNGKey(seed))
    optimizer = cnn.make_optimizer(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, gray, obj_t, reg_t):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, gray, obj_t, reg_t)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def make_entry():
        scenes, bs, vs = zip(*[scene_with_parts(rng) for _ in range(batch)])
        obj_t, reg_t = targets(np.stack(bs), np.stack(vs))
        return jnp.asarray(np.stack(scenes)), obj_t, reg_t

    pool = [make_entry() for _ in range(n_pool)]
    t0 = time.monotonic()
    loss = None
    for it in range(steps):
        if regen_every and it and it % regen_every == 0:
            pool[it // regen_every % n_pool] = make_entry()
        g, o, r = pool[it % n_pool]
        params, opt_state, loss = step(params, opt_state, g, o, r)
        if log_every and it % log_every == 0:
            print(f"step {it}: loss {float(np.asarray(loss)):.4f} "
                  f"({time.monotonic() - t0:.0f}s)", flush=True)
        if max_seconds is not None and time.monotonic() - t0 > max_seconds:
            print(f"time budget hit at step {it}", flush=True)
            break
    final = float(np.asarray(loss))
    print(f"final loss {final:.4f}", flush=True)
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        cnn.save_params_npz(out, __import__("jax").device_get(params))
        print(f"saved {out}", flush=True)
    return params, final


# Per-class serving operating points, measured by threshold sweep on the
# shipped checkpoint's holdout scenes (each class's precision/recall curve
# has a different knee: eye fires hot on textured backgrounds and buys
# precision at 0.9 with recall to spare; profile heads score lower overall
# and need 0.5 to keep recall). A scalar `threshold` overrides all classes
# (the remote object's setThreshold semantics); a dict overrides per class.
DEFAULT_THRESHOLDS = {"face": 0.7, "eye": 0.9, "nose": 0.7,
                      "mouth": 0.7, "profile": 0.5, "ear": 0.7}


class CnnPartDetector:
    """One-pass learned part detector: process(gray) → per-frame dict
    {face/eye/nose/mouth/profile/ear: [(x,y,w,h), ...]} in original
    coordinates (the part-detector result surface of models/parts.py)."""

    WORK_W, WORK_H = W, H

    def __init__(self, frame_size, params=None, checkpoint=None,
                 threshold: float | dict | None = None):
        import jax

        self.frame_w, self.frame_h = frame_size
        if params is None:
            path = checkpoint or cnn.find_checkpoint(DEFAULT_CHECKPOINT)
            if path is None:
                raise FileNotFoundError(
                    "no cnn_parts checkpoint; train with "
                    "python -m nubomedia_vca_tpu.models.cnn_parts")
            params = cnn.load_params_npz(path)
        self.params = params
        self.threshold = threshold
        per_class = dict(DEFAULT_THRESHOLDS)
        if isinstance(threshold, dict):
            per_class.update(threshold)
        elif threshold is not None:
            per_class = {k: float(threshold) for k in CLASSES}
        self.thresholds = tuple(per_class[k] for k in CLASSES)
        # aspect-preserving letterbox (same scheme as CnnFaceDetector)
        self._rw, self._rh, self._ox, self._oy = cnn.letterbox_params(
            self.frame_w, self.frame_h, self.WORK_W, self.WORK_H)
        self.scale_back = self.frame_w / self._rw
        self._jit = jax.jit(self._device_detect)

    def _device_detect(self, gray):
        import jax
        import jax.numpy as jnp

        from ..ops.resize import resize_linear_exact

        work = resize_linear_exact(gray, (self._rw, self._rh))
        pad = ((0, 0), (self._oy, self.WORK_H - self._rh - self._oy),
               (self._ox, self.WORK_W - self._rw - self._ox))
        if any(p != (0, 0) for p in pad):
            work = jnp.pad(work, pad, mode="edge")
        pred = forward(self.params, work)       # [B,gh,gw,C,5]
        outs = []
        for ci in range(C):
            boxes, scores, valid = cnn.decode(pred[..., ci, :],
                                              self.thresholds[ci], top_k=8)
            # tighter per-class NMS than the face detector's 0.45: part
            # instances never overlap (distinct eyes/ears are disjoint),
            # so boxes agreeing >0.3 are duplicates of one instance
            keep = jax.vmap(lambda b, s, v: cnn.nms(b, s, v, 0.30))(
                boxes, scores, valid)
            outs.append((boxes, scores, valid & keep))
        return outs

    def process(self, gray):
        from .base import bucket_pad

        gray = np.asarray(gray)
        if gray.ndim == 2:
            gray = gray[None]
        gray, n_real = bucket_pad(gray)
        import jax.numpy as jnp
        outs = self._jit(jnp.asarray(gray))
        results = []
        host = [(np.asarray(b), np.asarray(v)) for (b, _, v) in outs]
        for i in range(n_real):
            frame = {}
            for ci, k in enumerate(CLASSES):
                boxes, valid = host[ci]
                kept = (boxes[i][valid[i]] - np.array(
                    [self._ox, self._oy, 0, 0], np.float32)) * self.scale_back
                frame[k] = [tuple(int(round(x)) for x in bx) for bx in kept]
            results.append(frame)
        return results


def evaluate(params=None, n_scenes: int = 48, seed: int = 123,
             threshold: float | dict | None = None, iou_gate: float = 0.4):
    """Per-class recall/precision vs exact synth geometry."""
    det = CnnPartDetector((W, H), params=params, threshold=threshold)
    rng = np.random.RandomState(seed)
    stats = {k: [0, 0, 0] for k in CLASSES}   # tp, fn, fp

    from ..core.boxes import iou

    for _ in range(n_scenes):
        img, boxes, valid = scene_with_parts(rng)
        res = det.process(img)[0]
        for ci, k in enumerate(CLASSES):
            truth = [tuple(boxes[ci, j]) for j in range(MAX_PER_CLASS)
                     if valid[ci, j]]
            got = list(res[k])
            used = set()
            for t in truth:
                best = None
                for gi, g in enumerate(got):
                    if gi not in used and iou(t, g) >= iou_gate:
                        best = gi
                        break
                if best is None:
                    stats[k][1] += 1
                else:
                    stats[k][0] += 1
                    used.add(best)
            stats[k][2] += len(got) - len(used)
    for k, (tp, fn, fp) in stats.items():
        r = tp / max(tp + fn, 1)
        p = tp / max(tp + fp, 1)
        print(f"{k}: recall {r:.3f} precision {p:.3f} (tp {tp} fn {fn} "
              f"fp {fp})", flush=True)
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "assets", "checkpoints",
        DEFAULT_CHECKPOINT))
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--max-seconds", type=float, default=None)
    ap.add_argument("--init", default=None,
                    help="checkpoint to fine-tune from (fresh init if "
                         "omitted)")
    ns = ap.parse_args(argv)
    params, _ = train(ns.steps, ns.batch, ns.seed, ns.lr, out=ns.out,
                      max_seconds=ns.max_seconds, init=ns.init)
    if ns.eval:
        evaluate(params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
