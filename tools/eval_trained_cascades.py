#!/usr/bin/env python
"""Window-level holdout eval of the SHIPPED trained cascade XMLs.

Unlike the trainer's in-memory holdout print (tools/train_part_cascades.py),
this loads the actual asset files through the production XML loader
(cascade/xml_loader.py) and evaluates them on freshly sampled holdout crops,
so every number is tied to the bytes in the wheel, not to a training run's
stdout. Reports detection on part positives plus FP on BOTH negative
distributions (VERDICT r3 item 5):

* clean  — the scene-negative distribution the round-3 trainer used
  (other parts / face edges / background of the same procedural scenes);
* textured — the round-3 texture families (models/textures.py) that exposed
  the CNN's texture brittleness on real photos.

Reference parity note: the reference ships mcs cascades whose robustness
came from real-world negatives (kmsnosedetect.cpp:32); in this zero-egress
environment the textured families are the closest available stand-in, so
both numbers are recorded in BASELINE.md.

Usage: python tools/eval_trained_cascades.py [--seed 999] [--n-neg 3000]
Prints one JSON line per part.

``--real`` instead runs the REAL-PIXEL false-positive sweep (VERDICT r4
item 4): each shipped trained cascade (vca_nose/ear/profileface) AND the
installed real haarcascade_profileface.xml is scanned over the real
offline photographs (the Grace Hopper portrait and scikit-learn's
face-free china/flower scenes, utils/offline_images.py) at its serving
config — part cascades at the 320-wide part working width with the
reference's 1.1 part pyramid factor (kmseyedetect.cpp:42), profile
cascades at the 160-wide face width / 1.25 / minNeighbors 2
(kmseardetect.cpp:656-659). The scan is whole-image (no face-ROI
gating), so the counts UPPER-BOUND serving FP exposure; on the portrait
the count outside the teacher face box is reported separately (a nose
hit inside the face region is correct behavior, not an FP). The mcs
models the reference deploys got their texture robustness from
real-world negatives (kmsnosedetect.cpp:32); this sweep measures the
shipped substitutes on the only real texture available offline.
Regression-gated by tests/test_real_fp_sweep.py.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ASSETS = os.path.join(os.path.dirname(__file__), "..",
                      "nubomedia_vca_tpu", "assets", "haarcascades")
PARTS = {
    "nose": "vca_nose_synthetic.xml",
    "ear": "vca_ear_synthetic.xml",
    "profile": "vca_profileface_synthetic.xml",
}


def eval_xml_windows(casc, samples: np.ndarray) -> np.ndarray:
    """Boolean pass mask for [N,h,w] uint8 windows under the loaded
    cascade's exact semantics (normalized feature values, padded depth-2
    branch-free weak eval — xml_loader.py module docstring), minus the
    variance-validity gate (applied by the caller, as in the trainer)."""
    from nubomedia_vca_tpu.cascade.train import (corner_matrix,
                                                 feature_values)
    assert not casc.has_tilted, "trained cascades are upright-only"
    feats = []
    for f in range(casc.n_features):
        rl = []
        for r in range(casc.rects.shape[1]):
            wt = float(casc.rect_weights[f, r])
            if wt == 0.0:
                continue
            x, y, w, h = (int(v) for v in casc.rects[f, r])
            rl.append((x, y, w, h, wt))
        feats.append(rl)
    mat = corner_matrix(feats, casc.window_w, casc.window_h)
    vals = feature_values(samples, mat)

    def weak_out(i):
        v0 = vals[:, casc.feat0[i]]
        left = np.where(vals[:, casc.featL[i]] < casc.thrL[i],
                        casc.leavesL[i, 0], casc.leavesL[i, 1])
        right = np.where(vals[:, casc.featR[i]] < casc.thrR[i],
                         casc.leavesR[i, 0], casc.leavesR[i, 1])
        return np.where(v0 < casc.thr0[i], left, right)

    alive = np.ones(samples.shape[0], bool)
    for s in range(casc.n_stages):
        idx = np.nonzero(casc.weak_stage == s)[0]
        score = np.zeros(samples.shape[0], np.float32)
        for i in idx:
            score += weak_out(i)
        alive &= score >= casc.stage_thresholds[s]
    return alive


REAL_PROFILE = "/usr/share/opencv4/haarcascades/haarcascade_profileface.xml"


def real_fp_scan(cascade_path: str, gray: np.ndarray, family: str,
                 face_box=None) -> dict:
    """Whole-image serving-config scan of one cascade over one real photo.

    family 'part' → 320-wide work image, pyramid 1.1, minNeighbors 3
    (kmseyedetect.cpp:24-25,42); family 'profile' → 160-wide, 1.25,
    minNeighbors 2 (kmseardetect.cpp:656-659). Returns grouped-detection
    counts in ORIGINAL pixels; with face_box (x,y,w,h), detections whose
    center lies inside the box are counted separately (not FPs for
    face-part cascades)."""
    import jax.numpy as jnp

    from nubomedia_vca_tpu.cascade.engine import get_engine
    from nubomedia_vca_tpu.ops.histogram import equalize_hist
    from nubomedia_vca_tpu.ops.resize import resize_linear_exact

    h, w = gray.shape
    work_w, sf, mn = ((320, 1.1, 3) if family == "part"
                      else (160, 1.25, 2))
    work_w = min(work_w, w)
    work_h = int(round(h * work_w / w))
    eng = get_engine(cascade_path, (work_w, work_h), sf)
    work = equalize_hist(resize_linear_exact(
        jnp.asarray(gray)[None], (work_w, work_h)))
    boxes = eng.detect(np.asarray(work)[0], mn)[0]
    boxes = (np.rint(np.asarray(boxes, np.float64) * (w / work_w))
             .astype(int) if len(boxes) else np.zeros((0, 4), int))
    n_in_face = 0
    if face_box is not None and len(boxes):
        fx, fy, fw, fh = face_box
        cx = boxes[:, 0] + boxes[:, 2] / 2
        cy = boxes[:, 1] + boxes[:, 3] / 2
        inside = ((cx >= fx) & (cx < fx + fw)
                  & (cy >= fy) & (cy < fy + fh))
        n_in_face = int(inside.sum())
    return {"n_det": int(len(boxes)), "n_in_face": n_in_face,
            "n_fp": int(len(boxes)) - n_in_face,
            "boxes": [[int(v) for v in b] for b in boxes[:16]]}


def run_real_sweep() -> list[dict]:
    """The full real-photo FP sweep: every shipped trained cascade plus the
    installed real profile cascade over every offline photograph."""
    from nubomedia_vca_tpu.utils.offline_images import offline_photos

    photos = offline_photos()
    if not photos:
        return []
    scans = [("vca_nose", os.path.join(ASSETS, PARTS["nose"]), "part"),
             ("vca_ear", os.path.join(ASSETS, PARTS["ear"]), "part"),
             ("vca_profileface", os.path.join(ASSETS, PARTS["profile"]),
              "profile")]
    if os.path.exists(REAL_PROFILE):
        scans.append(("haarcascade_profileface", REAL_PROFILE, "profile"))
    rows = []
    for photo in photos:
        gray = np.round(
            photo.bgr[..., 0] * 0.114 + photo.bgr[..., 1] * 0.587
            + photo.bgr[..., 2] * 0.299).astype(np.uint8)
        face_box = None
        if photo.n_faces:
            from nubomedia_vca_tpu.models.face import FaceDetector

            h, w = gray.shape
            det = FaceDetector((w, h))
            faces = det.process(gray[None])[0]
            if faces:
                f = faces[0]
                face_box = (f.x, f.y, f.w, f.h)
        for name, path, family in scans:
            row = {"cascade": name, "photo": photo.name, "family": family,
                   "face_box": list(face_box) if face_box else None}
            row.update(real_fp_scan(path, gray, family, face_box))
            rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=999)
    ap.add_argument("--n-pos", type=int, default=800)
    ap.add_argument("--n-neg", type=int, default=3000)
    ap.add_argument("--real", action="store_true",
                    help="real-photo FP sweep instead of the synthetic "
                         "holdout eval")
    args = ap.parse_args()

    if args.real:
        # deterministic eval on the CPU backend: on the axon-tunnel TPU
        # harness the scan's per-level readbacks run in the degraded
        # synchronous mode (bench.py module docstring) and the remote
        # compiler makes cold engines minutes-slow; this is an accuracy
        # eval, not a perf measurement
        from nubomedia_vca_tpu import force_cpu_backend

        force_cpu_backend()
        for row in run_real_sweep():
            print(json.dumps(row), flush=True)
        return

    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml
    from nubomedia_vca_tpu.cascade.train import vnf_and_valid
    from nubomedia_vca_tpu.models.synth import (make_samplers,
                                                make_texture_sampler)

    for part, fname in PARTS.items():
        path = os.path.join(ASSETS, fname)
        casc = load_cascade_xml(path)
        rng = np.random.RandomState(args.seed)
        pos_s, _ = make_samplers(part, texture_neg_frac=0.0)
        clean_neg = make_samplers(part, texture_neg_frac=0.0)[1]
        tex_neg = make_texture_sampler()

        P = pos_s(args.n_pos, rng)
        _, pv = vnf_and_valid(P)
        det = float(eval_xml_windows(casc, P[pv]).mean())
        fps = {}
        for name, sampler in (("clean", clean_neg), ("textured", tex_neg)):
            N = sampler(args.n_neg, rng)
            _, nv = vnf_and_valid(N)
            fps[name] = float(eval_xml_windows(casc, N[nv]).mean())
        print(json.dumps({
            "part": part, "asset": fname, "stages": casc.n_stages,
            "weaks": casc.n_weaks, "det": round(det, 4),
            "fp_clean": round(fps["clean"], 5),
            "fp_textured": round(fps["textured"], 5),
            "n_pos": int(pv.sum()), "n_neg": args.n_neg,
            "seed": args.seed,
        }), flush=True)


if __name__ == "__main__":
    main()
