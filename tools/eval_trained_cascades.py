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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=999)
    ap.add_argument("--n-pos", type=int, default=800)
    ap.add_argument("--n-neg", type=int, default=3000)
    args = ap.parse_args()

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
