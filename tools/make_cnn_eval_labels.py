"""Regenerate the frozen CNN eval labels (tests/data/cnn_eval_labels.npz).

The shipped-checkpoint gates (tests/test_cnn_checkpoint.py, test_quant.py)
compare the learned detector against FROZEN teacher labels: the cascade
engine's grouped detections on scenes regenerated deterministically from a
stored seed via models/distill.make_scene. Whenever make_scene's
distribution changes (e.g. the round-3 textured backgrounds), the frozen
labels must be regenerated with this tool — the scenes stored implicitly
via (seed, n) would otherwise no longer match the labels.

    python tools/make_cnn_eval_labels.py            # default seed 123, n 32
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "data",
        "cnn_eval_labels.npz"))
    ap.add_argument("--tpu", action="store_true")
    ns = ap.parse_args(argv)
    if not ns.tpu:
        from nubomedia_vca_tpu import force_cpu_backend

        force_cpu_backend()
    from nubomedia_vca_tpu.models import distill

    rng = np.random.RandomState(ns.seed)
    pairs = [distill.make_scene(rng, return_geom=True) for _ in range(ns.n)]
    scenes = np.stack([p[0] for p in pairs])
    teacher = distill.make_teacher()
    boxes, valid, ign, ign_valid = distill.label_batch(
        teacher, scenes, [p[1] for p in pairs])
    np.savez(ns.out, seed=ns.seed, n=ns.n, boxes=boxes, valid=valid,
             ignore=ign, ignore_valid=ign_valid)
    print(f"saved {ns.out}: {int(valid.sum())} teacher boxes, "
          f"{int(ign_valid.sum())} ignore regions (teacher-missed drawn "
          f"faces) over {ns.n} scenes (seed {ns.seed})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
