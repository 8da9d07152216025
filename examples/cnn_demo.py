"""Learned-detector demo — the trained CNN face detector (distilled from
the golden-verified Haar cascade teacher, models/distill.py) running as a
drop-in pipeline element: CNN faces feed the event-gated eye detector the
same way the reference's face element feeds part detectors over GstEvents
(kmseyedetect.cpp:680-724).

    python examples/cnn_demo.py [--tpu] [--teacher-eval]

--teacher-eval additionally runs the held-out recall/precision evaluation
against the cascade teacher (builds a cascade engine; slower on CPU).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend (default: CPU)")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--teacher-eval", action="store_true",
                    help="also evaluate recall/precision vs the cascade "
                         "teacher on held-out scenes")
    args = ap.parse_args()

    if not args.tpu:
        from nubomedia_vca_tpu import force_cpu_backend
        force_cpu_backend()

    import numpy as np
    from nubomedia_vca_tpu.models import cnn, distill
    from nubomedia_vca_tpu.models.eye import EyeDetector, EyeDetectorConfig
    from nubomedia_vca_tpu.pipeline.graph import FilterNode, VcaPipeline

    ckpt = cnn.find_checkpoint()
    if ckpt is None:
        print("no checkpoint found — train one first:\n"
              "  python -m nubomedia_vca_tpu.models.distill "
              "--out nubomedia_vca_tpu/assets/checkpoints/cnn_face_v1.npz")
        return 1
    print(f"checkpoint: {ckpt}")

    W, H = cnn.CnnFaceDetector.WORK_W, cnn.CnnFaceDetector.WORK_H
    rng = np.random.RandomState(7)
    clip = np.stack([distill.make_scene(rng) for _ in range(args.frames)])

    pipe = (
        VcaPipeline()
        .add(FilterNode("face", cnn.CnnFaceDetector((W, H)), "face",
                        emits=("face",)))
        .add(FilterNode("eye", EyeDetector((W, H), EyeDetectorConfig(
            detect_event=1)), "eye", consumes={"face"}))
    )
    events = pipe.process(clip)
    for i in range(args.frames):
        faces = events["face"][i].detections
        eyes = events["eye"][i].detections
        print(f"frame {i}: faces={len(faces)} eyes={len(eyes)}")
        for d in faces:
            print(f"    face id={d.id} at ({d.x},{d.y},{d.width},{d.height})")

    if args.teacher_eval:
        print("\n--- held-out eval vs cascade teacher ---")
        params = cnn.load_params_npz(ckpt)
        distill.evaluate(params, n_scenes=64)
    return 0


if __name__ == "__main__":
    sys.exit(main())
