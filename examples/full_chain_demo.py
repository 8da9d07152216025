"""Full chained pipeline demo — the reference's flagship deployment shape
(face detector feeding event-gated part detectors, plus the motion tracker),
over a synthetic multi-stream clip, with rendered output frames.

    python examples/full_chain_demo.py [--tpu]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend (default: CPU)")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    if not args.tpu:
        from nubomedia_vca_tpu import force_cpu_backend
        force_cpu_backend()

    import numpy as np
    from fixtures import face_clip, moving_blob_clip
    from nubomedia_vca_tpu.models.face import FaceDetector
    from nubomedia_vca_tpu.models.eye import EyeDetector, EyeDetectorConfig
    from nubomedia_vca_tpu.models.mouth import MouthDetector
    from nubomedia_vca_tpu.models.tracker import Tracker
    from nubomedia_vca_tpu.pipeline.graph import FilterNode, VcaPipeline
    from nubomedia_vca_tpu.api.render import render_detections

    clip = face_clip(args.frames)
    pipe = (
        VcaPipeline()
        .add(FilterNode("face", FaceDetector((640, 480)), "face",
                        emits=("face",)))
        .add(FilterNode("eye", EyeDetector((640, 480), EyeDetectorConfig(
            detect_event=1)), "eye", consumes={"face"}))
        .add(FilterNode("mouth", MouthDetector((640, 480)), "mouth",
                        consumes={"face"}))
    )
    events = pipe.process(clip)
    for i in range(args.frames):
        row = []
        for name in ("face", "eye", "mouth"):
            dets = events[name][i].detections
            row.append(f"{name}:{len(dets)}")
        print(f"frame {i}: " + "  ".join(row))
        for d in events["face"][i].detections:
            print(f"    face id={d.id} at ({d.x},{d.y},{d.width},{d.height})")

    rendered = render_detections(
        clip, [[(d.x, d.y, d.width, d.height)
                for d in events["face"][i].detections]
               for i in range(args.frames)])
    out = np.asarray(rendered)
    print("rendered frames:", out.shape, "nonzero overlay px:",
          int((out != clip).sum()))

    print("\n--- motion tracker on a moving-blob clip ---")
    blobs = Tracker((320, 240)).process(moving_blob_clip(8))
    for i, bl in enumerate(blobs):
        print(f"frame {i}: {bl}")


if __name__ == "__main__":
    main()
