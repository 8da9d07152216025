"""Command-line filter runner — the analog of the reference's per-module
``run_plugin.sh`` smoke pipelines (``gst-launch-1.5 v4l2src ! videoconvert !
nubofacedetector ! autovideosink``, e.g.
nubo_face/.../gst-plugins/run_plugin.sh:3): point a filter at a video
source, watch detections stream out, optionally write annotated video.

    python -m nubomedia_vca_tpu face --input clip.mp4 --output out.mp4
    python -m nubomedia_vca_tpu tracker --synthetic --frames 32
    python -m nubomedia_vca_tpu chain --input clip.mp4          # face→eye→mouth
    python -m nubomedia_vca_tpu cnn --synthetic --tpu

Sources: any cv2.VideoCapture URI (file, v4l2 index, rtsp/http) or
--synthetic procedural clips. Output: annotated video via cv2.VideoWriter
(rect overlays, the reference's view-faces mode) and one detection line per
frame on stdout.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _read_frames(ns):
    if ns.synthetic:
        if ns.filter == "tracker":
            # moving blob clip for motion tracking
            H, W = 240, 320
            frames = []
            for i in range(ns.frames):
                img = np.full((H, W), 60, np.uint8)
                x = 40 + 6 * i
                img[100:140, x:x + 40] = 220
                frames.append(img)
            return np.stack(frames), None
        from .models import distill
        rng = np.random.RandomState(ns.seed)
        return (np.stack([distill.make_scene(rng)
                          for _ in range(ns.frames)]), None)

    import cv2
    src = int(ns.input) if ns.input.isdigit() else ns.input
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video source: {ns.input}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while len(frames) < ns.frames:
        ok, bgr = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY))
    cap.release()
    if not frames:
        raise SystemExit("no frames decoded")
    return np.stack(frames), fps


def _make_model(ns, frame_size):
    if ns.filter == "face":
        from .models.face import FaceDetector
        return FaceDetector(frame_size)
    if ns.filter == "cnn":
        from .models.cnn import CnnFaceDetector
        return CnnFaceDetector(frame_size)
    if ns.filter == "eye":
        from .models.eye import EyeDetector
        return EyeDetector(frame_size)
    if ns.filter == "mouth":
        from .models.mouth import MouthDetector
        return MouthDetector(frame_size)
    if ns.filter == "nose":
        from .models.nose import NoseDetector
        return NoseDetector(frame_size)
    if ns.filter == "ear":
        from .models.ear import EarDetector
        return EarDetector(frame_size)
    if ns.filter == "tracker":
        from .models.tracker import Tracker
        return Tracker(frame_size)
    if ns.filter == "parts":
        from .models.cnn_parts import CnnPartDetector
        return CnnPartDetector(frame_size)
    raise SystemExit(f"unknown filter {ns.filter}")


def _rects_for_frame(ns, result):
    """Normalize each model family's per-frame result to [(x,y,w,h), ...]."""
    if ns.filter in ("face", "cnn"):
        return [(f.x, f.y, f.w, f.h) for f in result]
    if ns.filter == "tracker":
        return [tuple(int(v) for v in r) for r in result]
    # part detectors: dict type-name -> list of rects
    out = []
    for rects in result.values():
        out.extend(tuple(int(v) for v in r[:4]) for r in rects)
    return out


def _warmup(ns) -> int:
    """Pre-compile the standard engine set into the persistent compilation
    cache so a fresh deployment's first detection is seconds, not minutes
    (ROADMAP known-limit 1: cold-start cost). Run once per machine per
    config; subsequent processes hit the on-disk cache."""
    import time

    W, H = (int(v) for v in ns.size.lower().split("x"))
    batches = [int(b) for b in ns.batches.split(",") if b]
    names = [f for f in ns.warm_filters.split(",") if f]
    t_all = time.time()
    for name in names:
        t0 = time.time()
        model = _make_model(argparse.Namespace(filter=name), (W, H))
        engines = []
        if hasattr(model, "engine"):
            engines.append(model.engine)
        if hasattr(model, "face_engine"):
            engines.append(model.face_engine)
        if hasattr(model, "part_engines"):
            engines.extend(model.part_engines.values())
        for eng in engines:
            for b in batches:
                eng.warmup(batch_size=b)
        if name in ("face", "cnn", "tracker", "parts"):
            # full model path incl. device grouping / NMS / MHI compiles
            for b in batches:
                model.process(np.zeros((b, H, W), np.uint8))
        print(f"warmup {name}: {len(engines)} engines, batches {batches}, "
              f"{time.time() - t0:.0f}s", flush=True)
    print(f"warmup done in {time.time() - t_all:.0f}s", flush=True)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="nubomedia_vca_tpu",
        description=__doc__.splitlines()[0])
    ap.add_argument("filter", choices=(
        "face", "eye", "mouth", "nose", "ear", "tracker", "cnn", "parts",
        "chain", "warmup"))
    ap.add_argument("--input", default=None,
                    help="video URI / file / v4l2 index for cv2.VideoCapture")
    ap.add_argument("--synthetic", action="store_true",
                    help="procedural test clip instead of a video source")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--output", default=None,
                    help="write annotated video here (cv2.VideoWriter)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend (default: CPU)")
    ap.add_argument("--size", default="640x480",
                    help="warmup: frame size WxH")
    ap.add_argument("--batches", default="1,8",
                    help="warmup: comma-separated batch sizes")
    ap.add_argument("--warm-filters", default="face,eye,mouth,tracker",
                    help="warmup: comma-separated filter set")
    ns = ap.parse_args(argv)
    if ns.filter != "warmup" and not ns.synthetic and ns.input is None:
        ap.error("--input or --synthetic required")

    if not ns.tpu:
        from nubomedia_vca_tpu import force_cpu_backend
        force_cpu_backend()

    if ns.filter == "warmup":
        return _warmup(ns)

    gray, src_fps = _read_frames(ns)
    n, H, W = gray.shape
    print(f"{ns.filter}: {n} frames {W}x{H}", flush=True)

    if ns.filter == "chain":
        from .models.face import FaceDetector
        from .models.eye import EyeDetector, EyeDetectorConfig
        from .models.mouth import MouthDetector
        from .pipeline.graph import FilterNode, VcaPipeline
        pipe = (VcaPipeline()
                .add(FilterNode("face", FaceDetector((W, H)), "face",
                                emits=("face",)))
                .add(FilterNode("eye", EyeDetector((W, H), EyeDetectorConfig(
                    detect_event=1)), "eye", consumes={"face"}))
                .add(FilterNode("mouth", MouthDetector((W, H)), "mouth",
                                consumes={"face"})))
        events = pipe.process(gray)
        rects_per_frame = []
        for i in range(n):
            dets = [d for name in ("face", "eye", "mouth")
                    for d in events[name][i].detections]
            print(f"frame {i}: " + "".join(
                f"{d.type}({d.x},{d.y},{d.width},{d.height}) " for d in dets),
                flush=True)
            rects_per_frame.append(
                [(d.x, d.y, d.width, d.height) for d in dets])
    else:
        model = _make_model(ns, (W, H))
        per_frame = model.process(gray)
        rects_per_frame = []
        for i, res in enumerate(per_frame):
            rects = _rects_for_frame(ns, res)
            print(f"frame {i}: " + "".join(f"({x},{y},{w},{h}) "
                                           for x, y, w, h in rects),
                  flush=True)
            rects_per_frame.append(rects)

    if ns.output:
        import cv2
        from .api.render import render_detections
        rendered = np.asarray(render_detections(gray, rects_per_frame))
        vw = cv2.VideoWriter(ns.output, cv2.VideoWriter_fourcc(*"mp4v"),
                             src_fps or 25.0, (W, H))
        for fr in rendered:
            vw.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
        vw.release()
        print(f"wrote {ns.output}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
