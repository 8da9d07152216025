"""Multi-stream serving demo: N simulated camera streams push frames into
the native ingest feeder; the batching scheduler assembles static-size
device batches, runs the face pipeline, and routes detections back per
stream — the TPU replacement for the reference's one-GStreamer-pipeline-
per-stream deployment model.

    python examples/serving_demo.py [--tpu] [--streams 6] [--frames 12]
"""

import argparse
import os
import sys
import threading
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--streams", type=int, default=6)
    ap.add_argument("--frames", type=int, default=12)
    args = ap.parse_args()

    if not args.tpu:
        from nubomedia_vca_tpu import force_cpu_backend
        force_cpu_backend()
    import numpy as np
    from fixtures import face_scene
    from nubomedia_vca_tpu.models.face import FaceDetector
    from nubomedia_vca_tpu.pipeline.scheduler import StreamFeeder
    from nubomedia_vca_tpu.utils.tracing import TRACER

    W, H = 640, 480
    feeder = StreamFeeder(W, H, batch=8)
    fd = FaceDetector((W, H))

    # producers: each stream pushes frames with its face at a distinct spot
    def producer(sid):
        for t in range(args.frames):
            frame = face_scene(
                W, H, faces=((260 + 30 * (sid % 5), 230 + 2 * t, 150),),
                noise=5, seed=sid * 100 + t)
            feeder.push(sid, frame, pts=t)
            time.sleep(0.002)

    threads = [threading.Thread(target=producer, args=(s,))
               for s in range(args.streams)]
    for t in threads:
        t.start()

    results = defaultdict(list)
    done = threading.Event()

    def consume():
        total = args.streams * args.frames
        seen = 0
        while seen < total and not done.wait(0):
            nb = feeder.next_batch()
            if nb is None:
                time.sleep(0.002)
                continue
            frames, pts, streams, n = nb
            dets = fd.detect_boxes(frames)
            for i in range(n):
                results[int(streams[i])].append(
                    (int(pts[i]), dets[i].tolist()))
                seen += 1

    t0 = time.perf_counter()
    consume()
    dt = time.perf_counter() - t0
    for t in threads:
        t.join()

    nframes = sum(len(v) for v in results.values())
    print(f"processed {nframes} frames from {len(results)} streams "
          f"in {dt:.2f}s ({nframes / dt:.0f} fps aggregate)")
    for sid in sorted(results)[:4]:
        pts, dets = results[sid][-1]
        print(f"  stream {sid}: last frame pts={pts} faces={dets}")
    print(TRACER.report())


if __name__ == "__main__":
    main()
