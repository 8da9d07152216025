"""Benchmark: batched 720p face detection throughput per chip.

Measures the flagship device path — exact resize to the 160-wide working
image, equalizeHist, full multiscale Haar face cascade — on batches of 720p
frames, end to end from device-resident uint8 frames to candidate boxes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the reference-era north star of 1000
fps/chip (BASELINE.json; the reference itself publishes no numbers and runs
~30 fps/stream on a CPU core).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml
    from nubomedia_vca_tpu.ops.histogram import equalize_hist
    from nubomedia_vca_tpu.ops.resize import resize_linear_exact
    from tests.fixtures import face_scene  # synthetic but realistic load

    W, H = 1280, 720
    WORK_W = 160
    work_h = int(round(H * WORK_W / W))
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    engine = CascadeEngine(
        load_cascade_xml(
            "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml"),
        (WORK_W, work_h), 1.25)

    @jax.jit
    def step(gray):
        work = equalize_hist(resize_linear_exact(gray, (WORK_W, work_h)))
        return engine._detect_impl(work)

    # frames with faces + noise (face-bearing load, not just empty frames)
    rng = np.random.RandomState(0)
    frames = np.stack([
        face_scene(W, H, faces=((rng.randint(200, 1080),
                                 rng.randint(200, 520), 150),),
                   noise=6, seed=i)
        for i in range(B)
    ])
    gray = jnp.asarray(frames)

    # warmup / compile
    out = step(gray)
    jax.block_until_ready(out)

    n_iter = 100  # async-pipelined steady state (amortizes dispatch RTT)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(gray)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    # correctness canary AFTER timing (a host transfer before the loop
    # degrades all subsequent axon dispatches ~10000x — see memory notes):
    # face-bearing frames must produce detections.
    _, valid, _ = out
    n_det = int(np.asarray(valid).sum())
    if n_det == 0:
        print("WARNING: zero detections on face-bearing frames",
              file=sys.stderr)

    fps = B * n_iter / dt
    print(json.dumps({
        "metric": "face_detect_720p_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
