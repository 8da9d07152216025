"""Annotated-stream demo — the reference's run_plugin.sh experience, live.

The reference pipes a camera through the filter into autovideosink and you
watch the rectangles (`nubo_face/.../run_plugin.sh:3`). Here: a pipeline
with a face detector opens its media port with output=1, we stream frames
in over TCP, and the SAME connection returns the annotated GRAY8 frames —
optionally piped straight into ffplay.

    python examples/annotated_stream_demo.py            # summary only
    python examples/annotated_stream_demo.py --ffplay   # watch it live
"""

import socket
import subprocess
import sys
import threading

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from nubomedia_vca_tpu import force_cpu_backend  # noqa: E402

force_cpu_backend()   # drop this line to run on the TPU backend

from nubomedia_vca_tpu.api.objects import (  # noqa: E402
    MediaPipeline, NuboFaceDetector)
from nubomedia_vca_tpu.models.synth import draw_face, _noise_bg  # noqa: E402

W, H, N = 640, 480, 24


def make_clip():
    rng = np.random.RandomState(7)
    frames = []
    for t in range(N):
        img = _noise_bg(rng, W, H)
        draw_face(img, 260 + 5 * t, 240, 110)
        frames.append(img)
    return frames


def main():
    use_ffplay = "--ffplay" in sys.argv
    pipe = MediaPipeline((W, H))
    NuboFaceDetector(pipe)
    port = pipe.listen(0, output=1)
    print(f"media port (full-duplex): {port}")

    clip = make_clip()
    sink = None
    if use_ffplay:
        sink = subprocess.Popen(
            ["ffplay", "-loglevel", "error", "-f", "rawvideo",
             "-pixel_format", "gray", "-video_size", f"{W}x{H}",
             "-framerate", "8", "-i", "pipe:0"],
            stdin=subprocess.PIPE)

    try:
        with socket.create_connection(("127.0.0.1", port)) as s:
            s.settimeout(600)

            def feeder():
                for fr in clip:
                    s.sendall(fr.tobytes())

            threading.Thread(target=feeder, daemon=True).start()
            changed = 0
            for i in range(N):
                buf = b""
                while len(buf) < W * H:
                    chunk = s.recv(W * H - len(buf))
                    if not chunk:
                        raise RuntimeError("connection closed early")
                    buf += chunk
                out = np.frombuffer(buf, np.uint8).reshape(H, W)
                diff = int((out != clip[i]).sum())
                changed += diff > 0
                if sink is not None:
                    sink.stdin.write(buf)
                    sink.stdin.flush()
            print(f"{N} annotated frames returned; "
                  f"{changed} carried drawn detections")
    finally:
        pipe.stopMedia()
        if sink is not None:
            sink.stdin.close()
            sink.wait()
    return 0


if __name__ == "__main__":
    sys.exit(main())
