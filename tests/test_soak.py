"""Opt-in serving soak (VCA_SOAK=1): memory stability of the full-duplex
media loop under sustained load with a slow reader.

Not part of the default suite (adds ~2 min); run explicitly:

    VCA_SOAK=1 python -m pytest tests/test_soak.py -q

Measured baseline (this harness, CPU backend): VmRSS oscillates within
~±110 MB of the post-warmup base across 2400+ frames — no growth trend;
input drop-oldest and the bounded per-connection output queue absorb a
producer ~15x faster than the consumer without unbounded memory.
"""

import gc
import os
import socket
import time

import numpy as np
import pytest

from .fixtures import face_scene

W, H = 640, 480


def _vmrss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return 0


@pytest.mark.skipif(not os.environ.get("VCA_SOAK"),
                    reason="soak test: set VCA_SOAK=1")
def test_media_loop_memory_stable_under_soak():
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboFaceDetector

    pipe = MediaPipeline((W, H))
    NuboFaceDetector(pipe)
    port = pipe.listen(0, output=1)
    fb = face_scene(W, H, faces=((320, 240, 100),),
                    noise=5, seed=1).tobytes()

    def soak(n, s):
        sent = 0
        t0 = time.time()
        while sent < n and time.time() - t0 < 300:
            try:
                s.sendall(fb)
                sent += 1
            except BlockingIOError:
                time.sleep(0.005)
            try:
                while s.recv(1 << 20):
                    pass
            except BlockingIOError:
                pass
        return sent

    def wait_drained():
        t0 = time.time()
        while pipe.getStats()["pending"] > 0 and time.time() - t0 < 120:
            time.sleep(0.2)

    try:
        with socket.create_connection(("127.0.0.1", port)) as s:
            s.setblocking(False)
            soak(300, s)          # warmup: compiles + steady state
            wait_drained()
            gc.collect()
            base = _vmrss_mb()
            for _ in range(2):
                soak(600, s)
                wait_drained()
            gc.collect()
            final = _vmrss_mb()
        stats = pipe.getStats()
    finally:
        pipe.stopMedia()
    assert stats["outDropped"] == 0 or stats["framesSent"] > 0
    assert final - base < 300, \
        f"RSS grew {final - base}MB over the soak (base {base}MB)"
