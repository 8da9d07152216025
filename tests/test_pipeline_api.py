"""Pipeline chaining, overlay rendering, events, and the JSON-RPC/WebSocket
API surface."""

import base64
import hashlib
import json
import socket
import struct
import threading
import time

import numpy as np
import pytest
import jax.numpy as jnp

from nubomedia_vca_tpu.ops.drawing import (
    draw_rectangles, draw_circles, blend_overlay_image,
)
from nubomedia_vca_tpu.pipeline.events import (
    Detection, DetectionEvent, to_wire_string, parse_wire_string,
    EventRateLimiter,
)
from nubomedia_vca_tpu.pipeline.graph import FilterNode, VcaPipeline
from nubomedia_vca_tpu.models.face import FaceDetector, FaceDetectorConfig
from nubomedia_vca_tpu.models.eye import EyeDetector, EyeDetectorConfig
from nubomedia_vca_tpu.models.tracker import Tracker
from nubomedia_vca_tpu.api.objects import (
    MediaPipeline, NuboFaceDetector, NuboTracker, Info,
)
from nubomedia_vca_tpu.api.rpc import VcaRpcServer

from .fixtures import face_clip, moving_blob_clip, FACE_XML


# ------------------------------------------------------------------ drawing
def test_draw_rectangles():
    img = jnp.zeros((1, 64, 64), jnp.uint8)
    boxes = jnp.asarray([[[10, 10, 20, 20], [0, 0, 0, 0]]], jnp.int32)
    valid = jnp.asarray([[True, False]])
    out = np.asarray(draw_rectangles(img, boxes, valid, color=(255,)))
    assert out[0, 10, 15] == 255        # top border
    assert out[0, 20, 20] == 0          # interior untouched
    assert out.sum() > 0


def test_draw_circles():
    img = jnp.zeros((1, 64, 64), jnp.uint8)
    boxes = jnp.asarray([[[20, 20, 16, 16]]], jnp.int32)
    valid = jnp.asarray([[True]])
    out = np.asarray(draw_circles(img, boxes, valid, color=(200,)))
    assert out[0, 20, 28] == 200        # top of circle
    assert out[0, 28, 28] == 0          # center untouched


def test_blend_overlay():
    img = jnp.full((1, 64, 64, 3), 100, jnp.uint8)
    ov = np.zeros((8, 8, 4), np.uint8)
    ov[:, :, 0] = 255          # pure red...
    ov[:, :, 3] = 255          # ...fully opaque
    boxes = jnp.asarray([[[16, 16, 16, 16]]], jnp.int32)
    valid = jnp.asarray([[True]])
    out = np.asarray(blend_overlay_image(img, jnp.asarray(ov), boxes, valid))
    assert tuple(out[0, 20, 20]) == (255, 0, 0)
    assert tuple(out[0, 5, 5]) == (100, 100, 100)


# ------------------------------------------------------------------- events
def test_wire_string_roundtrip():
    dets = [Detection("face", 1, 2, 30, 40), Detection("face", 9, 8, 7, 6)]
    s = to_wire_string(dets)
    assert s == "x:1,y:2,width:30,height:40;x:9,y:8,width:7,height:6;"
    back = parse_wire_string(s, "face")
    assert [(d.x, d.y, d.width, d.height) for d in back] == \
        [(1, 2, 30, 40), (9, 8, 7, 6)]


def test_rate_limiter():
    clock = [0.0]
    rl = EventRateLimiter(1000, clock=lambda: clock[0])
    assert rl.ready()
    assert not rl.ready()
    clock[0] = 1.5
    assert rl.ready()


# ----------------------------------------------------------------- pipeline
def test_face_to_eye_chaining():
    """Face filter feeds boxes downstream; event-gated eye consumes them."""
    clip = face_clip(2)
    face = FilterNode("face", FaceDetector((640, 480)), "face",
                      emits=("face",))
    eye_model = EyeDetector((640, 480), EyeDetectorConfig(
        right_cascade_path=FACE_XML, left_cascade_path=FACE_XML,
        detect_event=1, width_to_process=160))
    eye = FilterNode("eye", eye_model, "eye", consumes={"face"},
                     emits=("eye_left", "eye_right"))
    pipe = VcaPipeline().add(face).add(eye)
    out = pipe.process(clip)
    assert len(out["face"]) == 2 and len(out["eye"]) == 2
    assert len(out["face"][0].detections) >= 1
    assert out["face"][0].detections[0].type == "face"
    # gated eye actually processed (budget fed by the face event)
    assert eye_model.gate.budget >= 0


def test_tracker_in_pipeline():
    clip = moving_blob_clip(4)
    node = FilterNode("tracker", Tracker((320, 240)), "tracker",
                      emits=("tracker",))
    out = VcaPipeline().add(node).process(clip)
    assert len(out["tracker"]) == 4


# ---------------------------------------------------------------------- api
def test_face_object_methods_and_events():
    pipe = MediaPipeline((640, 480))
    fd = NuboFaceDetector(pipe)
    fd.multiScaleFactor(25)
    fd.widthToProcess(160)
    fd.showFaces(1)
    fd.trackThreshold(40)
    fd.activateServerEvents(1, 0)   # no rate limiting
    got = []
    fd.addEventListener("OnFace", got.append)
    res = fd.process(face_clip(1))
    assert len(res) == 1 and len(res[0]) == 1
    assert len(got) == 1
    infos = got[0]["faceInfo"]
    assert isinstance(infos[0], Info) and infos[0].name == "face"
    assert "x:" in got[0]["wire"]


def test_tracker_object():
    pipe = MediaPipeline((320, 240))
    tr = NuboTracker(pipe)
    tr.setThreshold(20)
    tr.setMinArea(50)
    tr.setMaxArea(30000)
    tr.setDistance(35)
    res = tr.process(moving_blob_clip(4))
    assert len(res) == 4


# ------------------------------------------------------------ websocket rpc
class _WsClient:
    def __init__(self, host, port):
        self.sock = socket.create_connection((host, port), timeout=10)
        key = base64.b64encode(b"0123456789abcdef").decode()
        self.sock.sendall((
            f"GET / HTTP/1.1\r\nHost: {host}\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n").encode())
        data = b""
        while b"\r\n\r\n" not in data:
            data += self.sock.recv(4096)
        assert b"101" in data.split(b"\r\n")[0]
        self._buf = b""

    def send(self, obj):
        payload = json.dumps(obj).encode()
        mask = b"\x01\x02\x03\x04"
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        n = len(payload)
        if n < 126:
            hdr = struct.pack(">BB", 0x81, 0x80 | n)
        else:
            hdr = struct.pack(">BBH", 0x81, 0x80 | 126, n)
        self.sock.sendall(hdr + mask + masked)

    def recv(self):
        def read_exact(n):
            while len(self._buf) < n:
                chunk = self.sock.recv(4096)
                if not chunk:
                    raise ConnectionError
                self._buf += chunk
            out, self._buf = self._buf[:n], self._buf[n:]
            return out

        b1, b2 = read_exact(2)
        length = b2 & 0x7F
        if length == 126:
            length = struct.unpack(">H", read_exact(2))[0]
        elif length == 127:
            length = struct.unpack(">Q", read_exact(8))[0]
        payload = read_exact(length)
        return json.loads(payload.decode())

    def call(self, method, params):
        rid = int(time.time() * 1000) % 100000
        self.send({"jsonrpc": "2.0", "id": rid, "method": method,
                   "params": params})
        while True:
            msg = self.recv()
            if msg.get("id") == rid:
                return msg


def test_rpc_server_end_to_end():
    srv = VcaRpcServer(port=0, frame_size=(640, 480)).start()
    try:
        cli = _WsClient("127.0.0.1", srv.port)
        assert cli.call("ping", {})["result"]["value"] == "pong"
        pipe_id = cli.call("create", {"type": "MediaPipeline"})["result"]["value"]
        fd_id = cli.call("create", {
            "type": "NuboFaceDetector",
            "constructorParams": {"mediaPipeline": pipe_id}})["result"]["value"]
        r = cli.call("invoke", {"object": fd_id,
                                "operation": "multiScaleFactor",
                                "operationParams": {"scaleFactor": 25}})
        assert "error" not in r
        r = cli.call("invoke", {"object": fd_id,
                                "operation": "activateServerEvents",
                                "operationParams": {"activate": 1, "time": 0}})
        assert "error" not in r
        sub = cli.call("subscribe", {"object": fd_id, "type": "OnFace"})
        assert "error" not in sub
        # feed frames host-side (media ingest is outside the RPC plane)
        srv.objects[fd_id].process(face_clip(1))
        evt = cli.recv()
        assert evt.get("method") == "onEvent"
        assert evt["params"]["value"]["type"] == "OnFace"
        # unknown operation → error
        r = cli.call("invoke", {"object": fd_id, "operation": "nope"})
        assert "error" in r
    finally:
        srv.stop()


def test_tracker_to_face_to_eye_chain():
    """Motion-gated face detection (kmsfacedetect.cpp:698-707): the face
    node with detect-event=1 idles until the tracker emits motion, then
    spends its 10-frame budget; its boxes feed the gated eye node."""
    from nubomedia_vca_tpu.models.tracker import Tracker

    clip = face_clip(4, w=640, h=480)
    tracker = FilterNode("tracker", Tracker((640, 480)), "tracker",
                         emits=("tracker",))
    face_model = FaceDetector((640, 480), FaceDetectorConfig(detect_event=1))
    face = FilterNode("face", face_model, "face", consumes={"tracker"},
                      emits=("face",))
    eye_model = EyeDetector((640, 480), EyeDetectorConfig(
        right_cascade_path=FACE_XML, left_cascade_path=FACE_XML,
        detect_event=1, width_to_process=160))
    eye = FilterNode("eye", eye_model, "eye", consumes={"face"},
                     emits=("eye_left", "eye_right"))

    # without motion the gated face node stays idle
    static = np.repeat(clip[:1], 4, axis=0)
    pipe = VcaPipeline().add(face)
    out = pipe.process(static)
    assert all(len(ev.detections) == 0 for ev in out["face"])

    # full chain on a moving clip: tracker → motion events → face → eye
    face_model2 = FaceDetector((640, 480), FaceDetectorConfig(detect_event=1))
    face2 = FilterNode("face", face_model2, "face", consumes={"tracker"},
                       emits=("face",))
    pipe = VcaPipeline().add(tracker).add(face2).add(eye)
    out = pipe.process(clip)
    n_motion = sum(len(ev.detections) > 0 for ev in out["tracker"])
    assert n_motion >= 1, "fixture must produce motion"
    n_faces = sum(len(ev.detections) > 0 for ev in out["face"])
    assert n_faces >= 1, "motion events must un-gate the face detector"
    assert face_model2.gate.enabled and len(out["eye"]) == 4


def test_overlay_http_fetch_hook():
    """http(s) overlay URIs decode through the (injectable) fetch hook —
    the libsoup-download path of kmsfacedetect.cpp:375-425."""
    import cv2
    from nubomedia_vca_tpu.api.render import load_overlay_image

    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[:, :, 1] = 200
    rgba[:, :, 3] = 255
    ok, png = cv2.imencode(".png", rgba)
    assert ok
    calls = []

    def fake_fetch(url):
        calls.append(url)
        return bytes(png)

    img = load_overlay_image("http://cdn.example/costume.png",
                             fetch=fake_fetch)
    assert calls == ["http://cdn.example/costume.png"]
    assert img.shape == (8, 8, 4) and img[0, 0, 3] == 255


def test_cnn_remote_object():
    """The learned-detector module as a remote object: exact Kurento shape
    (create → knobs → process → OnFace payload), f32 and int8 modes."""
    from nubomedia_vca_tpu.api.objects import (
        MediaPipeline, NuboCnnFaceDetector)
    from nubomedia_vca_tpu.models import distill

    rng = np.random.RandomState(5)
    scenes = np.stack([distill.make_scene(rng) for _ in range(4)])

    pipe = MediaPipeline((distill.W, distill.H))
    det = NuboCnnFaceDetector(pipe)
    det.activateServerEvents(1, 1)
    det.setThreshold(0.5)
    got = []
    det.addEventListener("OnFace", got.append)
    res = det.process(scenes)
    assert len(res) == 4
    total = sum(len(r) for r in res)
    assert total >= 1      # the scenes contain drawn faces
    assert got and got[0]["type"] == "OnFace" and "wire" in got[0]

    det.setQuantized(1)    # int8 serving mode rebuilds the model
    res8 = det.process(scenes)
    assert len(res8) == 4 and sum(len(r) for r in res8) >= 1
