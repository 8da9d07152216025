"""Core box ops, rendering, IDL emission, sharded detection, color."""

import json
import os

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from nubomedia_vca_tpu.core.boxes import (
    centers, areas, iou_matrix, contains, pad_boxes, scale_boxes,
)
from nubomedia_vca_tpu.ops.color import yuv420_to_bgr, rgb_to_gray
from nubomedia_vca_tpu.api.idl import emit_all, MODULES
from nubomedia_vca_tpu.api.render import render_detections, load_overlay_image


def test_boxes_helpers():
    a = jnp.asarray([[0, 0, 10, 10], [5, 5, 10, 10]], jnp.int32)
    c = np.asarray(centers(a))
    assert c.tolist() == [[5, 5], [10, 10]]
    assert np.asarray(areas(a)).tolist() == [100, 100]
    m = np.asarray(iou_matrix(a, a))
    assert np.allclose(np.diag(m), 1.0)
    assert 0.1 < m[0, 1] < 0.2      # 25/175
    inside = np.asarray(contains(jnp.asarray([[0, 0, 12, 12]], jnp.int32), a))
    assert inside.tolist() == [[True, False]]
    b, v = pad_boxes(np.array([[1, 2, 3, 4]]), 4)
    assert b.shape == (4, 4) and v.tolist() == [True, False, False, False]
    s = np.asarray(scale_boxes(a, 2.5))
    assert s[1].tolist() == [12, 12, 25, 25]   # cvRound half-even


def test_yuv_to_bgr_shapes(rng):
    y = rng.randint(0, 256, (1, 8, 8)).astype(np.uint8)
    u = np.full((1, 4, 4), 128, np.uint8)
    v = np.full((1, 4, 4), 128, np.uint8)
    bgr = np.asarray(yuv420_to_bgr(jnp.asarray(y), jnp.asarray(u),
                                   jnp.asarray(v)))
    # neutral chroma → gray-ish bgr equal to Y
    assert bgr.shape == (1, 8, 8, 3)
    assert np.abs(bgr.astype(int) - y[..., None].astype(int)).max() <= 1


def test_idl_emission(tmp_path):
    files = emit_all(str(tmp_path))
    assert len(files) == len(MODULES)
    face = json.load(open(os.path.join(
        tmp_path, "nubofacedetector.NuboFaceDetector.kmd.json")))
    rc = face["remoteClasses"][0]
    names = {m["name"] for m in rc["methods"]}
    # exact reference method names present
    for want in ("showFaces", "detectByEvent", "sendMetaData",
                 "multiScaleFactor", "processXevery4Frames",
                 "widthToProcess", "euclideanDistance", "trackThreshold",
                 "areaThreshold", "activateServerEvents",
                 "setOverlayedImage", "unsetOverlayedImage"):
        assert want in names, want
    assert face["events"][0]["name"] == "OnFace"
    ct = face["complexTypes"][0]
    assert ct["name"] == "FaceInfo"
    assert [p["name"] for p in ct["properties"]] == \
        ["name", "x", "y", "width", "height"]
    tracker = json.load(open(os.path.join(
        tmp_path, "nubotracker.NuboTracker.kmd.json")))
    tnames = {m["name"] for m in tracker["remoteClasses"][0]["methods"]}
    for want in ("setThreshold", "setMinArea", "setMaxArea", "setDistance",
                 "setVisualMode", "activateServerEvents"):
        assert want in tnames


def test_render_detections_gray_and_overlay(tmp_path, rng):
    frames = rng.randint(0, 100, (2, 48, 64)).astype(np.uint8)
    rects = [[(10, 10, 20, 20)], []]
    out = np.asarray(render_detections(frames, rects))
    assert out.shape == frames.shape
    assert (out[0] != frames[0]).any() and (out[1] == frames[1]).all()

    ov = np.zeros((8, 8, 4), np.uint8)
    ov[:, :, 1] = 255
    ov[:, :, 3] = 128   # half transparent
    p = os.path.join(tmp_path, "ov.png")
    cv2.imwrite(p, ov)
    rgba = load_overlay_image(p)
    assert rgba.shape == (8, 8, 4)
    out2 = np.asarray(render_detections(
        frames, rects, overlay=(rgba, (0.0, 0.0, 1.0, 1.0))))
    assert out2.shape == (2, 48, 64, 3)


def test_sharded_detect_multi_device():
    from nubomedia_vca_tpu.parallel.mesh import make_mesh
    from nubomedia_vca_tpu.parallel.sharded import make_sharded_detect
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml
    from .fixtures import FACE_XML

    mesh = make_mesh(n_data=4, n_model=2)
    eng = CascadeEngine(load_cascade_xml(FACE_XML), (64, 48), 1.25)
    detect = make_sharded_detect(eng, mesh)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (8, 48, 64), np.uint8))
    boxes, valid, ovf = detect(frames)
    # result matches the unsharded engine
    b2, v2, _ = eng.detect_raw(frames)
    assert np.array_equal(np.asarray(valid), np.asarray(v2))
    assert np.array_equal(np.asarray(boxes), np.asarray(b2))


def test_rgb_vs_bgr_gray(rng):
    img = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    g1 = np.asarray(rgb_to_gray(jnp.asarray(img)))
    want = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    assert np.array_equal(g1, want)


def test_live_tcp_ingest_bridge():
    """Raw-video TCP listener (gst tcpclientsink / ffmpeg rawvideo wire
    format): one connection per stream, fixed-size frames pushed with
    per-stream pts. Exercises native and python implementations alike."""
    import socket
    import time
    from nubomedia_vca_tpu.cpp.ingest_binding import make_ingest

    W_, H_ = 32, 24
    ing = make_ingest(W_, H_, capacity=16)
    port = ing.listen(0, channels=1)
    f0 = np.arange(W_ * H_, dtype=np.uint8).reshape(H_, W_)
    f1 = (f0 + 7).astype(np.uint8)
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        s.sendall(f0.tobytes())
        s.sendall(f1.tobytes())
        deadline = time.time() + 5
        while ing.pending() < 2 and time.time() < deadline:
            time.sleep(0.01)
    frames, pts, streams = ing.collect(4, min_frames=2, wait_ms=2000)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], f0)
    np.testing.assert_array_equal(frames[1], f1)
    assert list(pts) == [0, 1] and list(streams) == [0, 0]
    # BGR wire format converts to gray at push
    ing.stop_listen()
    ing.close()


def test_sharded_serving_multi_stream():
    """Serving shape on the virtual 8-device mesh: the StreamFeeder
    assembles one static batch from 8 streams, the FULL device program
    (cascade + grouping) runs sharded over 'data', and per-stream grouped
    boxes equal the unsharded engine's (SURVEY.md §2.5: stream scheduler +
    sharded detection + all-gathered results)."""
    from nubomedia_vca_tpu.parallel.mesh import make_mesh
    from nubomedia_vca_tpu.parallel.sharded import make_sharded_detect_grouped
    from nubomedia_vca_tpu.pipeline.scheduler import StreamFeeder
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml
    from .fixtures import FACE_XML, face_scene

    W, H = 96, 72
    mesh = make_mesh(n_data=8, n_model=1)
    eng = CascadeEngine(load_cascade_xml(FACE_XML), (W, H), 1.25)
    detect = make_sharded_detect_grouped(eng, mesh, 2)

    feeder = StreamFeeder(W, H, batch=8)
    for s in range(8):
        feeder.push(s, face_scene(W, H, faces=((48, 36, 24),), noise=7,
                                  seed=s), pts=s)
    frames, pts, streams, n_real = feeder.next_batch()
    assert frames.shape == (8, H, W) and n_real == 8

    boxes, valid, weights, ovf = detect(jnp.asarray(frames))
    b2, v2, w2, _ = eng.detect_grouped(jnp.asarray(frames), 2)
    assert np.array_equal(np.asarray(valid), np.asarray(v2))
    assert np.array_equal(np.asarray(boxes), np.asarray(b2))
    assert np.array_equal(np.asarray(weights), np.asarray(w2))
    # route grouped boxes back per stream
    per_stream = {int(streams[i]): np.asarray(boxes[i][np.asarray(valid[i])])
                  for i in range(8)}
    assert len(per_stream) == 8


def test_cli_tracker_synthetic(tmp_path):
    """The run_plugin.sh-analog CLI end-to-end: synthetic clip → tracker →
    stdout detections + annotated video file."""
    import contextlib
    import io

    from nubomedia_vca_tpu import cli

    out_file = str(tmp_path / "out.mp4")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["tracker", "--synthetic", "--frames", "6",
                       "--output", out_file])
    assert rc == 0
    text = buf.getvalue()
    assert "tracker: 6 frames" in text and "frame 5:" in text
    import os
    assert os.path.getsize(out_file) > 0
