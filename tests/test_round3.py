"""Round-3 behavior tests: state-preserving live setters, per-stream
temporal state, tracker visual_mode, media-plane output, ingest downscale,
and tracker→face gating in the serving loop.

Reference behaviors matched: g_object_set on a live element preserves
state (kmsfacedetect.cpp:504-582); one element per pipeline = per stream;
visual_mode draw gate (gstnubotracker.cpp:383-390); annotated frames
continue downstream (kmsfacedetect.cpp:857-898); CPU-side downscale before
detection (kmsfacedetect.cpp:805); motion events refuel the face gate
(kmsfacedetect.cpp:698-707).
"""

import socket
import time

import numpy as np
import pytest

from .fixtures import face_scene, face_clip, FACE_XML

W, H = 640, 480


def _wait(pred, timeout=120.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.1)
    return False


# --------------------------------------------------- state-preserving setters
def test_rpc_setters_preserve_track_state():
    """Mid-stream RPC setters apply to the LIVE model: track IDs and the
    FaceTracks object survive (the old behavior rebuilt the model and
    silently reset temporal state)."""
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboFaceDetector

    pipe = MediaPipeline((W, H))
    face = NuboFaceDetector(pipe)
    frame = face_scene(W, H, faces=((320, 240, 100),), noise=5, seed=1)
    clip = np.stack([frame] * 6)
    r1 = face.process(clip[:3])
    ids1 = sorted(f.id for f in r1[-1])
    assert ids1, "fixture face not detected"
    model = face._ensure_model()
    tracks_obj = model.tracks[0]

    face.showFaces(0)            # knob changes mid-stream...
    face.trackThreshold(45)
    face.euclideanDistance(9)

    r2 = face.process(clip[3:])
    assert face._ensure_model() is model, "model was rebuilt"
    assert face._ensure_model().tracks[0] is tracks_obj, "tracks reset"
    assert sorted(f.id for f in r2[-1]) == ids1, "track IDs did not survive"
    cfg = face._ensure_model().config
    assert cfg.track_threshold == 45 and cfg.view == 0


def test_reconfigure_swaps_engine_keeps_tracks():
    """Geometry knobs swap the (cached, stateless) engine on the live
    model; temporal state is untouched. No detection runs — engine
    construction is host-side table building."""
    from nubomedia_vca_tpu.models.face import FaceDetector

    det = FaceDetector((W, H))
    old_engine = det.engine
    tracks = det.tracks
    cfg = det.config
    cfg.width_to_process = 320
    det.reconfigure(cfg)
    assert det.work_w == 320 and det.scale_back == 2.0
    assert det.engine is not old_engine
    assert det.tracks is tracks
    # reverting restores the SAME cached engine object
    cfg.width_to_process = 160
    det.reconfigure(cfg)
    assert det.engine is old_engine


def test_reconfigure_updates_gop_and_gate():
    from nubomedia_vca_tpu.models.face import FaceDetector, FaceDetectorConfig

    det = FaceDetector((W, H))
    det.gop.counter = 7
    cfg = det.config
    cfg.process_x_every_4_frames = 2
    cfg.detect_event = 1
    det.reconfigure(cfg)
    assert det.gop.x == 2 and det.gop.counter == 7   # policy new, clock kept
    assert det.gate.enabled


def test_cnn_multi_scale_finds_small_faces():
    """Two-scale inference (320+640 working widths) recovers faces smaller
    than ~2 grid cells that the single-scale pass misses (round-2 VERDICT
    weak item 3)."""
    from nubomedia_vca_tpu.models.cnn import CnnFaceDetector
    from nubomedia_vca_tpu.models import distill

    W2, H2 = 320, 240
    rng = np.random.RandomState(5)
    scenes = []
    for _ in range(8):
        img = np.full((H2, W2), int(rng.randint(90, 150)), np.uint8)
        s = int(rng.randint(14, 22))   # 1-2 grid cells at stride 16
        distill._draw_face(img, int(rng.randint(s, W2 - s)),
                           int(rng.randint(s, H2 - s)), s, rng)
        scenes.append(np.clip(img.astype(np.int32)
                              + rng.randint(-5, 6, img.shape),
                              0, 255).astype(np.uint8))
    scenes = np.stack(scenes)
    single = CnnFaceDetector((W2, H2)).detect_boxes(scenes)
    multi = CnnFaceDetector((W2, H2), multi_scale=True).detect_boxes(scenes)
    n_single = sum(1 for b in single if len(b))
    n_multi = sum(1 for b in multi if len(b))
    # the round-3b retrain (textured/edge-clip scenes) lifted single-scale
    # small-face recall to 8/8 on this fixture, so multi-scale can only
    # match it here; it must never do WORSE, and must stay near-perfect
    assert n_multi >= n_single, (n_single, n_multi)
    assert n_multi >= 6   # round-3 checkpoint measured 30/32 vs 11/32


def test_cnn_detect_event_gating():
    """detectByEvent/processXevery4Frames are LIVE on the CNN detector
    (same GOP/gate schedule as the cascade face detector) — they were
    dead knobs before round 3's review pass."""
    from nubomedia_vca_tpu.models.cnn import CnnFaceDetector
    from nubomedia_vca_tpu.models import distill

    W2, H2 = 320, 240
    rng = np.random.RandomState(1)
    img = np.full((H2, W2), 120, np.uint8)
    distill._draw_face(img, 160, 120, 60, rng)
    clip = np.stack([img] * 4)
    det = CnnFaceDetector((W2, H2), detect_event=1)
    out = det.process(clip)
    assert all(len(f) == 0 for f in out), "gated detector ran with no event"
    out = det.process(clip, events=[object(), None, None, None])
    assert any(len(f) > 0 for f in out), "event did not refuel the gate"


def test_cnn_set_multi_scale_live():
    from nubomedia_vca_tpu.api.objects import (MediaPipeline,
                                               NuboCnnFaceDetector)

    pipe = MediaPipeline((W, H))
    det = NuboCnnFaceDetector(pipe)
    m = det._ensure_model()
    det.setMultiScale(1)
    assert det._ensure_model() is m and m.multi_scale is True


def test_cnn_quantized_swap_preserves_tracks():
    from nubomedia_vca_tpu.api.objects import (MediaPipeline,
                                               NuboCnnFaceDetector)
    from nubomedia_vca_tpu.models.quant import QuantizedCnnFaceDetector

    pipe = MediaPipeline((W, H))
    det = NuboCnnFaceDetector(pipe)
    m1 = det._ensure_model()
    tracks = m1.tracks
    det.setQuantized(1)
    m2 = det._ensure_model()
    assert isinstance(m2, QuantizedCnnFaceDetector)
    assert m2.tracks is tracks
    det.setThreshold(0.7)
    assert det._ensure_model() is m2 and m2.threshold == 0.7


# ------------------------------------------------------- per-stream state
def test_part_detector_per_stream_merge_state():
    from nubomedia_vca_tpu.models.mouth import (MouthDetector,
                                                MouthDetectorConfig)

    det = MouthDetector((W, H), MouthDetectorConfig(
        mouth_cascade_path=FACE_XML))
    box = (100, 100, 40, 20)
    det._active = det._stream_state(0)
    assert det._merge_consecutive("mouth", [box], 4) == [box]
    # stream 1 has its own empty state
    det._active = det._stream_state(1)
    assert det._merge_consecutive("mouth", [], 4) == []
    # stream 0's anti-vibration box survived stream 1's activity
    det._active = det._stream_state(0)
    assert det._merge_consecutive("mouth", [], 4) == [box]


def test_tracker_per_stream_state_isolation():
    """Two interleaved streams through ONE tracker give exactly the
    results of running each stream through its own tracker."""
    from nubomedia_vca_tpu.models.tracker import Tracker
    from .fixtures import moving_blob_clip

    clip_a = moving_blob_clip(6, seed=3)
    clip_b = moving_blob_clip(6, seed=9)

    solo_a = Tracker((320, 240)).process(clip_a)
    solo_b = Tracker((320, 240)).process(clip_b)

    shared = Tracker((320, 240))
    mixed_a, mixed_b = [], []
    for i in range(6):   # interleave frame by frame
        mixed_a.extend(shared.process(clip_a[i], stream=0))
        mixed_b.extend(shared.process(clip_b[i], stream=1))
    assert mixed_a == solo_a
    assert mixed_b == solo_b


# ------------------------------------------------------- tracker visual_mode
def test_tracker_visual_mode_gates_rendering():
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboTracker

    pipe = MediaPipeline((64, 64))
    tr = NuboTracker(pipe)
    frames = np.full((1, 64, 64), 100, np.uint8)
    results = [[(10, 10, 30, 30)]]
    out = np.asarray(tr.render(frames, results))
    assert np.array_equal(out, frames), "visual_mode=0 must not draw"
    tr.setVisualMode(1)
    out2 = np.asarray(tr.render(frames, results))
    assert not np.array_equal(out2, frames), "visual_mode=1 must draw"


# --------------------------------------------------------- media-plane output
def test_media_output_annotated_frames_over_tcp():
    """The annotated-stream product: push N frames over TCP, read back N
    GRAY8 frames that differ from the input exactly at the drawn
    rectangles (kmsfacedetect.cpp:857-898; run_plugin.sh:3)."""
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboFaceDetector

    N = 4
    pipe = MediaPipeline((W, H))
    NuboFaceDetector(pipe)
    frame = face_scene(W, H, faces=((320, 240, 100),), noise=5, seed=1)
    try:
        port = pipe.listen(0, output=1)
        with socket.create_connection(("127.0.0.1", port)) as s:
            s.settimeout(600)
            for _ in range(N):
                s.sendall(frame.tobytes())
            # keep the write side open while reading back (the writer
            # drains per-connection queues in input order)
            buf = b""
            while len(buf) < N * W * H:
                chunk = s.recv(min(1 << 20, N * W * H - len(buf)))
                assert chunk, "connection closed before all annotated frames"
                buf += chunk
        out = np.frombuffer(buf, np.uint8).reshape(N, H, W)
        # the writer can deliver the last frame's bytes before the runner
        # thread increments the counter — poll instead of asserting raw
        assert _wait(lambda: pipe._runner.frames_sent == N, timeout=10)
    finally:
        pipe.stopMedia()

    for i in range(N):
        diff = out[i] != frame
        assert diff.any(), "no annotation drawn"
        # changed pixels are the rectangle border (drawn value = color[0])
        assert (out[i][diff] == 0).all()
        # ... and confined to the face neighborhood
        ys, xs = np.nonzero(diff)
        assert xs.min() > 120 and xs.max() < 520, "draw outside face region"
        assert ys.min() > 40 and ys.max() < 440


# -------------------------------------------------------- ingest downscale
def test_ingest_downscale_bit_exact():
    """Downscale-at-push is bit-exact with ops/resize.resize_linear_exact
    (native C++ table scheme mirrors the Python one)."""
    import jax.numpy as jnp
    from nubomedia_vca_tpu.cpp.ingest_binding import make_ingest
    from nubomedia_vca_tpu.ops.resize import resize_linear_exact

    frame = face_scene(W, H, faces=((300, 220, 90),), noise=30, seed=7)
    ing = make_ingest(W, H)
    ing.set_work(160, 120)
    try:
        ing.push(0, frame, pts=0)
        got, _, _ = ing.collect(1, min_frames=1, wait_ms=2000)
        assert got.shape == (1, 120, 160)
        want = np.asarray(resize_linear_exact(jnp.asarray(frame), (160, 120)))
        np.testing.assert_array_equal(got[0], want)
    finally:
        ing.close()


def test_detect_on_ingest_downscaled_equals_full_res():
    """With ingest downscale to the model's working resolution, the device
    resize becomes an identity and detections are UNCHANGED — the 36× H2D
    cut costs nothing."""
    import jax.numpy as jnp
    from nubomedia_vca_tpu.models.face import FaceDetector
    from nubomedia_vca_tpu.ops.resize import resize_linear_exact

    clip = face_clip(4, W, H)
    fd = FaceDetector((W, H))
    full = fd.detect_boxes(clip)
    work = np.asarray(resize_linear_exact(
        jnp.asarray(clip), (fd.work_w, fd.work_h)))
    down = fd.detect_boxes(work)
    for a, b in zip(full, down):
        np.testing.assert_array_equal(a, b)


def test_media_loop_downscale_serving():
    """Serving loop with downscale=1: only working-resolution luma crosses
    H2D; events still flow."""
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboFaceDetector

    pipe = MediaPipeline((W, H))
    face = NuboFaceDetector(pipe)
    face.activateServerEvents(1, 1)
    evs = []
    face.addEventListener("OnFace", evs.append)
    frame = face_scene(W, H, faces=((320, 240, 100),), noise=5, seed=1)
    try:
        port = pipe.listen(0, downscale=1)
        assert pipe._runner.ingest.out_w == face._ensure_model().work_w
        with socket.create_connection(("127.0.0.1", port)) as s:
            for _ in range(4):
                s.sendall(frame.tobytes())
            assert _wait(lambda: evs, timeout=300), "no OnFace event"
    finally:
        pipe.stopMedia()
    assert "width" in evs[0]["wire"]


def test_listen_output_with_downscale_rejected():
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboFaceDetector

    pipe = MediaPipeline((W, H))
    NuboFaceDetector(pipe)
    with pytest.raises(ValueError):
        pipe.listen(0, output=1, downscale=1)
    pipe.stopMedia()


def test_checkpoint_roundtrips_per_stream_state():
    """snapshot/restore covers EVERY stream's temporal state (round 3 made
    part/tracker state per-stream; the snapshot must follow)."""
    from nubomedia_vca_tpu.models.mouth import (MouthDetector,
                                                MouthDetectorConfig)
    from nubomedia_vca_tpu.models.tracker import Tracker
    from nubomedia_vca_tpu.utils.checkpoint import (snapshot_detector,
                                                    restore_detector)
    from .fixtures import moving_blob_clip, FACE_XML

    det = MouthDetector((W, H), MouthDetectorConfig(
        mouth_cascade_path=FACE_XML))
    det._active = det._stream_state(0)
    det._merge_consecutive("mouth", [(10, 10, 20, 20)], 4)
    det._active = det._stream_state(3)
    det._merge_consecutive("mouth", [(50, 50, 30, 30)], 4)
    snap = snapshot_detector(det)
    det2 = MouthDetector((W, H), MouthDetectorConfig(
        mouth_cascade_path=FACE_XML))
    restore_detector(det2, snap)
    assert det2._stream_state(0).prev["mouth"] == [(10, 10, 20, 20)]
    assert det2._stream_state(3).prev["mouth"] == [(50, 50, 30, 30)]

    tr = Tracker((320, 240))
    clip = moving_blob_clip(3)
    tr.process(clip, stream=0)
    tr.process(clip, stream=2)
    snap = snapshot_detector(tr)
    tr2 = Tracker((320, 240))
    restore_detector(tr2, snap)
    assert set(tr2._states) == {0, 2}
    assert tr2._frame_idx[2] == 3
    np.testing.assert_array_equal(np.asarray(tr2._states[2].mhi),
                                  np.asarray(tr._states[2].mhi))


def test_media_listener_i420_framing():
    """channels=-1 frames the I420/NV12 wire format (W*H*3/2 bytes); the
    leading luma plane is what the detectors consume (SURVEY.md §5:
    host↔device transfer of I420/NV12 frames)."""
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboFaceDetector

    pipe = MediaPipeline((W, H))
    face = NuboFaceDetector(pipe)
    face.activateServerEvents(1, 1)
    evs = []
    face.addEventListener("OnFace", evs.append)
    luma = face_scene(W, H, faces=((320, 240, 100),), noise=5, seed=1)
    chroma = np.full(W * H // 2, 128, np.uint8)   # flat U+V tail
    i420 = luma.tobytes() + chroma.tobytes()
    try:
        port = pipe.listen(0, channels=-1)
        with socket.create_connection(("127.0.0.1", port)) as s:
            for _ in range(4):
                s.sendall(i420)
            assert _wait(lambda: evs, timeout=300), "no event from I420 feed"
    finally:
        pipe.stopMedia()
    assert "width" in evs[0]["wire"]


# ------------------------------------------- tracker→face gating (serving)
def test_serving_loop_tracker_refuels_face_gate():
    """A tracker element's motion events refuel a downstream face
    detector's detect-event gate inside the serving loop
    (kmsfacedetect.cpp:698-707): static frames → face idles; motion →
    face detects."""
    from nubomedia_vca_tpu.api.objects import (MediaPipeline, NuboTracker,
                                               NuboFaceDetector)
    import cv2

    W2, H2 = 320, 240
    base = face_scene(W2, H2, faces=((160, 120, 70),), noise=0, seed=0)
    pipe = MediaPipeline((W2, H2))
    NuboTracker(pipe)                     # registered first: upstream
    face = NuboFaceDetector(pipe)
    face.detectByEvent(1)
    face.activateServerEvents(1, 1)
    evs = []
    face.addEventListener("OnFace", evs.append)
    try:
        # phase 1: static frames — no motion, gate stays empty
        for i in range(4):
            pipe.pushFrame(base, pts=i)
        assert _wait(lambda: pipe.framesProcessed() >= 4, timeout=300)
        assert not evs, "face detector ran without a motion event"
        # phase 2: a moving blob appears — motion events refuel the gate
        for i in range(6):
            fr = base.copy()
            cv2.circle(fr, (30 + 12 * i, 200), 12, 255, -1)
            pipe.pushFrame(fr, pts=4 + i)
        assert _wait(lambda: evs, timeout=300), \
            "motion did not refuel the face gate"
    finally:
        pipe.stopMedia()
    assert "width" in evs[0]["wire"]


# ---------------------------------------------------- color media-plane output
def test_media_output_color_annotated_frames_over_tcp():
    """BGR in → annotated BGR out: listen(channels=3, output=1) retains the
    color frame at ingest, detections are drawn ON THE COLOR FRAME in the
    reference's colors[1] = CV_RGB(0,128,255) (BaseFace.cpp:70-82,
    kmsfacedetect.cpp:144-151), and the annotated color stream returns on
    the same connection — the reference's primary product
    (kmsfacedetect.cpp:857-898 mutates the color frame in place)."""
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboFaceDetector

    N = 3
    pipe = MediaPipeline((W, H))
    NuboFaceDetector(pipe)
    gray = face_scene(W, H, faces=((320, 240, 100),), noise=5, seed=1)
    # tinted BGR frame (channels differ → chroma preservation is observable)
    bgr = np.stack([gray,
                    np.clip(gray.astype(np.int32) + 12, 0, 255),
                    np.clip(gray.astype(np.int32) - 15, 0, 255)],
                   axis=-1).astype(np.uint8)
    try:
        port = pipe.listen(0, channels=3, output=1)
        with socket.create_connection(("127.0.0.1", port)) as s:
            s.settimeout(600)
            for _ in range(N):
                s.sendall(bgr.tobytes())
            buf = b""
            want = N * W * H * 3
            while len(buf) < want:
                chunk = s.recv(min(1 << 20, want - len(buf)))
                assert chunk, "connection closed before all annotated frames"
                buf += chunk
        out = np.frombuffer(buf, np.uint8).reshape(N, H, W, 3)
        assert _wait(lambda: pipe._runner.frames_sent == N, timeout=10)
        assert pipe._runner.stats()["colorOutput"]
    finally:
        pipe.stopMedia()

    for i in range(N):
        diff = (out[i] != bgr).any(axis=-1)
        assert diff.any(), "no annotation drawn"
        # every changed pixel carries the reference rectangle color
        np.testing.assert_array_equal(
            out[i][diff], np.broadcast_to((255, 128, 0),
                                          (diff.sum(), 3)))
        # chroma everywhere else is preserved bit-exactly
        assert np.array_equal(out[i][~diff], bgr[~diff])
        # and the draw is confined to the face neighborhood
        ys, xs = np.nonzero(diff)
        assert xs.min() > 120 and xs.max() < 520
        assert ys.min() > 40 and ys.max() < 440


def test_python_ingest_color_retention_matches_native():
    """PythonIngest.collect_color mirrors the native ABI: gray for
    detection + retained tight BGR, zero-filled when retention was off."""
    from nubomedia_vca_tpu.cpp.ingest_binding import (NativeIngest,
                                                     PythonIngest, _LIB)

    gray = face_scene(64, 48, faces=((32, 24, 15),), noise=8, seed=3)
    bgr = np.stack([gray, gray, np.clip(gray.astype(np.int32) + 9, 0, 255)],
                   axis=-1).astype(np.uint8)
    impls = [PythonIngest(64, 48)]
    if _LIB is not None:
        impls.append(NativeIngest(64, 48))
    outs = []
    for ing in impls:
        try:
            ing.set_retain_color(True)
            ing.push(0, bgr, pts=7)
            g, c, pts, streams = ing.collect_color(4, wait_ms=1000)
            assert g.shape == (1, 48, 64) and c.shape == (1, 48, 64, 3)
            assert pts[0] == 7 and streams[0] == 0
            np.testing.assert_array_equal(c[0], bgr)
            # retention off → zero-filled color plane
            ing.set_retain_color(False)
            ing.push(0, bgr, pts=8)
            g2, c2, _, _ = ing.collect_color(4, wait_ms=1000)
            assert (c2 == 0).all()
            np.testing.assert_array_equal(g2, g)
            outs.append(g[0])
        finally:
            ing.close()
    if len(outs) == 2:   # python and native gray conversions agree
        np.testing.assert_array_equal(outs[0], outs[1])
