"""Real-photograph MOTION tests: the tracker and the media-plane serving
path on real pixels.

Round-3 review noted that while the cascade/CNN detectors were
regression-gated on the offline real photographs, the motion tracker and
the media-plane serving loop had only ever seen synthetic frames. The
reference ran both on live camera video (nubo_tracker run_plugin.sh:4
plays /opt/video/car.avi through nubotracker; the detectors ran on
v4l2src webcam frames). These tests build the closest offline
equivalents from the real photographs bundled with installed packages
(utils/offline_images.py):

  * a motion clip of the real portrait face crop translating across a
    real natural-scene background (china.jpg) for the MHI tracker
    (gstnubotracker.cpp:339-421 semantics), and
  * the real portrait letterboxed to the suite's standard 640x480 frame
    pushed through the full media-plane serving loop with annotated
    output over the downscaled-ingest path (detect work-res luma,
    annotate the retained full-res frame — kmsfacedetect.cpp:805,832-850).

Frame sizes reuse the suite's standard shapes (320x240 tracker,
640x480 media loop) so no new XLA pyramid programs are compiled.
Skipped wherever the sample images are not installed.
"""

import socket
import time

import numpy as np
import pytest

from nubomedia_vca_tpu.utils.offline_images import offline_photos

W, H = 640, 480


def _wait(pred, timeout=120.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.1)
    return False


@pytest.fixture(scope="module")
def face_photo():
    photos = offline_photos(faces=True)
    if not photos:
        pytest.skip("no face-bearing offline photograph installed")
    return photos[0]


@pytest.fixture(scope="module")
def texture_photo():
    photos = offline_photos(faces=False)
    if not photos:
        pytest.skip("no face-free offline photographs installed")
    return photos[0]


def _letterbox(bgr, w, h):
    """Fit-preserving resize onto a w x h canvas (real pixels, suite's
    standard frame size — shares all cached device programs)."""
    import cv2

    h0, w0 = bgr.shape[:2]
    s = min(w / w0, h / h0)
    nw, nh = int(round(w0 * s)), int(round(h0 * s))
    canvas = np.zeros((h, w, 3), np.uint8)
    x0, y0 = (w - nw) // 2, (h - nh) // 2
    canvas[y0:y0 + nh, x0:x0 + nw] = cv2.resize(
        bgr, (nw, nh), interpolation=cv2.INTER_AREA)
    return canvas


def _real_motion_clip(face_photo, texture_photo, n=10, step=18):
    """Real portrait crop translating over a real-scene background."""
    import cv2

    bg = cv2.cvtColor(cv2.resize(texture_photo.bgr, (320, 240)),
                      cv2.COLOR_BGR2GRAY)
    crop = cv2.cvtColor(face_photo.bgr, cv2.COLOR_BGR2GRAY)[100:420, 120:400]
    crop = cv2.resize(crop, (64, 64), interpolation=cv2.INTER_AREA)
    clip, rects = [], []
    for i in range(n):
        fr = bg.copy()
        x = 20 + step * i
        fr[90:154, x:x + 64] = crop
        clip.append(fr)
        rects.append((x, 90, 64, 64))
    return np.stack(clip), rects


def test_tracker_real_photo_motion(face_photo, texture_photo):
    """The MHI tracker segments and follows a REAL face crop moving over
    a REAL natural scene: every frame after warmup yields at least one
    motion blob whose box overlaps the current paste position (the MHI
    trail may extend the blob behind the motion, never ahead of it)."""
    from nubomedia_vca_tpu.models.tracker import Tracker

    clip, rects = _real_motion_clip(face_photo, texture_photo)
    res = Tracker((320, 240)).process(clip)
    assert res[0] == []                       # no previous frame yet
    for i in range(1, len(clip)):
        assert len(res[i]) >= 1, (i, res)
        x, y, w, h = rects[i]
        hit = False
        for (bx, by, bw, bh) in res[i]:
            ix = min(bx + bw, x + w) - max(bx, x)
            iy = min(by + bh, y + h) - max(by, y)
            if ix > 0 and iy > 0 and ix * iy >= 0.5 * w * h:
                hit = True
        assert hit, (i, rects[i], res[i])


def test_tracker_real_scene_static_quiet(texture_photo):
    """A static real scene (high-frequency texture, zero motion) must
    produce zero blobs — the threshold/MHI chain sees no change."""
    import cv2

    from nubomedia_vca_tpu.models.tracker import Tracker

    bg = cv2.cvtColor(cv2.resize(texture_photo.bgr, (320, 240)),
                      cv2.COLOR_BGR2GRAY)
    res = Tracker((320, 240)).process(np.stack([bg] * 6))
    assert all(r == [] for r in res)


def test_cli_tracker_real_video_file(face_photo, texture_photo, tmp_path):
    """The run_plugin.sh file-playback analog on REAL pixels: the
    real-motion clip is encoded to an actual video file, decoded back
    through the CLI's cv2.VideoCapture path (the reference's
    `uridecodebin uri=file:///opt/video/car.avi ! nubotracker` pipeline,
    nubo_tracker run_plugin.sh:4), tracked, and re-encoded annotated."""
    import contextlib
    import io

    import cv2

    from nubomedia_vca_tpu import cli

    clip, _ = _real_motion_clip(face_photo, texture_photo)
    src = str(tmp_path / "motion.mp4")
    vw = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                         (320, 240))
    for fr in clip:
        vw.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
    vw.release()

    out_file = str(tmp_path / "annotated.mp4")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["tracker", "--input", src, "--frames", "10",
                       "--output", out_file])
    assert rc == 0
    text = buf.getvalue()
    assert "tracker: 10 frames" in text
    # codec noise must not defeat the motion threshold: the moving real
    # crop still yields blobs on most post-warmup frames
    n_hit = sum(1 for i in range(1, 10)
                if f"frame {i}: (" in text)
    assert n_hit >= 5, text
    import os
    assert os.path.getsize(out_file) > 0


def test_media_plane_annotated_real_photo(face_photo):
    """The full serving loop on the REAL portrait: BGR frames in over
    TCP with downscaled ingest (only work-res luma crosses H2D), face
    detected live on device, annotation drawn on the retained full-res
    frame, annotated BGR out + OnFace server events — and the drawn
    rectangle lands on the real face (bbox-of-changed-pixels vs the
    independently computed teacher box)."""
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboFaceDetector
    from nubomedia_vca_tpu.core.boxes import iou

    bgr = _letterbox(face_photo.bgr, W, H)
    N = 3
    events = []
    pipe = MediaPipeline((W, H))
    face = NuboFaceDetector(pipe)
    face.activateServerEvents(1, 1)
    face.addEventListener("OnFace", events.append)
    try:
        port = pipe.listen(0, channels=3, output=1, downscale=1)
        model = pipe.elements[0]._ensure_model()
        assert pipe._runner.ingest.out_w == model.work_w
        with socket.create_connection(("127.0.0.1", port)) as s:
            s.settimeout(600)
            for _ in range(N):
                s.sendall(bgr.tobytes())
            buf = b""
            want = N * W * H * 3
            while len(buf) < want:
                chunk = s.recv(min(1 << 20, want - len(buf)))
                assert chunk, "connection closed before annotated frames"
                buf += chunk
        assert _wait(lambda: events, timeout=30), "no OnFace on real photo"
    finally:
        pipe.stopMedia()
    out = np.frombuffer(buf, np.uint8).reshape(N, H, W, 3)

    # teacher: the same cascade engine run standalone on the frame's luma
    import cv2
    import jax.numpy as jnp

    from nubomedia_vca_tpu.cascade.engine import get_engine
    from nubomedia_vca_tpu.models.face import DEFAULT_FACE_CASCADE
    from nubomedia_vca_tpu.ops.histogram import equalize_hist
    from nubomedia_vca_tpu.ops.resize import resize_linear_exact

    gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    eng = get_engine(DEFAULT_FACE_CASCADE, (160, 120), 1.25)
    work = equalize_hist(resize_linear_exact(jnp.asarray(gray)[None],
                                             (160, 120)))
    tb = eng.detect(np.asarray(work)[0], 3)[0]
    assert len(tb) >= 1
    teacher = np.rint(np.asarray(tb)[0] * (W / 160)).astype(int)

    diff = (out[-1] != bgr).any(axis=-1)
    assert diff.any(), "no annotation drawn on the real portrait"
    ys, xs = np.nonzero(diff)
    drawn = (xs.min(), ys.min(), xs.max() - xs.min() + 1,
             ys.max() - ys.min() + 1)
    assert iou(drawn, teacher) >= 0.7, (drawn, teacher)
    # event box agrees with the teacher too
    infos = events[0]["faceInfo"]
    assert infos, events[0]
    eb = (infos[0].x, infos[0].y, infos[0].width, infos[0].height)
    assert iou(eb, teacher) >= 0.7, (eb, teacher)
