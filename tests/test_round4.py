"""Round-4 features: annotated media output over the downscaled-ingest
path (detect work-res luma on device, draw host-side on the retained
full-res BGR frame — the reference's exact shape: detect on the
downscaled copy, annotate img_orig in place,
kmsfacedetect.cpp:805,832-850)."""

import socket
import time

import numpy as np
import pytest

from .fixtures import face_scene

W, H = 640, 480


def _wait(pred, timeout=120.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.1)
    return False


# ------------------------------------------------------------- host twins
def test_host_draw_twins_bit_identical():
    """The numpy host twins (ops/drawing.py *_np) produce BIT-IDENTICAL
    pixels to the device kernels for rects, circles and costume blending —
    including out-of-bounds boxes, overlaps and invalid slots."""
    from nubomedia_vca_tpu.ops.drawing import (
        draw_rectangles, draw_circles, blend_overlay_image,
        draw_rectangles_np, draw_circles_np, blend_overlay_image_np)
    import jax.numpy as jnp

    rng = np.random.RandomState(42)
    B, K = 3, 6
    img = rng.randint(0, 256, (B, 120, 160, 3), np.uint8)
    boxes = np.stack([
        rng.randint(-20, 150, (B, K)),          # x (some off-frame)
        rng.randint(-20, 110, (B, K)),          # y
        rng.randint(1, 80, (B, K)),             # w
        rng.randint(1, 80, (B, K)),             # h
    ], axis=-1).astype(np.int32)
    valid = rng.rand(B, K) < 0.7

    dev = np.asarray(draw_rectangles(jnp.asarray(img), jnp.asarray(boxes),
                                     jnp.asarray(valid), (255, 128, 0)))
    np.testing.assert_array_equal(
        dev, draw_rectangles_np(img, boxes, valid, (255, 128, 0)))

    dev = np.asarray(draw_circles(jnp.asarray(img), jnp.asarray(boxes),
                                  jnp.asarray(valid), (0, 255, 0)))
    np.testing.assert_array_equal(
        dev, draw_circles_np(img, boxes, valid, (0, 255, 0)))

    # gray frames too (rect path writes single channel)
    g = rng.randint(0, 256, (B, 120, 160), np.uint8)
    dev = np.asarray(draw_rectangles(jnp.asarray(g), jnp.asarray(boxes),
                                     jnp.asarray(valid)))
    np.testing.assert_array_equal(dev,
                                  draw_rectangles_np(g, boxes, valid))

    # costume blending: float32 accumulation must match exactly
    rgba = rng.randint(0, 256, (24, 20, 4), np.uint8)
    dev = np.asarray(blend_overlay_image(
        jnp.asarray(img), jnp.asarray(rgba), jnp.asarray(boxes),
        jnp.asarray(valid), -0.2, 0.1, 1.3, 0.8))
    host = blend_overlay_image_np(img, rgba, boxes, valid,
                                  -0.2, 0.1, 1.3, 0.8)
    np.testing.assert_array_equal(dev, host)


# ------------------------------------- combined output+downscale serving
def _run_annotated_pipeline(bgr_frames, downscale):
    """Push BGR frames through listen(channels=3, output=1,
    downscale=downscale) and return the annotated BGR return stream."""
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboFaceDetector

    N = len(bgr_frames)
    pipe = MediaPipeline((W, H))
    NuboFaceDetector(pipe)
    try:
        port = pipe.listen(0, channels=3, output=1, downscale=downscale)
        if downscale:
            # only work-res luma is queued for the device path
            model = pipe.elements[0]._ensure_model()
            assert pipe._runner.ingest.out_w == model.work_w
        with socket.create_connection(("127.0.0.1", port)) as s:
            s.settimeout(600)
            for fr in bgr_frames:
                s.sendall(fr.tobytes())
            buf = b""
            want = N * W * H * 3
            while len(buf) < want:
                chunk = s.recv(min(1 << 20, want - len(buf)))
                assert chunk, "connection closed before annotated frames"
                buf += chunk
        assert _wait(lambda: pipe._runner.frames_sent == N, timeout=10)
    finally:
        pipe.stopMedia()
    return np.frombuffer(buf, np.uint8).reshape(N, H, W, 3)


def test_media_output_downscale_annotated_equals_device_path():
    """listen(channels=3, output=1, downscale=1): only work-res luma
    crosses H2D, annotations land on the retained full-res BGR frame
    host-side — and the drawn pixels are BIT-EQUAL to the full-res
    device-render path (VERDICT r3 item 3 'Done' gate)."""
    gray = face_scene(W, H, faces=((320, 240, 100),), noise=5, seed=1)
    bgr = np.stack([gray,
                    np.clip(gray.astype(np.int32) + 12, 0, 255),
                    np.clip(gray.astype(np.int32) - 15, 0, 255)],
                   axis=-1).astype(np.uint8)
    frames = [bgr] * 3
    down = _run_annotated_pipeline(frames, downscale=True)
    full = _run_annotated_pipeline(frames, downscale=False)
    np.testing.assert_array_equal(down, full)
    # and the annotation is real: the face rectangle was drawn
    diff = (down[0] != bgr).any(axis=-1)
    assert diff.any(), "no annotation drawn"
    np.testing.assert_array_equal(
        down[0][diff], np.broadcast_to((255, 128, 0), (diff.sum(), 3)))


def test_listen_output_downscale_gray_rejected():
    """Gray listeners keep only work-res luma — no full-res canvas to
    annotate, so the combination must still be rejected."""
    from nubomedia_vca_tpu.api.objects import MediaPipeline, NuboFaceDetector

    pipe = MediaPipeline((W, H))
    NuboFaceDetector(pipe)
    with pytest.raises(ValueError):
        pipe.listen(0, channels=1, output=1, downscale=1)
    pipe.stopMedia()


def test_ingest_color_retention_composes_with_downscale():
    """Both ingest implementations retain the FULL-RES color frame while
    downscaling the luma (native + python twins agree)."""
    from nubomedia_vca_tpu.cpp.ingest_binding import (NativeIngest,
                                                      PythonIngest, _LIB)

    gray = face_scene(64, 48, faces=((32, 24, 15),), noise=8, seed=3)
    bgr = np.stack([gray, gray,
                    np.clip(gray.astype(np.int32) + 9, 0, 255)],
                   axis=-1).astype(np.uint8)
    impls = [PythonIngest(64, 48)]
    if _LIB is not None:
        impls.append(NativeIngest(64, 48))
    grays = []
    for ing in impls:
        try:
            ing.set_retain_color(True)
            ing.set_work(32, 24)
            ing.push(0, bgr, pts=5)
            g, c, pts, streams = ing.collect_color(4, wait_ms=1000)
            assert g.shape == (1, 24, 32), "gray must be work-res"
            assert c.shape == (1, 48, 64, 3), "color must be full-res"
            assert pts[0] == 5 and streams[0] == 0
            np.testing.assert_array_equal(c[0], bgr)
            grays.append(g[0])
        finally:
            ing.close()
    if len(grays) == 2:
        np.testing.assert_array_equal(grays[0], grays[1])
