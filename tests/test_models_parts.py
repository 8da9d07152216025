"""Heavy part-detector end-to-end tests (split from test_models.py so the
per-file xdist workers spread the expensive sf=1.1 pyramid executions
across processes; see pyproject addopts).

Widths: the ear/eye tests run their part engines at width 160 — the flip
mirroring and event-fed-faces semantics are width-independent and 160
quarters the window count of the default 320 (the reference offers the
same 160/320/480/640 `width-to-process` choices, kmseyedetect.cpp:24-25).
The mouth recompute keeps the default 320: its scene's small inner faces
are what the FACE_XML stand-in "mouth" cascade detects, and they fall
below the 20 px cascade window at 160."""

import numpy as np
import cv2
import jax.numpy as jnp

from nubomedia_vca_tpu.models.eye import EyeDetector, EyeDetectorConfig
from nubomedia_vca_tpu.models.mouth import MouthDetector, MouthDetectorConfig
from nubomedia_vca_tpu.models.ear import EarDetector, EarDetectorConfig
from nubomedia_vca_tpu.ops.resize import resize_linear_exact

from .fixtures import face_scene, FACE_XML
from .golden import opencv_golden as gold


def make_work(img, w, h):
    work = np.asarray(resize_linear_exact(jnp.asarray(img[None]), (w, h)))[0]
    return cv2.equalizeHist(work)


def test_ear_flip_coordinates():
    """Right-side detections come from the flipped image and must be
    mirrored back to true coordinates (kmseardetect.cpp:796-803)."""
    img = face_scene(640, 480, faces=((320, 240, 150),), noise=5, seed=4)
    cfg = EarDetectorConfig(face_cascade_path=FACE_XML,
                            ear_cascade_path=FACE_XML,
                            width_to_process=160)
    det = EarDetector((640, 480), cfg)
    res = det.process(img)[0]
    # the (symmetric) cartoon face is found in both orientations and both
    # profile reports land on the same true position
    assert len(res["face_profile"]) == 2
    xs = sorted(x + w / 2 for (x, y, w, h) in res["face_profile"])
    assert abs(xs[0] - xs[1]) < 16
    assert all(abs(cx - 320) < 30 for cx in xs)


def test_mouth_end_to_end_recompute():
    """Full-path equality: detector output == independent host recomputation
    from REAL OpenCV golden candidates on the same scene."""
    from nubomedia_vca_tpu.models.parts import Roi, cv_round
    from nubomedia_vca_tpu.ops.grouping import group_rectangles_np
    img = face_scene(640, 480,
                     faces=((320, 240, 150), (235, 192, 44), (370, 192, 44),
                            (320, 330, 50)), noise=5, seed=4)
    det = MouthDetector((640, 480),
                        MouthDetectorConfig(mouth_cascade_path=FACE_XML))
    res = det.process(img)[0]
    faces = det._faces_from_raw(det._device_pass(img)[0], 0)
    work = make_work(img, det.part_w, det.part_h)
    cands = gold.detect_multi_scale(FACE_XML, work, 1.1, 0)
    s = det.scale_f2p
    want = []
    for (fx, fy, fw, fh) in faces:
        half_h = cv_round(fh / 1.8)
        roi = Roi(cv_round(fx * s), cv_round((fy + half_h) * s),
                  cv_round(fw * s), cv_round(half_h * s)).clip(
            det.part_w, det.part_h)
        inside = [c for c in cands if roi.contains_box(c)]
        if not inside:
            continue
        g = group_rectangles_np(np.array(inside), det.PART_MIN_NEIGHBORS)
        out = [tuple(map(int, r)) for r in g]
        if out:
            out = [max(out, key=lambda r: r[2] * r[3])]
        want.extend(det._to_original(out))
    assert len(faces) == 1          # scene yields exactly the big face
    assert sorted(res["mouth"]) == sorted(want)


def test_eye_event_fed_faces():
    """detect-event path: face boxes supplied externally skip the face pass."""
    det = EyeDetector((640, 480), EyeDetectorConfig(
        right_cascade_path=FACE_XML, left_cascade_path=FACE_XML,
        detect_event=1, width_to_process=160))
    img = face_scene(640, 480, faces=((320, 240, 150),), noise=5, seed=4)
    det.gate.feed_event()
    face = np.array([[160, 80, 304, 304]])   # original coords
    res = det.process(img, face_boxes=[face])
    assert isinstance(res[0], dict) and "eye_right" in res[0]
