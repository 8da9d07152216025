"""Real-photograph regression tests (VERDICT round-2 item 6).

The reference processes real camera frames; this zero-egress build
environment ships no media, so these tests run on the real photographs
bundled with installed packages (utils/offline_images.py): the classic
Grace Hopper portrait (one real frontal face) and scikit-learn's
china/flower scenes (face-free real texture). They gate BOTH detector
families on real imagery: the cascade engine must find the real face
(the reference's own model, haarcascade_frontalface_alt on a 160-wide
work image, kmsfacedetect.cpp:26,40), and the shipped CNN checkpoint
must agree with the teacher on the face while staying quiet on face-free
texture. Skipped wherever the sample images are not installed.
"""

import numpy as np
import pytest

from nubomedia_vca_tpu.utils.offline_images import offline_photos


def _gray(photo):
    import cv2

    return cv2.cvtColor(photo.bgr, cv2.COLOR_BGR2GRAY).astype(np.uint8)


@pytest.fixture(scope="module")
def face_photo():
    photos = offline_photos(faces=True)
    if not photos:
        pytest.skip("no face-bearing offline photograph installed")
    return photos[0]


@pytest.fixture(scope="module")
def texture_photos():
    photos = offline_photos(faces=False)
    if not photos:
        pytest.skip("no face-free offline photographs installed")
    return photos


def _teacher_boxes(gray):
    """Cascade detection at the reference's face working width (160)."""
    import jax.numpy as jnp

    from nubomedia_vca_tpu.cascade.engine import get_engine
    from nubomedia_vca_tpu.models.face import DEFAULT_FACE_CASCADE
    from nubomedia_vca_tpu.ops.histogram import equalize_hist
    from nubomedia_vca_tpu.ops.resize import resize_linear_exact

    h, w = gray.shape
    work_w = min(160, w)
    work_h = int(round(h * work_w / w))
    eng = get_engine(DEFAULT_FACE_CASCADE, (work_w, work_h), 1.25)
    work = equalize_hist(resize_linear_exact(
        jnp.asarray(gray)[None], (work_w, work_h)))
    boxes = eng.detect(np.asarray(work)[0], 3)[0]
    if not len(boxes):
        return np.zeros((0, 4), int)
    return np.rint(np.asarray(boxes) * (w / work_w)).astype(int)


def test_cascade_detects_real_face(face_photo):
    """The golden-verified cascade engine finds the real portrait face."""
    boxes = _teacher_boxes(_gray(face_photo))
    assert len(boxes) >= face_photo.n_faces


def test_cnn_checkpoint_real_face_recall(face_photo):
    """The shipped (synthetic-distilled) CNN checkpoint must agree with
    the cascade teacher on the one real face available offline — the
    recall half of the real-image question answerable in this
    environment."""
    from nubomedia_vca_tpu.core.boxes import iou
    from nubomedia_vca_tpu.models.cnn import CnnFaceDetector

    gray = _gray(face_photo)
    t_boxes = _teacher_boxes(gray)
    assert len(t_boxes) >= 1
    det = CnnFaceDetector((gray.shape[1], gray.shape[0]))
    s_boxes = det.detect_boxes(gray)[0]
    assert any(iou(t, s) >= 0.5 for t in t_boxes for s in s_boxes), (
        t_boxes, s_boxes)


def _biggest(boxes):
    return max(boxes, key=lambda b: int(b[2]) * int(b[3]))


def _center_in(box, region, pad_frac=0.15):
    """Box center inside region grown by pad_frac on every side (loose
    containment — part boxes may straddle the teacher face box edge)."""
    cx, cy = box[0] + box[2] / 2.0, box[1] + box[3] / 2.0
    px, py = region[2] * pad_frac, region[3] * pad_frac
    return (region[0] - px <= cx <= region[0] + region[2] + px
            and region[1] - py <= cy <= region[1] + region[3] + py)


def test_real_photo_face_window_parity(face_photo):
    """Window-EXACT OpenCV parity on the REAL photograph (VERDICT r3 #4):
    the engine's raw accepted-window set and every grouped output equal
    the C++ OpenCV golden's on the real 160-wide work image — the same
    bit-parity the synthetic suites gate (test_engine_parity), extended
    to real data."""
    import jax.numpy as jnp

    from nubomedia_vca_tpu.cascade.engine import get_engine
    from nubomedia_vca_tpu.models.face import DEFAULT_FACE_CASCADE
    from nubomedia_vca_tpu.ops.histogram import equalize_hist
    from nubomedia_vca_tpu.ops.resize import resize_linear_exact
    from .golden import opencv_golden as gold

    gray = _gray(face_photo)
    h, w = gray.shape
    work_w = min(160, w)
    work_h = int(round(h * work_w / w))
    work = np.asarray(equalize_hist(resize_linear_exact(
        jnp.asarray(gray)[None], (work_w, work_h))))[0]
    eng = get_engine(DEFAULT_FACE_CASCADE, (work_w, work_h), 1.25)
    for mn in (0, 3):
        want = gold.detect_multi_scale(DEFAULT_FACE_CASCADE, work, 1.25, mn)
        got = eng.detect(work, mn)[0]
        canon = lambda bs: sorted(map(tuple, np.asarray(bs).reshape(-1, 4)
                                      .tolist()))  # noqa: E731
        assert canon(got) == canon(want), mn


def test_part_chain_real_photo(face_photo):
    """The face→eye/mouth/nose chain on a REAL photograph (VERDICT r3 #4).

    The reference ran this chain on live camera frames
    (run_plugin.sh; kmseyedetect.cpp:979-1005, kmsmouthdetect.cpp:858-865,
    kmsnosedetect.cpp:855-865); this is the closest offline equivalent.
    Facts established on THIS image (2026-08-19) with BOTH the repo chain
    and golden OpenCV crop-scans on the repo's exact half-ROIs (they
    agree): the 2splits eye cascades see nothing at part width 320 (the
    face is too small); at 480 and above only the left-half
    lefteye_2splits fires — the right (image-left) eye never fires at any
    width through the work-res chain, golden-corroborated, so the gates
    here are mouth (real smile cascade) and nose (shipped synthetic
    substitute — a real HIT on this photo, recorded in BASELINE.md) at
    the default 320; the eye-at-480 gate is the full-tier
    test_part_chain_real_photo_eye_480 below (the 480x562 part pyramid
    at batch 1 costs minutes of XLA:CPU execution)."""
    from nubomedia_vca_tpu.models.mouth import (MouthDetector,
                                                MouthDetectorConfig)
    from nubomedia_vca_tpu.models.nose import NoseDetector

    gray = _gray(face_photo)
    H, W = gray.shape
    face = _biggest(_teacher_boxes(gray))

    mouth = MouthDetector((W, H), MouthDetectorConfig())
    mouths = mouth.process(gray[None])[0]["mouth"]
    assert len(mouths) >= 1, "real smile cascade must fire on the portrait"
    mb = _biggest(mouths)
    assert _center_in(mb, (face[0], face[1] + face[3] // 2,
                           face[2], face[3] // 2)), (mb, face)

    nose = NoseDetector((W, H))      # shipped synthetic substitute
    noses = nose.process(gray[None])[0]["nose"]
    assert len(noses) >= 1, "synthetic nose XML hits this portrait (probed)"
    for nb in noses:
        assert _center_in(nb, tuple(face)), (nb, face)


@pytest.mark.full
def test_part_chain_real_photo_eye_480(face_photo):
    """Full tier: the real 2splits eye gate of the chain — at part width
    480 lefteye_2splits fires on the portrait and lands in the upper
    image-right half of the face (split out of the default-tier chain
    test purely for cost; the fact itself is golden-corroborated by
    test_part_chain_real_photo_eye_golden_corroboration)."""
    from nubomedia_vca_tpu.models.eye import EyeDetector, EyeDetectorConfig

    gray = _gray(face_photo)
    H, W = gray.shape
    face = _biggest(_teacher_boxes(gray))
    eye = EyeDetector((W, H), EyeDetectorConfig(width_to_process=480))
    eyes = eye.process(gray[None])[0]
    assert len(eyes["eye_left"]) >= 1, eyes
    el = _biggest(eyes["eye_left"])
    # upper face, left-of-center half (global original coords)
    assert _center_in(el, (face[0] + face[2] // 2, face[1],
                           face[2] // 2, int(face[3] * 0.60))), (el, face)


@pytest.mark.full
def test_part_chain_real_photo_eye_golden_corroboration(face_photo):
    """Full tier: golden OpenCV crop-scan on the repo's EXACT eye
    half-ROIs of the real photo corroborates the repo chain at part
    width 640 (clamped to the 512-wide original): right half empty in
    BOTH, left eye found by BOTH at IoU >= 0.75 (the residual gap is
    crop-grid alignment — detectMultiScale's window grid starts at the
    crop origin, the repo's whole-frame grid at the frame origin, so
    marginal boxes shift a few px; probed golden (291,163,37,37) vs repo
    (287,163,37,37))."""
    import jax.numpy as jnp

    from nubomedia_vca_tpu.models.eye import EyeDetector, EyeDetectorConfig
    from nubomedia_vca_tpu.models.parts import cv_round
    from nubomedia_vca_tpu.ops.histogram import equalize_hist
    from nubomedia_vca_tpu.ops.resize import resize_linear_exact
    from .golden import opencv_golden as gold

    gray = _gray(face_photo)
    H, W = gray.shape
    det = EyeDetector((W, H), EyeDetectorConfig(width_to_process=640))
    eyes = det.process(gray[None])[0]
    assert len(eyes["eye_right"]) == 0, eyes
    assert len(eyes["eye_left"]) >= 1, eyes
    el = _biggest(eyes["eye_left"])

    def prep(w, h):
        return np.asarray(equalize_hist(resize_linear_exact(
            jnp.asarray(gray)[None], (w, h))))[0]

    from nubomedia_vca_tpu.models.face import DEFAULT_FACE_CASCADE
    faces = gold.detect_multi_scale(
        DEFAULT_FACE_CASCADE, prep(det.face_w, det.face_h),
        1.0 + det.config.multi_scale_factor / 100.0,
        det.FACE_MIN_NEIGHBORS, det.FACE_MIN_SIZE)
    assert len(faces) == 1
    part_img = prep(det.part_w, det.part_h)
    s = det.scale_f2p
    fx, fy, fw, fh = faces[0].tolist()
    rx, ry = cv_round(fx * s), cv_round(fy * s)
    rw, rh = cv_round(fw * s), cv_round(fh * s)
    top, down = cv_round(rh * 25 / 100), cv_round(rh * 40 / 100)
    golden_eyes = {}
    for label, roi in (("right", (rx, ry + top, rw // 2, rh - top - down)),
                       ("left", (rx + rw // 2, ry + top, rw // 2,
                                 rh - top - down))):
        x0, y0 = max(0, roi[0]), max(0, roi[1])
        x1 = min(det.part_w, roi[0] + roi[2])
        y1 = min(det.part_h, roi[1] + roi[3])
        d = gold.detect_multi_scale(
            det._part_cascade_paths[label], part_img[y0:y1, x0:x1],
            det.PART_SCALE_FACTOR, det.PART_MIN_NEIGHBORS,
            det.PART_MIN_SIZE)
        so = det.scale_p2o
        golden_eyes[label] = [tuple(int(round(v * so)) for v in
                                    (x0 + x, y0 + y, ww, hh))
                              for (x, y, ww, hh) in d.tolist()]
    assert golden_eyes["right"] == [], golden_eyes
    assert len(golden_eyes["left"]) >= 1, golden_eyes

    def iou(a, b):
        iw = max(0, min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0]))
        ih = max(0, min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1]))
        inter = iw * ih
        return inter / max(a[2] * a[3] + b[2] * b[3] - inter, 1e-9)

    assert max(iou(el, g) for g in golden_eyes["left"]) >= 0.75, (
        el, golden_eyes)


def test_cnn_checkpoint_real_texture_fps(texture_photos):
    """False positives on real face-free texture stay bounded at the
    serving threshold — a REGRESSION bound at the measured value of the
    shipped checkpoint (tools/real_eval.py --builtin; round-3b textured
    retrain measured 4: two dark-pagoda hits on china.jpg, two petal
    hits on flower.jpg — down from 9 before the bokeh/rosette/terrain/
    patchwork training families). Tighten alongside checkpoint
    improvements; the cascade teacher's own count on these photos is 0."""
    from nubomedia_vca_tpu.models.cnn import CnnFaceDetector

    total = 0
    for p in texture_photos:
        gray = _gray(p)
        det = CnnFaceDetector((gray.shape[1], gray.shape[0]))
        total += len(det.detect_boxes(gray)[0])
    assert total <= 4, total
