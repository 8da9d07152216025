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
