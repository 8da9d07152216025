"""Cascade engine parity vs the real OpenCV 4.6 detectMultiScale (C++ golden).

Strongest claim: for non-tilted cascades (frontal face, profile face, eye)
the raw accepted-window sets are EQUAL to OpenCV's, and so are all grouped
outputs. For tilted cascades the golden itself has a SIMD lane-aliasing bug
(docs/OPENCV_PARITY.md), so parity is asserted at grouped-output IoU level.
"""

import numpy as np
import pytest

from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml
from nubomedia_vca_tpu.cascade.engine import CascadeEngine

from .fixtures import (
    face_scene, FACE_XML, PROFILE_XML, EYE_XML, LEFT_EYE_XML, SMILE_XML,
)
from .golden import opencv_golden as gold


def canon(a):
    return sorted(map(tuple, np.asarray(a).reshape(-1, 4).tolist()))


def iou(a, b):
    ax1, ay1, ax2, ay2 = a[0], a[1], a[0] + a[2], a[1] + a[3]
    bx1, by1, bx2, by2 = b[0], b[1], b[0] + b[2], b[1] + b[3]
    iw = max(0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union else 0.0


SCENE_640 = face_scene()
SCENE_320 = face_scene(320, 240, faces=((110, 100, 55), (240, 150, 38)),
                       noise=4, seed=2)


@pytest.fixture(scope="module")
def face_engine():
    return CascadeEngine(load_cascade_xml(FACE_XML), (640, 480), 1.25)


def test_face_full_parity_window_exact(face_engine):
    """Raw candidates AND all grouped outputs equal OpenCV's exactly."""
    for mn in (0, 2, 3):
        want = gold.detect_multi_scale(FACE_XML, SCENE_640, 1.25, mn)
        got = face_engine.detect(SCENE_640, mn)[0]
        assert canon(got) == canon(want), mn


def test_face_batched_consistent(face_engine):
    imgs = np.stack([SCENE_640, face_scene(seed=9), SCENE_640])
    outs = face_engine.detect(imgs, 3)
    assert canon(outs[0]) == canon(outs[2])
    for i, img in enumerate(imgs):
        want = gold.detect_multi_scale(FACE_XML, img, 1.25, 3)
        assert canon(outs[i]) == canon(want)


def test_face_no_overflow(face_engine):
    _, _, ovf = face_engine.detect_raw(SCENE_640)
    assert not np.asarray(ovf).any()


def test_iou_gate_vs_golden(face_engine):
    """BASELINE.json acceptance metric: bbox IoU >= 0.95 vs OpenCV."""
    want = gold.detect_multi_scale(FACE_XML, SCENE_640, 1.25, 3)
    got = face_engine.detect(SCENE_640, 3)[0]
    assert len(want) == len(got) == 2
    for w in want:
        assert max(iou(w, g) for g in got) >= 0.95


# one sf=1.1 deep-pyramid window-exact surface stays in the default tier
# (eye); the profile variant exercises the identical mechanism and runs in
# the nightly full tier (VERDICT r4 item 3: default tier <= 10 min)
@pytest.mark.parametrize("xml,sf", [
    pytest.param(PROFILE_XML, 1.1, marks=pytest.mark.full),
    (EYE_XML, 1.1),
])
def test_parts_window_exact(xml, sf):
    eng = CascadeEngine(load_cascade_xml(xml), (320, 240), sf)
    for mn in (0, 2):
        want = gold.detect_multi_scale(xml, SCENE_320, sf, mn)
        got = eng.detect(SCENE_320, mn)[0]
        assert canon(got) == canon(want), (xml, mn)


def test_other_scale_factor_parity():
    """multi-scale-factor knob changes pyramid geometry; still window-exact."""
    eng = CascadeEngine(load_cascade_xml(FACE_XML), (320, 240), 1.2)
    scene = face_scene(320, 240, faces=((160, 120, 80),), noise=5, seed=6)
    for mn in (0, 3):
        want = gold.detect_multi_scale(FACE_XML, scene, 1.2, mn)
        got = eng.detect(scene, mn)[0]
        assert canon(got) == canon(want), mn


def test_min_max_size_pyramid_parity(face_engine):
    """min/max size knobs reproduce OpenCV's level selection."""
    eng = CascadeEngine(load_cascade_xml(FACE_XML), (640, 480), 1.25,
                        min_size=(40, 40), max_size=(200, 200))
    want = gold.detect_multi_scale(FACE_XML, SCENE_640, 1.25, 3,
                                   (40, 40), (200, 200))
    got = eng.detect(SCENE_640, 3)[0]
    assert canon(got) == canon(want)


# full tier: deep tilted-cascade grouped sweep (140 s warm, round-5
# --durations). The tilted path stays default-gated by
# test_pallas_ops.test_dense_phase_tilted_full_path_nonvacuous (tilted
# RSAT features through the full engine with nonvacuous detections);
# grouped-output IoU stays gated by the non-tilted parity tests.
@pytest.mark.full
def test_tilted_cascade_grouped_iou():
    """Tilted cascade (smile): grouped output within IoU tolerance of the
    golden (exact equality impossible: the golden's SIMD tilted path aliases
    neighboring windows — see docs/OPENCV_PARITY.md)."""
    eng = CascadeEngine(load_cascade_xml(SMILE_XML), (320, 240), 1.1)
    want = gold.detect_multi_scale(SMILE_XML, SCENE_320, 1.1, 3)
    got = eng.detect(SCENE_320, 3)[0]
    assert len(got) == len(want)
    for w in want:
        assert max((iou(w, g) for g in got), default=0.0) >= 0.8


def test_single_window_exact_incl_tilted():
    """Windows at origin agree exactly with the golden, incl tilted smile."""
    rng = np.random.RandomState(7)
    smile = load_cascade_xml(SMILE_XML)
    eng = CascadeEngine(smile, (36, 18), 1.1)
    crops = []
    # crops harvested from golden smile detections (positives) + random
    dets = gold.detect_multi_scale(SMILE_XML, SCENE_320, 1.1, 0)
    import cv2
    for (x, y, w, h) in dets[:10]:
        crops.append(cv2.resize(SCENE_320[y:y + h, x:x + w], (36, 18),
                                interpolation=cv2.INTER_LINEAR_EXACT))
    for _ in range(10):
        y0, x0 = rng.randint(0, 240 - 18), rng.randint(0, 320 - 36)
        crops.append(SCENE_320[y0:y0 + 18, x0:x0 + 36].copy())
    batch = np.stack(crops)
    _, valid, _ = eng.detect_raw(batch)
    valid = np.asarray(valid)
    n_pos = 0
    for i, crop in enumerate(crops):
        want = len(gold.detect_multi_scale(SMILE_XML, crop, 1.1, 0,
                                           (36, 18))) > 0
        n_pos += want
        assert bool(valid[i].any()) == want, i
    assert n_pos > 0  # fixture must actually exercise positives


def test_flat_image_no_detections(face_engine):
    """stddev<=10 windows are rejected (OpenCV 4.x rule)."""
    flat = np.full((480, 640), 128, np.uint8)
    assert len(face_engine.detect(flat, 0)[0]) == 0
    _, valid, _ = face_engine.detect_raw(flat)
    assert not np.asarray(valid).any()


def test_xla_level_grouping_equality():
    """On TPU, runs of solo XLA levels are grouped into multi-level programs
    (("xla", (li...)) plan items) so deep tilted pyramids cost a handful of
    remote-compiler round-trips instead of one per level (the bench chain
    phase's long pole). The grouped plan preserves level order, so its
    concatenated boxes/valid/overflow must be bit-identical to the
    one-program-per-level plan (exercised here on CPU via the env override
    the engine reads, VCA_XLA_GROUP_LEVELS)."""
    eng = CascadeEngine(load_cascade_xml(SMILE_XML), (160, 120), 1.12)
    gray = face_scene(160, 120, faces=((80, 60, 34),), noise=4, seed=3)[None]

    eng._xla_group_levels = 1
    plan1 = eng._per_level_items()
    base = [np.asarray(x) for x in eng._detect_per_level(gray)]

    eng._xla_group_levels = 4
    eng._level_jits = {}
    plan4 = eng._per_level_items()
    got = [np.asarray(x) for x in eng._detect_per_level(gray)]

    assert any(isinstance(i, tuple) and i and i[0] == "xla" for i in plan4)
    assert len(plan4) < len(plan1)
    # grouped runs stay consecutive and within the bound
    for it in plan4:
        if isinstance(it, tuple) and it[0] == "xla":
            assert list(it[1]) == list(range(it[1][0], it[1][-1] + 1))
            assert 2 <= len(it[1]) <= 4
    for a, b in zip(base, got):
        assert np.array_equal(a, b)
