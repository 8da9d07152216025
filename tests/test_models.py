"""Filter-layer tests: face tracking, ROI part detection plumbing, GOP/event
scheduling. Part detectors are exercised with the (window-exact, non-tilted)
frontal-face cascade substituted as the part cascade, so expected outputs can
be recomputed independently from real-OpenCV golden candidates."""

import numpy as np
import cv2
import pytest

import jax.numpy as jnp

from nubomedia_vca_tpu.models.face import (
    FaceDetector, FaceDetectorConfig, FaceTracks,
)
from nubomedia_vca_tpu.models.eye import EyeDetector, EyeDetectorConfig
from nubomedia_vca_tpu.models.mouth import MouthDetector, MouthDetectorConfig
from nubomedia_vca_tpu.models.nose import NoseDetector, NoseDetectorConfig
from nubomedia_vca_tpu.models.ear import EarDetector, EarDetectorConfig
from nubomedia_vca_tpu.models.base import GopScheduler, EventGate
from nubomedia_vca_tpu.ops.resize import resize_linear_exact

from .fixtures import face_scene, face_clip, FACE_XML
from .golden import opencv_golden as gold


def make_work(img, w, h):
    work = np.asarray(resize_linear_exact(jnp.asarray(img[None]), (w, h)))[0]
    return cv2.equalizeHist(work)


# --------------------------------------------------------------------- face
def test_face_detect_boxes_matches_golden():
    scene = face_clip(1)[0]
    fd = FaceDetector((640, 480))
    got = fd.detect_boxes(scene)[0]
    work = make_work(scene, fd.work_w, fd.work_h)
    want = gold.detect_multi_scale(FACE_XML, work, 1.25, 3)
    want = np.rint(want * fd.scale_back).astype(np.int32) if len(want) else want
    assert sorted(map(tuple, got.tolist())) == sorted(map(tuple, want.tolist()))
    assert len(got) == 1


def test_face_tracking_ids_persist():
    clip = face_clip(6)
    fd = FaceDetector((640, 480))
    res = fd.process(clip)
    ids_per_frame = [[f.id for f in faces] for faces in res]
    assert all(len(ids) >= 1 for ids in ids_per_frame[:2])
    # ids never repeat across distinct simultaneous faces
    for ids in ids_per_frame:
        assert len(ids) == len(set(ids))


def test_face_tracks_unit_semantics():
    t = FaceTracks()
    # first frame: two faces, fresh ids
    out = t.update(np.array([[10, 10, 60, 60], [200, 200, 80, 80]]), 40)
    assert [f.id for f in out] == [0, 1]
    # small jitter (< size-based limit): boxes unchanged (anti-vibration)
    out = t.update(np.array([[12, 11, 60, 60], [201, 202, 80, 80]]), 40)
    assert [(f.x, f.y, f.id) for f in out] == [(10, 10, 0), (200, 200, 1)]
    # large move (> limit, < track threshold): adopt new position, same id
    out = t.update(np.array([[30, 30, 60, 60], [220, 220, 80, 80]]), 40)
    assert [(f.x, f.y, f.id) for f in out] == [(30, 30, 0), (220, 220, 1)]
    # area change > 15% at same center: old position, new size, same id
    out = t.update(np.array([[25, 25, 70, 70], [215, 215, 90, 90]]), 40)
    assert [(f.x, f.y, f.w, f.id) for f in out] == [
        (30, 30, 70, 0), (220, 220, 90, 1)]
    # disappearance: purged after MAX_NUM_FPS_WITH_NO_DETECTION=1 empty frame
    out = t.update(np.zeros((0, 4)), 40)
    assert out == []
    # reappearance gets a fresh id
    out = t.update(np.array([[30, 30, 60, 60]]), 40)
    assert [f.id for f in out] == [2]


# ------------------------------------------------------- part detector plumbing
#
# The cascade engine itself is golden-verified in test_engine_parity; here the
# ROI/merge/coordinate plumbing is tested with INJECTED candidates (cartoon
# plants trigger real cascades too capriciously for exact fixtures), plus one
# end-to-end recompute-equality test on a real scene.

def inject(det, name_boxes: dict):
    """Build a fake part_raw dict: candidates injected as raw windows."""
    from nubomedia_vca_tpu.core.boxes import pad_boxes
    out = {}
    for name, boxes in name_boxes.items():
        b, v = pad_boxes(np.asarray(boxes, np.int32), 64)
        out[name] = (b[None], v[None], np.zeros(1, bool))
    return out


def quad(x, y, w, h, n=4):
    """n near-identical candidates (so minNeighbors grouping keeps them)."""
    return [(x + dx, y + dy, w, h) for dx, dy in
            [(0, 0), (1, 0), (0, 1), (1, 1), (2, 1)][:n]]


FACE160 = np.array([[40, 20, 76, 76]])  # face box at face-res (160-wide)


def test_mouth_plumbing_injected():
    det = MouthDetector((640, 480),
                        MouthDetectorConfig(mouth_cascade_path=FACE_XML))
    # mouth ROI at part-res: x 80..232, y (20+42)*2=124..208
    good = quad(120, 140, 40, 40)
    bigger = quad(150, 150, 50, 50)
    outside = quad(10, 10, 30, 30)
    res = det._process_frame(FACE160, inject(det, {
        "mouth": good + bigger + outside}), 0)
    # biggest-object semantics: only the bigger group survives
    assert len(res["mouth"]) == 1
    (x, y, w, h) = res["mouth"][0]
    # _to_original: (x*2, y*2, (w-1)*2, (h-1)*2) modulo grouping average
    assert abs(x - 302) <= 4 and abs(w - 98) <= 4


def test_nose_plumbing_injected():
    det = NoseDetector((640, 480),
                       NoseDetectorConfig(nose_cascade_path=FACE_XML))
    # nose ROI: x (40+19)*2=118..232, y (20+19)*2=78..(20+76-8-19)*2=138
    good = quad(140, 90, 30, 30)
    outside = quad(10, 200, 30, 30)
    res = det._process_frame(FACE160, inject(det, {"nose": good + outside}), 0)
    assert len(res["nose"]) == 1


def test_eye_plumbing_injected_and_eyebrow_rules():
    det = EyeDetector((640, 480), EyeDetectorConfig(
        right_cascade_path=FACE_XML, left_cascade_path=FACE_XML))
    # face (40,20,76,76) → top 19, down 30: y 78..132; right x 80..156,
    # left x 156..232 (part-res)
    right = quad(100, 90, 24, 24, 5)
    left = quad(180, 100, 24, 24, 5)
    res = det._process_frame(FACE160, inject(det, {
        "right": right, "left": left}), 0)
    assert len(res["eye_right"]) == 1 and len(res["eye_left"]) == 1
    # left adopts the right eye's y (eyebrow fix)
    assert res["eye_left"][0][1] == res["eye_right"][0][1]

    # two distinct candidate groups in one half: only the first survives
    det2 = EyeDetector((640, 480), EyeDetectorConfig(
        right_cascade_path=FACE_XML, left_cascade_path=FACE_XML))
    two = quad(90, 85, 22, 22, 5) + quad(120, 100, 22, 22, 5)
    res2 = det2._process_frame(FACE160, inject(det2, {
        "right": two, "left": []}), 0)
    assert len(res2["eye_right"]) == 1


def test_part_temporal_merge():
    det = MouthDetector((640, 480),
                        MouthDetectorConfig(mouth_cascade_path=FACE_XML))
    r1 = det._process_frame(FACE160, inject(det, {"mouth": quad(120, 140, 40, 40)}), 0)
    # next frame: candidate jitters by 1 px → previous box kept verbatim
    r2 = det._process_frame(FACE160, inject(det, {"mouth": quad(121, 141, 40, 40)}), 0)
    assert r1["mouth"] == r2["mouth"]
    # large move → new box adopted
    r3 = det._process_frame(FACE160, inject(det, {"mouth": quad(140, 160, 40, 40)}), 0)
    assert r3["mouth"] != r2["mouth"]


# (test_ear_flip_coordinates, test_mouth_end_to_end_recompute and
# test_eye_event_fed_faces moved to test_models_parts.py so xdist
# spreads the heavy part-pyramid executions across file workers)

# ------------------------------------------------------------------ scheduling
def test_gop_scheduler():
    # x=2 is the reference's alternating special case
    # (kmsfacedetect.cpp:797-798: `2 == x && 1 == num_frame % 2`)
    g = GopScheduler(2)
    assert list(g.mask(8)) == [True, False, True, False] * 2
    g4 = GopScheduler(4)
    assert g4.mask(6).all()
    g1 = GopScheduler(1)
    assert list(g1.mask(8)) == [True, False, False, False] * 2
    g3 = GopScheduler(3)
    assert list(g3.mask(8)) == [True, True, True, False] * 2


def test_event_gate_budget():
    gate = EventGate(enabled=True, process_x_every_4=4)
    assert not gate.should_process()
    gate.feed_event()
    # NUM_FRAMES_TO_PROCESS/(5-4) = 10 frames pass, then idle again
    assert sum(gate.should_process() for _ in range(15)) == 10


def test_gate_disabled_always_processes():
    gate = EventGate(enabled=False)
    assert all(gate.should_process() for _ in range(5))


def test_gated_gop_budget_only_on_processed_frames():
    """Gate budget is consumed ONLY on GOP-processed frames
    (kmseyedetect.cpp:948 decrements inside the processed branch)."""
    from nubomedia_vca_tpu.models.base import gated_gop_mask

    gop = GopScheduler(2)                      # alternating frames
    gate = EventGate(enabled=True, process_x_every_4=2)   # budget 10//3 = 3
    events = [object()] + [None] * 9
    mask = gated_gop_mask(gop, gate, 10, events)
    # 3 budget units at every other frame: frames 0, 2, 4 processed
    assert list(mask) == [True, False, True, False, True] + [False] * 5


def test_gated_idle_frames_do_not_advance_gop():
    """Idle (no-budget) frames return before num_frame++ in the reference
    (kmsfacedetect.cpp:793-796), so the GOP phase freezes while idle."""
    from nubomedia_vca_tpu.models.base import gated_gop_mask

    gop = GopScheduler(1)                      # first frame of each GOP
    gate = EventGate(enabled=True, process_x_every_4=1)   # budget 10//4 = 2
    # 5 idle frames, then an event
    mask = gated_gop_mask(gop, gate, 5, [None] * 5)
    assert not mask.any() and gop.counter == 0
    mask = gated_gop_mask(gop, gate, 8, [object()] + [None] * 7)
    # budget 2 consumed on GOP frames 1 and 5 (x=1)
    assert list(mask) == [True, False, False, False, True, False, False,
                          False]


def test_face_unscaled_budget():
    """Face refuels NUM_FRAMES_TO_PROCESS unscaled (kmsfacedetect.cpp:751),
    parts scale by 5-x (kmseyedetect.cpp:759-761)."""
    face_gate = EventGate(enabled=True, process_x_every_4=2, scaled=False)
    face_gate.feed_event()
    assert face_gate.budget == 10
    part_gate = EventGate(enabled=True, process_x_every_4=2)
    part_gate.feed_event()
    assert part_gate.budget == 3


def test_part_empty_frame_persistence():
    """kmseyedetect.cpp:1034-1064: previous boxes are re-emitted for up to
    max_fps_without_detection consecutive empty frames, then purged."""
    det = MouthDetector((640, 480), MouthDetectorConfig(
        mouth_cascade_path=FACE_XML))
    box = (100, 100, 40, 20)
    assert det._merge_consecutive("mouth", [box], 4) == [box]
    # 1st empty frame: previous box persists (counter 1 == max)
    assert det._merge_consecutive("mouth", [], 4) == [box]
    # 2nd consecutive empty frame: purge
    assert det._merge_consecutive("mouth", [], 4) == []
    # counter resets on detection
    assert det._merge_consecutive("mouth", [box], 4) == [box]
    assert det._merge_consecutive("mouth", [], 4) == [box]
    assert det._merge_consecutive("mouth", [box], 4) == [box]


def test_ear_persistence_four_frames():
    """Ear keeps boxes across 4 empty frames (kmseardetect.cpp:48)."""
    from nubomedia_vca_tpu.models.ear import EarDetector, EarDetectorConfig

    det = EarDetector((640, 480), EarDetectorConfig(
        ear_cascade_path=FACE_XML))
    box = (50, 60, 30, 30)
    assert det._merge_consecutive("ear", [box], 7) == [box]
    for _ in range(4):
        assert det._merge_consecutive("ear", [], 7) == [box]
    assert det._merge_consecutive("ear", [], 7) == []


def test_face_motion_event_gating():
    """detect-event=1 face idles until a motion event arrives
    (kmsfacedetect.cpp:698-707), then processes the 10-frame budget."""
    from nubomedia_vca_tpu.models.face import FaceDetector, FaceDetectorConfig

    det = FaceDetector((640, 480), FaceDetectorConfig(detect_event=1))
    clip = face_clip(4)
    # no events: fully idle, nothing detected
    out = det.process(clip)
    assert all(len(f) == 0 for f in out)
    # motion event on frame 0: detection runs
    out = det.process(clip, events=[object(), None, None, None])
    assert any(len(f) > 0 for f in out)
