"""Motion tracker parity vs the OpenCV 4.6 golden (motempl) + join/filter
semantics."""

import numpy as np
import pytest

from nubomedia_vca_tpu.models.tracker import (
    Tracker, TrackerConfig, tracker_step, init_state, join_objects,
)

from .fixtures import moving_blob_clip
from .golden import opencv_golden as gold


@pytest.mark.parametrize("nfr,dur,sth", [(8, 0.2, 0.05), (12, 0.2, 0.05),
                                         (8, 0.1, 0.03)])
def test_segmentation_parity(nfr, dur, sth):
    clip = moving_blob_clip(nfr)
    mhi_g, _, _, rects_g = gold.motempl_sequence(list(clip), 20, dur,
                                                 seg_thresh=sth)
    st = init_state(240, 320)
    for i, fr in enumerate(clip):
        st, rects, valid, _, _ = tracker_step(
            st, fr, i / 30.0, threshold=20, mhi_duration=dur,
            seg_thresh=sth, max_blobs=32)
    mine = sorted(np.asarray(rects)[np.asarray(valid)].tolist())
    assert mine == sorted(rects_g.tolist())
    assert np.abs(np.asarray(st.mhi) - mhi_g).max() == 0.0


def test_motion_gradient_close_to_golden():
    clip = moving_blob_clip(8)
    _, mask_g, ori_g, _ = gold.motempl_sequence(list(clip), 20, 0.2)
    st = init_state(240, 320)
    for i, fr in enumerate(clip):
        st, _, _, mask, ori = tracker_step(
            st, fr, i / 30.0, threshold=20, mhi_duration=0.2,
            seg_thresh=0.05, max_blobs=32)
    m = np.asarray(mask)
    assert (m == (mask_g > 0)).mean() > 0.99
    both = m & (mask_g > 0)
    if both.any():
        assert np.abs(np.asarray(ori) - ori_g)[both].max() < 0.1


def test_join_objects_semantics():
    # area filter drops tiny and huge blobs
    rects = [(0, 0, 5, 5), (10, 10, 20, 20), (100, 100, 200, 200)]
    out = join_objects(rects, min_area=50, max_area=30000, distance=35)
    assert out == [(10, 10, 20, 20)]
    # nearby blobs merge to their union box
    rects = [(10, 10, 20, 20), (25, 12, 20, 20)]
    out = join_objects(rects, 50, 30000, 35)
    assert out == [(10, 10, 35, 22)]
    # distant blobs stay separate
    rects = [(10, 10, 20, 20), (200, 200, 20, 20)]
    out = join_objects(rects, 50, 30000, 35)
    assert len(out) == 2


def test_tracker_end_to_end():
    clip = moving_blob_clip(10)
    tr = Tracker((320, 240))
    res = tr.process(clip)
    assert len(res) == 10
    assert res[0] == []              # first frame: no previous frame yet
    assert len(res[-1]) >= 1         # moving blobs tracked
    for (x, y, w, h) in res[-1]:
        assert 50 < w * h < 30000


def test_tracker_static_scene_no_blobs():
    frame = moving_blob_clip(1)[0]
    clip = np.stack([frame] * 5)
    tr = Tracker((320, 240))
    res = tr.process(clip)
    assert all(r == [] for r in res)


def test_tracker_scan_matches_step_loop():
    from nubomedia_vca_tpu.models.tracker import tracker_scan
    clip = moving_blob_clip(8)
    ts = np.arange(8) / 30.0
    st = init_state(240, 320)
    final, rects, valid = tracker_scan(
        st, clip, ts, threshold=20, mhi_duration=0.2, seg_thresh=0.05,
        max_blobs=32)
    st2 = init_state(240, 320)
    for i in range(8):
        st2, r2, v2, _, _ = tracker_step(
            st2, clip[i], ts[i], threshold=20, mhi_duration=0.2,
            seg_thresh=0.05, max_blobs=32)
        assert np.array_equal(np.asarray(rects[i]), np.asarray(r2))
        assert np.array_equal(np.asarray(valid[i]), np.asarray(v2))
    assert np.array_equal(np.asarray(final.mhi), np.asarray(st2.mhi))
