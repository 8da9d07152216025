"""Cascade XML loader structure tests."""

import numpy as np
import pytest

from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml
from .fixtures import FACE_XML, PROFILE_XML, LEFT_EYE_XML, SMILE_XML


def test_face_cascade_structure():
    c = load_cascade_xml(FACE_XML)
    assert (c.window_w, c.window_h) == (20, 20)
    assert c.n_stages == 22
    assert c.n_weaks == 2135
    assert c.n_features == 2135
    assert not c.has_tilted
    # stumps: all padded children reference the root feature with +inf thr
    assert np.all(np.isinf(c.thrL))
    assert np.all(np.isinf(c.thrR))
    assert np.array_equal(c.featL, c.feat0) or np.all(c.thrL == np.inf)
    # padded leaves are degenerate pairs
    assert np.array_equal(c.leavesL[:, 0], c.leavesL[:, 1])
    assert np.array_equal(c.leavesR[:, 0], c.leavesR[:, 1])


def test_eye2splits_tree_structure():
    c = load_cascade_xml(LEFT_EYE_XML)
    assert c.has_tilted
    assert c.n_weaks * 2 == c.n_features  # depth-2: two features per weak
    # depth-2 trees: at least one child per weak is a real internal node
    assert (np.isfinite(c.thrL) | np.isfinite(c.thrR)).all()


def test_smile_window_nonsquare():
    c = load_cascade_xml(SMILE_XML)
    assert (c.window_w, c.window_h) == (36, 18)
    assert c.has_tilted


def test_stage_partition():
    c = load_cascade_xml(PROFILE_XML)
    counts = c.stage_weak_counts()
    assert counts.sum() == c.n_weaks
    assert (counts > 0).all()
    assert np.all(np.diff(c.weak_stage) >= 0)  # weaks ordered by stage


def test_feature_extents_inside_window():
    for xml in (FACE_XML, PROFILE_XML, LEFT_EYE_XML, SMILE_XML):
        c = load_cascade_xml(xml)
        r = c.rects
        live = c.rect_weights != 0
        assert ((r[..., 0] + r[..., 2]) * live <= c.window_w).all()
        assert ((r[..., 1] + r[..., 3]) * live <= c.window_h).all()
        t = c.tilted
        if t.any():
            rt = r[t]
            livet = c.rect_weights[t] != 0
            assert (((rt[..., 1] + rt[..., 2] + rt[..., 3]) * livet)
                    <= c.window_h).all()
            assert ((rt[..., 0] - rt[..., 3]) * livet >= 0).all()
