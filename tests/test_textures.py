"""Procedural texture backgrounds (models/textures.py).

These back the learned detectors' training scenes with real-world-like
high-frequency structure (the round-3 texture-brittleness mitigation);
the generators must be deterministic per RNG state, uint8, full-size, and
leave enough headroom that drawn faces stay visible.
"""

import numpy as np

from nubomedia_vca_tpu.models import textures


def test_all_families_shape_dtype_range():
    for k, fam in enumerate(textures._KINDS + textures._FACE_EXTRA_KINDS):
        rng = np.random.RandomState(k)
        t = fam(rng, 96, 64)
        assert t.shape == (64, 96), fam.__name__
        assert np.isfinite(t).all(), fam.__name__


def test_textured_bg_contract():
    for seed in range(8):
        rng = np.random.RandomState(seed)
        img = textures.textured_bg(rng, 320, 240)
        assert img.shape == (240, 320) and img.dtype == np.uint8
        # contrast-compressed: never slams full-range black-to-white
        assert img.std() < 100


def test_deterministic_per_rng_state():
    a = textures.textured_bg(np.random.RandomState(3), 80, 60)
    b = textures.textured_bg(np.random.RandomState(3), 80, 60)
    assert np.array_equal(a, b)


def test_any_bg_mixes_flat_and_textured():
    rng = np.random.RandomState(0)
    stds = [textures.any_bg(rng, 160, 120).std() for _ in range(24)]
    # flat-noise backgrounds have tiny std (<6); textured ones much larger
    assert any(s < 8 for s in stds) and any(s > 12 for s in stds)


def test_faces_remain_detectable_on_textures():
    """The cascade teacher must still find the (geometry-jittered) cartoon
    face on textured backgrounds MOST of the time. It need not find every
    one: jittered faces the teacher misses become IGNORE regions
    (distill.label_batch) that carry no gradient — but if the majority
    went dark, distillation positives would collapse to nothing."""
    from nubomedia_vca_tpu.models import distill

    rng = np.random.RandomState(11)
    found = 0
    teacher = distill.make_teacher()
    for i in range(12):
        img = textures.textured_bg(rng, distill.W, distill.H)
        distill._draw_face(img, 160, 120, 55, rng)
        boxes, valid, _, _ = teacher.detect_grouped(img[None], 3)
        found += int(np.asarray(valid)[0].sum() > 0)
    assert found >= 6, found


def test_face_bg_contract():
    """The face training background distribution (face_bg: base families
    + bokeh/rosette/terrain/patchwork/low-key) stays uint8, full-size,
    deterministic per RNG state, and reaches the near-black exposures the
    base recipe never did (the flower.jpg FP region)."""
    a = textures.face_bg(np.random.RandomState(5), 80, 60)
    b = textures.face_bg(np.random.RandomState(5), 80, 60)
    assert np.array_equal(a, b)
    mins = []
    for seed in range(48):
        img = textures.face_bg(np.random.RandomState(seed), 160, 120)
        assert img.shape == (120, 160) and img.dtype == np.uint8
        mins.append(int(img.min()))
    assert min(mins) < 20, min(mins)     # low-key exposures occur


def test_any_bg_distribution_unchanged():
    """cnn_parts' shipped checkpoint and measured per-class operating
    points were evaluated against any_bg scenes; face_bg additions must
    not leak into it (same draws as the frozen round-3 recipe)."""
    rng = np.random.RandomState(9)
    imgs = [textures.any_bg(rng, 64, 48) for _ in range(6)]
    rng2 = np.random.RandomState(9)
    ref = []
    for _ in range(6):
        if rng2.rand() < 0.6:
            ref.append(textures.textured_bg(rng2, 64, 48))
        else:
            from nubomedia_vca_tpu.models.synth import _noise_bg

            ref.append(_noise_bg(rng2, 64, 48))
    assert all(np.array_equal(a, b) for a, b in zip(imgs, ref))


def test_label_health_positives_dominate_ignores():
    """Frozen eval labels (the training distribution's census): teacher
    positives must outnumber teacher-missed IGNORE regions — the direct
    guard that the jittered-face recipe still yields a positive-rich
    distillation signal."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data",
                        "cnn_eval_labels.npz")
    d = np.load(path)
    n_pos, n_ign = int(d["valid"].sum()), int(d["ignore_valid"].sum())
    assert n_pos >= 1.5 * n_ign, (n_pos, n_ign)
    assert n_pos >= 16, n_pos          # enough faces to gate recall on
