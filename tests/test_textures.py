"""Procedural texture backgrounds (models/textures.py).

These back the learned detectors' training scenes with real-world-like
high-frequency structure (the round-3 texture-brittleness mitigation);
the generators must be deterministic per RNG state, uint8, full-size, and
leave enough headroom that drawn faces stay visible.
"""

import numpy as np

from nubomedia_vca_tpu.models import textures


def test_all_families_shape_dtype_range():
    for k, fam in enumerate(textures._KINDS):
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
    """The cascade teacher must still find the cartoon face on textured
    backgrounds (otherwise distillation labels would collapse)."""
    from nubomedia_vca_tpu.models import distill

    rng = np.random.RandomState(11)
    found = 0
    teacher = distill.make_teacher()
    for i in range(6):
        img = textures.textured_bg(rng, distill.W, distill.H)
        distill._draw_face(img, 160, 120, 55, rng)
        boxes, valid, _, _ = teacher.detect_grouped(img[None], 3)
        found += int(np.asarray(valid)[0].sum() > 0)
    assert found >= 4, found
