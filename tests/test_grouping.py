"""groupRectangles parity vs the OpenCV 4.6 golden tool."""

import numpy as np
import jax.numpy as jnp
import pytest

from nubomedia_vca_tpu.ops.grouping import group_rectangles_np, group_rectangles_jax
from .golden import opencv_golden as gold


def canon(a):
    return sorted(map(tuple, np.asarray(a).reshape(-1, 4).tolist()))


def random_rect_cloud(rng, n_clusters=4, n=60, w=640, h=480):
    rects = []
    for _ in range(n_clusters):
        cx, cy = rng.randint(50, w - 150), rng.randint(50, h - 150)
        size = rng.randint(30, 120)
        k = rng.randint(1, 12)
        for _ in range(k):
            rects.append([
                cx + rng.randint(-8, 9), cy + rng.randint(-8, 9),
                size + rng.randint(-6, 7), size + rng.randint(-6, 7),
            ])
    while len(rects) < n:
        rects.append([rng.randint(0, w - 50), rng.randint(0, h - 50),
                      rng.randint(20, 150), rng.randint(20, 150)])
    return np.array(rects[:n], np.int32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("group_threshold", [1, 2, 3])
def test_group_rectangles_np_matches_golden(seed, group_threshold):
    rng = np.random.RandomState(seed)
    rects = random_rect_cloud(rng)
    want = gold.group_rectangles(rects, group_threshold)
    got = group_rectangles_np(rects, group_threshold)
    assert canon(got) == canon(want)


def test_group_rectangles_np_empty():
    assert group_rectangles_np(np.zeros((0, 4)), 3).shape == (0, 4)


@pytest.mark.parametrize("seed", [0, 5])
def test_group_rectangles_jax_matches_np(seed):
    rng = np.random.RandomState(seed)
    rects = random_rect_cloud(rng, n=40)
    # pad to capacity 64
    cap = 64
    padded = np.zeros((cap, 4), np.int32)
    padded[:len(rects)] = rects
    valid = np.zeros(cap, bool)
    valid[:len(rects)] = True
    for gt in (1, 2, 3):
        want = group_rectangles_np(rects, gt)
        avg, out_valid, _ = group_rectangles_jax(
            jnp.asarray(padded), jnp.asarray(valid), gt)
        got = np.asarray(avg)[np.asarray(out_valid)]
        assert canon(got) == canon(want), gt
