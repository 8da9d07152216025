"""Procedural texture backgrounds for CNN training scenes.

The learned detectors are trained on procedural scenes (models/synth.py)
because the environment ships no real media (SURVEY.md §4). Round-2/3
real-image evaluation (tools/real_eval.py --builtin) showed the
flat-noise-background checkpoints are texture-brittle: high-frequency
real-world structure (foliage, roof tiles) draws false positives. These
generators synthesize that structure — multi-octave value noise, gratings,
checkers, edge clutter, gradients — so training scenes carry hard negative
texture WITHOUT training on the evaluation photographs (which would make
the --builtin FP measurement circular).

Used by models/distill.make_scene and models/cnn_parts.scene_with_parts;
NOT by the Haar-cascade trainer scenes (models/synth.py keeps its original
flat-noise recipe so the shipped cascade XMLs stay reproducible).
"""

from __future__ import annotations

import numpy as np


def _value_noise(rng, w, h, cell):
    """Coarse random grid bilinearly upsampled — Perlin-ish value noise."""
    import cv2

    gw, gh = max(2, w // cell), max(2, h // cell)
    grid = rng.randint(0, 256, (gh, gw)).astype(np.uint8)
    return cv2.resize(grid, (w, h), interpolation=cv2.INTER_LINEAR).astype(
        np.float32)


def _multi_octave(rng, w, h):
    """2-3 octaves of value noise: cloudy / foliage-like structure."""
    img = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for cell in rng.permutation([64, 24, 8])[: int(rng.randint(2, 4))]:
        img += amp * _value_noise(rng, w, h, int(cell))
        total += amp
        amp *= 0.55
    return img / total


def _grating(rng, w, h):
    """Sinusoidal grating at random angle/frequency (roof tiles, fences)."""
    theta = rng.uniform(0, np.pi)
    freq = rng.uniform(0.05, 0.6)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    phase = (xx * np.cos(theta) + yy * np.sin(theta)) * freq
    return 127.5 + 127.5 * np.sin(phase + rng.uniform(0, 2 * np.pi))


def _checker(rng, w, h):
    """Checkerboard blocks (windows, brickwork)."""
    cell = int(rng.randint(4, 24))
    yy, xx = np.mgrid[0:h, 0:w]
    a, b = rng.randint(40, 160), rng.randint(120, 230)
    return np.where(((xx // cell) + (yy // cell)) % 2 == 0, a, b).astype(
        np.float32)


def _clutter(rng, w, h):
    """Random lines/ellipses/rectangles over noise — man-made edge soup."""
    import cv2

    img = np.full((h, w), int(rng.randint(60, 200)), np.uint8)
    for _ in range(int(rng.randint(8, 30))):
        g = int(rng.randint(0, 256))
        kind = rng.randint(0, 3)
        x0, y0 = int(rng.randint(0, w)), int(rng.randint(0, h))
        x1, y1 = int(rng.randint(0, w)), int(rng.randint(0, h))
        if kind == 0:
            cv2.line(img, (x0, y0), (x1, y1), g, int(rng.randint(1, 4)))
        elif kind == 1:
            cv2.ellipse(img, (x0, y0),
                        (int(rng.randint(2, w // 4)),
                         int(rng.randint(2, h // 4))),
                        float(rng.uniform(0, 180)), 0, 360, g, -1)
        else:
            cv2.rectangle(img, (min(x0, x1), min(y0, y1)),
                          (max(x0, x1), max(y0, y1)), g,
                          -1 if rng.rand() < 0.5 else int(rng.randint(1, 3)))
    return img.astype(np.float32)


def _gradient(rng, w, h):
    """Smooth linear luminance ramp (sky, walls)."""
    theta = rng.uniform(0, 2 * np.pi)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    t = xx * np.cos(theta) + yy * np.sin(theta)
    t = (t - t.min()) / max(t.max() - t.min(), 1e-6)
    lo, hi = sorted(rng.randint(0, 256, 2).tolist())
    return lo + t * (hi - lo)


_KINDS = (_multi_octave, _grating, _checker, _clutter, _gradient)


def textured_bg(rng, w: int, h: int) -> np.ndarray:
    """uint8 [h, w] background: one random texture family, contrast-
    compressed to a random sub-range plus pixel noise (real sensor grain),
    so drawn faces (opaque, mid-to-high luminance) stay visible while the
    background carries hard high-frequency negatives."""
    tex = _KINDS[int(rng.randint(len(_KINDS)))](rng, w, h)
    tex = (tex - tex.min()) / max(tex.max() - tex.min(), 1e-6)
    span = rng.uniform(40, 170)
    lo = rng.uniform(0, 255 - span)
    out = lo + tex * span + rng.randint(-6, 7, (h, w))
    return np.clip(out, 0, 255).astype(np.uint8)


def any_bg(rng, w: int, h: int, p_textured: float = 0.6) -> np.ndarray:
    """Mix of textured and classic flat-noise backgrounds."""
    if rng.rand() < p_textured:
        return textured_bg(rng, w, h)
    from .synth import _noise_bg

    return _noise_bg(rng, w, h)
