"""Deterministic synthetic test clips.

The reference repo ships no test media (SURVEY.md §4: manual gst-launch
eyeballing only), so parity fixtures are generated procedurally: cartoon
faces that the real frontal-face Haar cascade detects, plus moving blobs
for the motion tracker. Drawing uses cv2 primitives for determinism.
"""

from __future__ import annotations

import numpy as np
import cv2

FACE_XML = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml"
PROFILE_XML = "/usr/share/opencv4/haarcascades/haarcascade_profileface.xml"
EYE_XML = "/usr/share/opencv4/haarcascades/haarcascade_eye.xml"
LEFT_EYE_XML = "/usr/share/opencv4/haarcascades/haarcascade_lefteye_2splits.xml"
RIGHT_EYE_XML = "/usr/share/opencv4/haarcascades/haarcascade_righteye_2splits.xml"
SMILE_XML = "/usr/share/opencv4/haarcascades/haarcascade_smile.xml"


def draw_face(img: np.ndarray, cx: int, cy: int, s: int) -> None:
    """Draw a cartoon face ("radius" s) tuned to fire haarcascade_frontalface_alt."""
    cv2.ellipse(img, (cx, cy), (int(0.78 * s), s), 0, 0, 360, 205, -1)
    ey = cy - int(0.25 * s)
    ex = int(0.34 * s)
    for sx in (-1, 1):
        cv2.ellipse(img, (cx + sx * ex, ey - int(0.18 * s)),
                    (int(0.22 * s), int(0.06 * s)), 0, 0, 360, 95, -1)   # brow
        cv2.ellipse(img, (cx + sx * ex, ey), (int(0.18 * s), int(0.11 * s)),
                    0, 0, 360, 40, -1)                                   # eye
    cv2.line(img, (cx, cy - int(0.05 * s)), (cx, cy + int(0.3 * s)),
             130, max(1, s // 10))                                       # nose
    cv2.ellipse(img, (cx, cy + int(0.55 * s)), (int(0.34 * s), int(0.12 * s)),
                0, 0, 360, 70, -1)                                       # mouth


def face_scene(
    w: int = 640, h: int = 480,
    faces=((200, 200, 60), (460, 300, 42)),
    noise: int = 5, seed: int = 0, bg: int = 170,
) -> np.ndarray:
    """Gray uint8 frame with cartoon faces at given (cx, cy, scale)."""
    rng = np.random.RandomState(seed)
    img = np.full((h, w), bg, np.uint8)
    if noise:
        img = (img.astype(np.int16)
               + rng.randint(-noise, noise + 1, img.shape)).clip(0, 255).astype(np.uint8)
    for cx, cy, s in faces:
        draw_face(img, cx, cy, s)
    return img


def face_clip(n_frames: int = 8, w: int = 640, h: int = 480, seed: int = 0):
    """Clip of frames with a large face drifting a few px/frame (exercises
    tracking at the reference's 160-px working width, where small faces are
    sub-window-sized)."""
    frames = []
    for t in range(n_frames):
        frames.append(face_scene(
            w, h,
            faces=((280 + 4 * t, 230 + 2 * t, 150),),
            noise=5, seed=seed + t,
        ))
    return np.stack(frames)


def moving_blob_clip(n_frames: int = 12, w: int = 320, h: int = 240, seed: int = 3):
    """Clip with two moving bright blobs on static noise (tracker fixture)."""
    rng = np.random.RandomState(seed)
    bg = rng.randint(60, 80, (h, w)).astype(np.uint8)
    frames = []
    for t in range(n_frames):
        img = bg.copy()
        cv2.circle(img, (40 + 9 * t, 60 + 4 * t), 14, 220, -1)
        cv2.rectangle(img, (250 - 7 * t, 160), (280 - 7 * t, 200), 25, -1)
        frames.append(img)
    return np.stack(frames)
