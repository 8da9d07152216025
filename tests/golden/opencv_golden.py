"""Python driver for the C++ OpenCV-4.6 golden tool (vca_golden).

The tool wraps the exact APIs the reference repo calls per frame
(cv::CascadeClassifier::detectMultiScale — kmsfacedetect.cpp:809-811;
cv::motempl — gstnubotracker.cpp:356-377) and is the parity ground truth
for the TPU engine. Built on demand from nubomedia_vca_tpu/cpp/golden_tool.
"""

from __future__ import annotations

import json
import os
import struct
import subprocess
import tempfile

import numpy as np

_TOOL_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", "nubomedia_vca_tpu", "cpp", "golden_tool"
)
_TOOL = os.path.join(_TOOL_DIR, "vca_golden")

_DTYPES = {0: np.uint8, 1: np.float32, 2: np.int32, 3: np.float64}
_DTYPE_CODES = {np.dtype(np.uint8): 0, np.dtype(np.float32): 1}


def ensure_tool() -> str:
    if not os.path.exists(_TOOL):
        subprocess.run(["make", "-C", _TOOL_DIR], check=True, capture_output=True)
    return _TOOL


def write_blob(path: str, img: np.ndarray) -> None:
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        h, w = img.shape
        c = 1
    else:
        h, w, c = img.shape
    code = _DTYPE_CODES[img.dtype]
    with open(path, "wb") as f:
        f.write(struct.pack("<4i", h, w, c, code))
        f.write(img.tobytes())


def read_blob(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        h, w, c, dt = struct.unpack("<4i", f.read(16))
        data = np.frombuffer(f.read(), dtype=_DTYPES[dt])
    a = data.reshape(h, w, c)
    return a[:, :, 0] if c == 1 else a


def _run(*args: str) -> str:
    ensure_tool()
    r = subprocess.run([_TOOL, *map(str, args)], check=True, capture_output=True)
    return r.stdout.decode()


def detect_multi_scale(
    cascade_xml: str,
    gray: np.ndarray,
    scale_factor: float = 1.25,
    min_neighbors: int = 3,
    min_size=(0, 0),
    max_size=(0, 0),
) -> np.ndarray:
    """Golden cv::CascadeClassifier::detectMultiScale. Returns [N,4] x,y,w,h."""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "img.blob")
        write_blob(p, gray.astype(np.uint8))
        out = _run(
            "detect", cascade_xml, p, repr(scale_factor), min_neighbors,
            min_size[0], min_size[1], max_size[0], max_size[1],
        )
    rects = json.loads(out)
    return np.array(rects, dtype=np.int32).reshape(-1, 4)


def detect_levels(cascade_xml, gray, scale_factor=1.25, min_neighbors=3):
    """detectMultiScale with outputRejectLevels=True → [N,6] x,y,w,h,level,weight."""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "img.blob")
        write_blob(p, gray.astype(np.uint8))
        out = _run("detect_levels", cascade_xml, p, repr(scale_factor), min_neighbors)
    rows = json.loads(out)
    return np.array(rows, dtype=np.float64).reshape(-1, 6)


def group_rectangles(rects: np.ndarray, group_threshold: int, eps: float = 0.2):
    """Golden cv::groupRectangles."""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "rects.txt")
        with open(p, "w") as f:
            for x, y, w, h in np.asarray(rects, dtype=np.int64):
                f.write(f"{x} {y} {w} {h}\n")
        out = _run("group", p, group_threshold, repr(eps))
    return np.array(json.loads(out), dtype=np.int32).reshape(-1, 4)


def resize(img: np.ndarray, w: int, h: int, interp: int) -> np.ndarray:
    """Golden cv::resize (interp is the OpenCV enum: 1=LINEAR, 5=LINEAR_EXACT)."""
    with tempfile.TemporaryDirectory() as d:
        pi, po = os.path.join(d, "i.blob"), os.path.join(d, "o.blob")
        write_blob(pi, img)
        _run("resize", pi, po, w, h, interp)
        return read_blob(po)


def equalize_hist(img: np.ndarray) -> np.ndarray:
    with tempfile.TemporaryDirectory() as d:
        pi, po = os.path.join(d, "i.blob"), os.path.join(d, "o.blob")
        write_blob(pi, img.astype(np.uint8))
        _run("equalize", pi, po)
        return read_blob(po)


def integral(img: np.ndarray):
    """Golden cv::integral → (sum int32 [H+1,W+1], sqsum float64, tilted int32)."""
    with tempfile.TemporaryDirectory() as d:
        pi = os.path.join(d, "i.blob")
        ps, pq, pt = (os.path.join(d, n) for n in ("s.blob", "q.blob", "t.blob"))
        write_blob(pi, img.astype(np.uint8))
        _run("integral", pi, ps, pq, pt)
        return read_blob(ps), read_blob(pq), read_blob(pt)


def motempl_sequence(
    frames: list[np.ndarray],
    diff_thresh: float = 20.0,
    mhi_duration: float = 0.2,
    delta1: float = 0.05,
    delta2: float = 0.2,
    aperture: int = 3,
    seg_thresh: float = 0.05,
):
    """Golden replay of the reference tracker loop over gray frames at 30 fps.

    Returns (final mhi, final grad mask, final orientation, final-frame
    segmentMotion rects [N,4]).
    """
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i, fr in enumerate(frames):
            p = os.path.join(d, f"f{i}.blob")
            write_blob(p, fr.astype(np.uint8))
            paths.append(p)
        pm, pk, po = (os.path.join(d, n) for n in ("mhi.blob", "mask.blob", "ori.blob"))
        out = _run(
            "motempl", len(frames), *paths, pm, pk, po,
            repr(diff_thresh), repr(mhi_duration), repr(delta1), repr(delta2),
            aperture, repr(seg_thresh),
        )
        rects = np.array(json.loads(out), dtype=np.int32).reshape(-1, 4)
        return read_blob(pm), read_blob(pk), read_blob(po), rects
