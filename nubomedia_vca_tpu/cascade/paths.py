"""Cascade-file discovery.

The reference hard-codes absolute cascade paths into each element
(``kmsfacedetect.cpp:40``, ``kmseyedetect.cpp:27-29``,
``kmsnosedetect.cpp:32``, ``kmseardetect.cpp:30-31``,
``kmsmouthdetect.cpp:38`` — all under ``/usr/share/opencv/haarcascades``).
This module probes, in order:

1. ``$VCA_CASCADE_PATH`` (colon-separated directories),
2. the repo-local ``assets/haarcascades`` drop-in directory — put the
   reference's old-format mcs files there (the loader reads old format
   natively; no conversion needed),
3. the reference's OpenCV 2.x system dir,
4. the modern OpenCV 4 system dir.

Each model prefers the reference's exact mcs model when found and falls
back to the documented modern substitute otherwise.
"""

from __future__ import annotations

import os

REFERENCE_DIR = "/usr/share/opencv/haarcascades"   # reference's hard-coded dir
SYSTEM_DIR = "/usr/share/opencv4/haarcascades"
ASSETS_DIR = os.path.normpath(os.path.join(
    os.path.dirname(__file__), "..", "..", "assets", "haarcascades"))
# cascades bundled inside the package (ship in the wheel): the trainer's
# synthetic nose/ear/profile substitutes (tools/train_part_cascades.py) —
# probed LAST so any same-named system or drop-in model wins
PKG_ASSETS_DIR = os.path.normpath(os.path.join(
    os.path.dirname(__file__), "..", "assets", "haarcascades"))


def search_dirs() -> list[str]:
    dirs = []
    env = os.environ.get("VCA_CASCADE_PATH")
    if env:
        dirs.extend(p for p in env.split(":") if p)
    dirs += [ASSETS_DIR, REFERENCE_DIR, SYSTEM_DIR, PKG_ASSETS_DIR]
    return dirs


def find_cascade(*names: str) -> str | None:
    """First existing file among ``names`` probed across ``search_dirs()``
    (all dirs tried for the first name before moving to the next name, so
    name order expresses model preference)."""
    for name in names:
        if os.path.isabs(name) and os.path.exists(name):
            return name
        for d in search_dirs():
            p = os.path.join(d, name)
            if os.path.exists(p):
                return p
    return None
