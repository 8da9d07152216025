"""Shared detector machinery: config knobs, GOP frame-skip scheduling, and
event-gated processing budgets.

Every reference element exposes the same GObject knob set
(`kmsfacedetect.cpp:1043-1102`): view toggle, detect-event gating,
width-to-process, process-x-every-4-frames, multi-scale-factor,
activate-events / events-ms, overlay image. Configs here mirror those names
and ranges 1:1 so the api/ layer can map RPC setters directly.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def multi_scale_to_pyramid_factor(multi_scale_factor: int) -> float:
    """User knob s (5..50, default 25) → pyramid factor 1 + s/100
    (`kmsfacedetect.cpp:142`)."""
    return 1.0 + multi_scale_factor / 100.0


@dataclasses.dataclass
class DetectorConfig:
    """Common knobs (names mirror the GObject properties)."""

    view: int = 1                      # "view-faces"/"view-eyes"/...: draw overlay
    detect_event: int = 0              # 1 = idle until an upstream event arrives
    send_meta_data: int = 0
    width_to_process: int = 160        # 160/320/480/640 working width
    process_x_every_4_frames: int = 4  # GOP-4 frame skip policy
    multi_scale_factor: int = 25       # pyramid = 1 + s/100
    activate_events: int = 0           # rate-limited server events
    events_ms: int = 30001
    min_neighbors: int = 3


class GopScheduler:
    """The reference's frame-skip policy (`kmsfacedetect.cpp:799-803,829-830`):
    process the first x frames of every group of 4."""

    def __init__(self, process_x_every_4: int = 4):
        self.x = int(process_x_every_4)
        self.counter = 0

    def should_process(self) -> bool:
        ok = (self.counter % 4) < self.x
        self.counter += 1
        return ok

    def mask(self, n: int) -> np.ndarray:
        """Vector form: processing mask for the next n frames."""
        if n <= 0:
            raise ValueError("empty frame batch")
        idx = self.counter + np.arange(n)
        self.counter += n
        return (idx % 4) < self.x


class EventGate:
    """detect-event gating (`kmsfacedetect.cpp:698-707`, `kmseyedetect.cpp
    :726-764`): when enabled, the filter idles until an upstream event
    arrives, then processes NUM_FRAMES_TO_PROCESS/(5 - x) frames."""

    NUM_FRAMES_TO_PROCESS = 10

    def __init__(self, enabled: bool, process_x_every_4: int = 4):
        self.enabled = bool(enabled)
        self.budget = 0
        self.x = int(process_x_every_4)
        self.pending_payload = None

    def feed_event(self, payload=None) -> None:
        self.budget = self.NUM_FRAMES_TO_PROCESS // (5 - self.x)
        self.pending_payload = payload

    def should_process(self) -> bool:
        if not self.enabled:
            return True
        if self.budget > 0:
            self.budget -= 1
            return True
        return False
