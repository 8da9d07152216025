"""Media loop — the missing middle of the Kurento deployment shape.

In the reference, media flows through the GStreamer pipeline (WebRTC/RTP
decoded by Kurento) and the app only talks JSON-RPC; the filter elements
see frames because they sit in the media graph. Here the equivalent wiring
is: a `MediaRunner` owns a frame ingest (with the raw-video TCP listener —
feed it from ``gst-launch … ! tcpclientsink`` or ``ffmpeg -f rawvideo
tcp://…``) and drives the pipeline's created elements in registration
order, chaining face boxes into event-gated part detectors exactly like
the GstEvent flow (SURVEY.md §2.4.8), while each element emits its
rate-limited server events to RPC subscribers.

Apps never import this module: `MediaPipeline.listen()` (an RPC-invokable
method) lazily starts the runner and returns the bound TCP port.
"""

from __future__ import annotations

import atexit
import threading
import weakref

import numpy as np

_RUNNERS: "weakref.WeakSet" = weakref.WeakSet()


@atexit.register
def _stop_all_runners() -> None:
    """Join every live runner thread before interpreter teardown.

    A daemon thread abandoned inside an XLA compile/execute gets
    pthread_exit'd at interpreter finalization; the forced unwind through
    C++ frames aborts the whole process ("FATAL: exception not rethrown").
    Joining here (however long the in-flight step takes) is strictly
    better than a guaranteed crash."""
    for r in list(_RUNNERS):
        try:
            r.stop()
        except Exception:  # noqa: BLE001 — teardown must not raise
            pass


class MediaRunner:
    """Background frame loop binding one ingest to one MediaPipeline."""

    def __init__(self, pipeline, batch: int = 8, capacity: int = 64):
        from ..cpp.ingest_binding import make_ingest

        self.pipeline = pipeline
        self.batch = batch
        w, h = pipeline.frame_size
        self.ingest = make_ingest(w, h, capacity=capacity)
        self._stop = threading.Event()
        self._thread = None
        self.port = None
        self.frames_processed = 0
        _RUNNERS.add(self)

    # -- lifecycle ----------------------------------------------------------
    def listen(self, port: int = 0, channels: int = 1) -> int:
        self.port = self.ingest.listen(port, channels)
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self.port

    def push(self, frame, pts: int = 0, stream: int = 0) -> None:
        """Direct in-process feed (tests / co-located apps)."""
        self.ingest.push(stream, frame, pts)
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def stop(self) -> None:
        """Stop the loop and JOIN the worker (blocking until any in-flight
        element step — possibly a minutes-long first XLA compile — ends;
        abandoning the thread would crash the process at interpreter exit,
        see _stop_all_runners)."""
        self._stop.set()
        try:
            self.ingest.stop_listen()
        except Exception:  # noqa: BLE001 — not listening
            pass
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    # -- the loop -----------------------------------------------------------
    def _step(self, frames, stream: int = 0) -> None:
        """Run every element of the pipeline over one frame batch, chaining
        face boxes into the part detectors (GstEvent-flow analog).

        `stream` keys the face elements' per-stream track state; part
        detectors and the motion tracker keep single-stream temporal state
        (the reference's model is one pipeline per stream — create one
        MediaPipeline per stream for exact part/tracker semantics)."""
        face_boxes = None
        for el in list(self.pipeline.elements):
            if self._stop.is_set():
                return
            try:
                if hasattr(el, "_config") and hasattr(
                        el._config, "face_cascade_path"):
                    # part detector: consumes upstream face boxes
                    el.process(frames, face_boxes=face_boxes)
                elif el.__class__.__name__ in ("NuboFaceDetector",
                                               "NuboCnnFaceDetector"):
                    res = el.process(frames, stream=stream)
                    face_boxes = [
                        np.array([f.rect() for f in faces])
                        if faces else None
                        for faces in res
                    ]
                else:
                    el.process(frames)
            except Exception:  # noqa: BLE001 — one element must not kill
                import traceback
                traceback.print_exc()
        self.frames_processed += len(frames)

    def _loop(self) -> None:
        import time

        while not self._stop.is_set():
            frames, pts, streams = self.ingest.collect(
                self.batch, min_frames=1, wait_ms=50)
            if frames.shape[0] == 0:
                time.sleep(0.005)
                continue
            # frames arrive interleaved across TCP connections; process
            # per-stream so track IDs never cross streams
            for s in np.unique(streams):
                self._step(frames[streams == s], stream=int(s))
