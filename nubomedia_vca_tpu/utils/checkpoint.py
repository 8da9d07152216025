"""Checkpoint / resume (SURVEY.md §5: the reference has none — "a restart
loses track identity only"). The TPU framework adds two durable things:

  * learned-detector training state (params + optimizer) via orbax — the
    standard multi-host-safe JAX checkpointing path;
  * per-stream runtime state snapshots (face track IDs, part-detector
    temporal merges, tracker MHI/prev-frame) so a restarted server resumes
    streams without losing track identity — fixing the reference's
    documented gap.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np


# ------------------------------------------------------------- training state
def save_train_state(path: str, params, opt_state, step: int) -> None:
    import orbax.checkpoint as ocp
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(os.path.abspath(path), f"step_{step}"),
              {"params": params, "opt_state": opt_state})
    with open(os.path.join(path, "latest.json"), "w") as f:
        json.dump({"step": step}, f)


def load_train_state(path: str):
    import orbax.checkpoint as ocp
    with open(os.path.join(path, "latest.json")) as f:
        step = json.load(f)["step"]
    ckpt = ocp.PyTreeCheckpointer()
    tree = ckpt.restore(os.path.join(os.path.abspath(path), f"step_{step}"))
    return tree["params"], tree["opt_state"], step


# ------------------------------------------------------------- runtime state
def snapshot_detector(model) -> dict:
    """Extract the resumable state of any filter model."""
    state: dict = {"type": type(model).__name__}
    if hasattr(model, "tracks"):          # FaceDetector
        state["tracks"] = [
            {"faces": [(f.x, f.y, f.w, f.h, f.id) for f in t.faces],
             "next_id": t.next_id, "empty_frames": t.empty_frames}
            for t in model.tracks
        ]
        state["gop_counter"] = model.gop.counter
        state["gate_budget"] = model.gate.budget
    if hasattr(model, "_streams"):        # part detectors (per-stream)
        state["streams"] = {
            int(sid): {
                "prev": {k: list(v) for k, v in st.prev.items()},
                "empty_count": dict(st.empty_count),
                "gop_counter": st.gop.counter,
                "gate_budget": st.gate.budget,
            }
            for sid, st in model._streams.items()
        }
        # stream-0 aliases keep old snapshots readable by old code.
        # Read stream 0's state explicitly — model._prev/gop/gate proxy
        # the ACTIVE (last-processed) stream, which need not be stream 0.
        st0 = model._streams.get(0)
        if st0 is not None:
            state["prev"] = {k: list(v) for k, v in st0.prev.items()}
            state["gop_counter"] = st0.gop.counter
            state["gate_budget"] = st0.gate.budget
    if hasattr(model, "_states") and hasattr(model, "_frame_idx"):  # Tracker
        state["tracker_streams"] = {
            int(sid): {
                "mhi": np.asarray(ts.mhi),
                "prev_gray": np.asarray(ts.prev_gray),
                "initialized": bool(np.asarray(ts.initialized)),
                "frame_idx": model._frame_idx.get(sid, 0),
            }
            for sid, ts in model._states.items()
        }
        st0 = state["tracker_streams"].get(0)
        if st0 is not None:   # stream-0 aliases (back-compat)
            state["mhi"] = st0["mhi"]
            state["prev_gray"] = st0["prev_gray"]
            state["initialized"] = st0["initialized"]
            state["frame_idx"] = st0["frame_idx"]
    return state


def restore_detector(model, state: dict) -> None:
    if "tracks" in state:
        from ..models.face import TrackedFace
        for t, ts in zip(model.tracks, state["tracks"]):
            t.faces = [TrackedFace(*f) for f in ts["faces"]]
            t.next_id = ts["next_id"]
            t.empty_frames = ts["empty_frames"]
        model.gop.counter = state.get("gop_counter", 0)
        model.gate.budget = state.get("gate_budget", 0)
    if "streams" in state:                # per-stream part state
        for sid, snap in state["streams"].items():
            st = model._stream_state(int(sid))
            st.prev = {k: [tuple(r) for r in v]
                       for k, v in snap["prev"].items()}
            st.empty_count = dict(snap.get("empty_count", {}))
            st.gop.counter = snap.get("gop_counter", 0)
            st.gate.budget = snap.get("gate_budget", 0)
    elif "prev" in state:                 # old single-stream snapshot
        model._prev = {k: [tuple(r) for r in v]
                       for k, v in state["prev"].items()}
        model.gop.counter = state.get("gop_counter", 0)
        model.gate.budget = state.get("gate_budget", 0)
    if "tracker_streams" in state:
        import jax.numpy as jnp
        from ..models.tracker import TrackerState
        for sid, snap in state["tracker_streams"].items():
            model._states[int(sid)] = TrackerState(
                prev_gray=jnp.asarray(snap["prev_gray"]),
                mhi=jnp.asarray(snap["mhi"]),
                initialized=jnp.asarray(snap["initialized"]))
            model._frame_idx[int(sid)] = snap["frame_idx"]
    elif "mhi" in state:                  # old single-stream snapshot
        import jax.numpy as jnp
        from ..models.tracker import TrackerState
        model.state = TrackerState(
            prev_gray=jnp.asarray(state["prev_gray"]),
            mhi=jnp.asarray(state["mhi"]),
            initialized=jnp.asarray(state["initialized"]))
        model.frame_idx = state["frame_idx"]


def save_runtime(path: str, models: dict) -> None:
    with open(path, "wb") as f:
        pickle.dump({name: snapshot_detector(m) for name, m in models.items()},
                    f)


def load_runtime(path: str, models: dict) -> None:
    with open(path, "rb") as f:
        snaps = pickle.load(f)
    for name, model in models.items():
        if name in snaps:
            restore_detector(model, snaps[name])
