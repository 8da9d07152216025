"""Device mesh + sharding layer (SURVEY.md §2.5).

The reference has no distributed backend (one GStreamer thread per filter;
scale-out was one-pipeline-per-stream across Kurento instances). The
TPU-native equivalent maps those concurrency dimensions onto SPMD:

  * one-filter-per-stream        → batch/data parallelism over a ``data``
    mesh axis: frame batches from many streams sharded across chips (ICI)
  * per-frame cascade stages     → stay on-chip (fused kernels)
  * window-grid parallelism      → ``model`` axis for the learned detector's
    tensor-parallel head (and for sharding cascade feature matmuls)
  * cross-shard result gather    → XLA collectives (all_gather / psum)

Multi-host: `init_distributed()` wires jax.distributed over DCN; the mesh
is laid out devices-major so `data` neighbors share ICI links.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None, num_processes=None,
                     process_id=None):
    """Multi-host bring-up over DCN (no-op when single-process)."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """('data', 'model') mesh. Defaults to all local devices on 'data'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    devices = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Frame batches sharded over streams/batch on the data axis."""
    return NamedSharding(mesh, P("data", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def cnn_param_shardings(mesh: Mesh, params) -> dict:
    """Data-parallel backbone (replicated) + tensor-parallel head:
    head1.w is sharded over its output features, head2.w over its input
    features — the classic pair that needs exactly one psum."""
    def spec_for(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if name == "head1/w":
            return NamedSharding(mesh, P(None, "model"))
        if name == "head1/b":
            return NamedSharding(mesh, P("model"))
        if name == "head2/w":
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_frames(mesh: Mesh, frames):
    return jax.device_put(frames, frame_sharding(mesh))
