"""Sharded execution: multi-chip detection and training steps.

Detection: the frame batch (many streams) is sharded over the ``data`` mesh
axis; the cascade pipeline runs SPMD per shard; detections are gathered with
an all_gather so every host sees the full result set (SURVEY.md §2.5 —
"all-gather of per-shard detections").

Training (learned detector): data-parallel over ``data`` with
tensor-parallel head over ``model``; gradients are combined by XLA from the
sharding annotations (psum over data for replicated params, reduce-scatter
style for sharded head weights — all compiler-inserted).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import cnn
from .mesh import cnn_param_shardings, frame_sharding, replicated


def make_sharded_detect(engine, mesh: Mesh):
    """Jit the cascade engine's detection over a ('data','model') mesh with
    the frame batch sharded on data. Returns fn(gray [B,H,W]) →
    (boxes, valid, overflow) fully replicated (all-gathered)."""

    @functools.partial(
        jax.jit,
        in_shardings=frame_sharding(mesh),
        out_shardings=replicated(mesh),
    )
    def detect(gray):
        return engine._detect_impl(gray)

    return detect


def make_sharded_detect_grouped(engine, mesh: Mesh, min_neighbors: int = 3):
    """The FULL per-frame device program (cascade + on-device minNeighbors
    grouping) sharded over 'data'. Grouping is per-frame independent, so it
    runs shard-local; only the grouped [B,K] outputs are all-gathered.
    Returns fn(gray [B,H,W]) → (boxes, valid, weights, overflow)."""

    @functools.partial(
        jax.jit,
        in_shardings=frame_sharding(mesh),
        out_shardings=replicated(mesh),
    )
    def detect(gray):
        return engine._group_impl(*engine._detect_impl(gray),
                                  min_neighbors=min_neighbors)

    return detect


def make_sharded_chain(face_engine, part_engines, mesh: Mesh,
                       min_neighbors: int = 3):
    """The reference's default filter chain as ONE sharded device program:
    the face cascade (grouped on device) plus each part cascade at part
    resolution with candidates device-compacted — the multi-device
    counterpart of bench.py's phase_chain / MediaRunner's event-chained
    deployment (ONE face pass feeds all part detectors,
    kmseyedetect.cpp:680-724 chaining semantics).

    Both image batches are sharded on ``data`` (every per-frame stage is
    shard-local); only the grouped face boxes and the compacted part
    candidates are all-gathered. Returns
    fn(face_gray [B,fh,fw], part_gray [B,ph,pw]) →
    ((fboxes, fvalid, fweights, foverflow), {name: (pboxes, pvalid,
    poverflow)}).
    """
    names = list(part_engines)

    @functools.partial(
        jax.jit,
        in_shardings=(frame_sharding(mesh), frame_sharding(mesh)),
        out_shardings=replicated(mesh),
    )
    def chain(face_gray, part_gray):
        face = face_engine._group_impl(
            *face_engine._detect_impl(face_gray),
            min_neighbors=min_neighbors)
        parts = {
            n: part_engines[n]._compact_raw_impl(
                *part_engines[n]._detect_impl(part_gray))
            for n in names
        }
        return face, parts

    return chain


def make_sharded_train_step(optimizer, mesh: Mesh, params, opt_state):
    """Returns (train_step_fn, sharded_params, sharded_opt_state) with
    dp (batch) × tp (head features) shardings applied."""
    p_shard = cnn_param_shardings(mesh, params)
    # Optimizer state: adam's mu/nu are pytrees with the SAME STRUCTURE as
    # params, so any opt-state subtree that is structurally a param tree
    # mirrors the param shardings LEAF-FOR-LEAF (structural identity, not
    # shape lookup — two params with equal shapes but different shardings
    # map correctly); scalar state (step count) and anything param-unlike
    # is replicated.
    p_treedef = jax.tree.structure(params)

    def _is_param_tree(x):
        return jax.tree.structure(x) == p_treedef

    o_shard = jax.tree.map(
        lambda sub: (p_shard if _is_param_tree(sub)
                     else jax.tree.map(lambda _: replicated(mesh), sub)),
        opt_state, is_leaf=_is_param_tree)
    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, o_shard)

    @functools.partial(
        jax.jit,
        in_shardings=(p_shard, o_shard,
                      NamedSharding(mesh, P("data", None, None)),
                      NamedSharding(mesh, P("data", None, None)),
                      NamedSharding(mesh, P("data", None, None, None))),
        out_shardings=(p_shard, o_shard,
                       replicated(mesh)),
        donate_argnums=(0, 1),
    )
    def step(params, opt_state, gray, obj_t, reg_t):
        return cnn.train_step(params, opt_state, gray, obj_t, reg_t,
                              optimizer=optimizer)

    return step, params, opt_state
