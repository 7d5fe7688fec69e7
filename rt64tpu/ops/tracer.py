"""Wavefront ray tracer — XLA reference path.

Replaces DXR's driver traversal + any-hit callbacks (TraceRay with
RAY_FLAG_FORCE_NON_OPAQUE and the emitted insertion sort at
rt64_shader.cpp:547-581) with a wavefront design:

  * The closest *opaque-class* hit is a pure masked min-reduction —
    no sorting, no divergence. A triangle is opaque-class when its
    evaluated combiner alpha is guaranteed 1 (no opt_alpha, no noise,
    solid alpha multiplier >= 1); classification happens per frame in
    scene assembly.
  * *Alpha-class* hits are collected into K ordered slots per ray
    (K = MAX_HIT_QUERIES analog, GlobalHitBuffers.hlsli:8), kept
    sorted by depth-biased t exactly like the reference's per-pixel
    insertion sort (WithDistanceBias, Instances.hlsli).
  * Shading/alpha evaluation happens afterwards in one batched pass
    (ops/shading.py) — the reference's any-hit work, hoisted out of
    traversal.

This module is the always-correct XLA implementation; the Pallas
packet kernels (ops/tracer_pallas.py) are the performance path and are
validated against it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

RAY_MIN_DISTANCE = 0.1  # Ray.hlsli:8
RAY_MAX_DISTANCE = 100000.0  # Ray.hlsli:9
_BIG = 3.0e37


class TraceScene(NamedTuple):
    """Flattened world-space triangle soup (see pipeline/scene_buffers)."""

    v0: jax.Array  # (T, 3) world triangle corners
    v1: jax.Array
    v2: jax.Array
    valid: jax.Array  # (T,) bool — padding is False
    alpha: jax.Array  # (T,) bool — alpha-class (needs any-hit evaluation)
    no_cull: jax.Array  # (T,) bool — instance disables backface culling
    bias: jax.Array  # (T,) float — per-instance depthBias sort bias


class Hits(NamedTuple):
    """Trace output: closest opaque hit + K nearest alpha-class hits."""

    t_op: jax.Array  # (N,) unbiased t of the opaque hit (BIG when none)
    tri_op: jax.Array  # (N,) triangle index, -1 when none
    uv_op: jax.Array  # (N, 2) barycentrics of the opaque hit
    t_a: jax.Array  # (N, K) biased-sorted, unbiased t values (BIG pad)
    tri_a: jax.Array  # (N, K) triangle indices, -1 pad
    uv_a: jax.Array  # (N, K, 2)


def _intersect_chunk(origins, dirs, v0, v1, v2, t_min, t_max, cull_backface, no_cull):
    """Moller-Trumbore: rays (N,3) x triangles (C,3) -> (N,C) hits.

    Front face matches the reference's geometric normal convention
    (triangleNormal = -cross(p2-p0, p1-p0), rt64_shader.cpp:176): a
    triangle is front-facing when det > 0.
    """
    eps = jnp.float32(1e-9)
    e1 = v1 - v0  # (C, 3)
    e2 = v2 - v0
    # pvec = dir x e2 : (N, C, 3)
    pvec = jnp.cross(dirs[:, None, :], e2[None, :, :])
    det = jnp.sum(e1[None, :, :] * pvec, axis=-1)  # (N, C)
    if cull_backface:
        keep = jnp.where(no_cull[None, :], jnp.abs(det) > eps, det > eps)
    else:
        keep = jnp.abs(det) > eps
    inv_det = 1.0 / jnp.where(keep, det, 1.0)
    tvec = origins[:, None, :] - v0[None, :, :]  # (N, C, 3)
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(dirs[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    hit = (
        keep
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= t_min[:, None])
        & (t <= t_max[:, None])
    )
    return t, u, v, hit


def trace(
    origins,
    dirs,
    t_min,
    t_max,
    scene: TraceScene,
    k_alpha: int,
    cull_backface: bool = True,
    chunk: int = 128,
) -> Hits:
    """Trace rays against the full scene.

    origins/dirs: (N, 3); dirs may be non-normalized (t is measured in
    units of |dir| like DXR). t_min/t_max: (N,). Returns Hits.
    """
    n = origins.shape[0]
    t_total = scene.v0.shape[0]
    chunk = min(chunk, t_total)
    assert t_total % chunk == 0, (t_total, chunk)
    n_chunks = t_total // chunk

    def body(carry, ci):
        t_op, tri_op, uv_op, t_a, tri_a, uv_a = carry
        s = ci * chunk
        v0 = jax.lax.dynamic_slice_in_dim(scene.v0, s, chunk)
        v1 = jax.lax.dynamic_slice_in_dim(scene.v1, s, chunk)
        v2 = jax.lax.dynamic_slice_in_dim(scene.v2, s, chunk)
        valid = jax.lax.dynamic_slice_in_dim(scene.valid, s, chunk)
        alpha = jax.lax.dynamic_slice_in_dim(scene.alpha, s, chunk)
        no_cull = jax.lax.dynamic_slice_in_dim(scene.no_cull, s, chunk)
        bias = jax.lax.dynamic_slice_in_dim(scene.bias, s, chunk)

        t, u, v, hit = _intersect_chunk(
            origins, dirs, v0, v1, v2, t_min, t_max, cull_backface, no_cull
        )
        hit = hit & valid[None, :]
        tb = t - bias[None, :]  # sort key with depth bias (Instances.hlsli)

        # Opaque-class: masked min-reduce on biased t.
        op_key = jnp.where(hit & ~alpha[None, :], tb, _BIG)
        arg = jnp.argmin(op_key, axis=1)  # (N,)
        best = jnp.take_along_axis(op_key, arg[:, None], axis=1)[:, 0]
        # t_op carries the *biased* key for comparisons; unbias at the end.
        better = best < t_op
        tri_new = s + arg
        t_op2 = jnp.where(better, best, t_op)
        tri_op2 = jnp.where(better, tri_new, tri_op)
        uv_new = jnp.stack(
            [
                jnp.take_along_axis(u, arg[:, None], 1)[:, 0],
                jnp.take_along_axis(v, arg[:, None], 1)[:, 0],
            ],
            axis=-1,
        )
        uv_op2 = jnp.where(better[:, None], uv_new, uv_op)

        if k_alpha > 0:
            # Alpha-class: merge chunk candidates into the K best slots.
            a_key = jnp.where(hit & alpha[None, :], tb, _BIG)
            merged_key = jnp.concatenate([t_a, a_key], axis=1)  # (N, K+C)
            col = jnp.arange(chunk, dtype=jnp.int32)
            cand_tri = jnp.broadcast_to(s + col, (n, chunk))
            merged_tri = jnp.concatenate([tri_a, cand_tri], axis=1)
            cand_uv = jnp.stack([u, v], axis=-1)
            merged_uv = jnp.concatenate([uv_a, cand_uv], axis=1)
            neg, idx = jax.lax.top_k(-merged_key, k_alpha)
            t_a2 = -neg
            tri_a2 = jnp.take_along_axis(merged_tri, idx, axis=1)
            uv_a2 = jnp.take_along_axis(merged_uv, idx[..., None], axis=1)
        else:
            t_a2, tri_a2, uv_a2 = t_a, tri_a, uv_a

        return (t_op2, tri_op2, uv_op2, t_a2, tri_a2, uv_a2), None

    k = max(k_alpha, 1)
    init = (
        jnp.full((n,), _BIG, jnp.float32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n, 2), jnp.float32),
        jnp.full((n, k), _BIG, jnp.float32),
        jnp.full((n, k), -1, jnp.int32),
        jnp.zeros((n, k, 2), jnp.float32),
    )
    (t_op, tri_op, uv_op, t_a, tri_a, uv_a), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )

    # Unbias: stored keys are t - bias; recover true t for positions
    # (WithoutDistanceBias, Instances.hlsli).
    tri_op = jnp.where(t_op < _BIG * 0.5, tri_op, -1)
    t_op = jnp.where(tri_op >= 0, t_op + scene.bias[jnp.maximum(tri_op, 0)], _BIG)
    tri_a = jnp.where(t_a < _BIG * 0.5, tri_a, -1)
    t_a = jnp.where(tri_a >= 0, t_a + scene.bias[jnp.maximum(tri_a, 0)], _BIG)

    # Alpha hits behind the opaque hit can never contribute; drop them
    # so shading skips their texture gathers cheaply.
    behind = (t_a - _gather_bias(scene, tri_a)) > (
        t_op - _gather_bias(scene, tri_op)
    )[:, None]
    tri_a = jnp.where(behind, -1, tri_a)
    t_a = jnp.where(behind, _BIG, t_a)

    return Hits(t_op, tri_op, uv_op, t_a, tri_a, uv_a)


def _gather_bias(scene: TraceScene, tri):
    b = scene.bias[jnp.maximum(tri, 0)]
    return jnp.where(tri >= 0, b, 0.0)


def trace_shadow(
    origins, dirs, t_min, t_max, scene: TraceScene, k_alpha: int,
    chunk: int = 128,
) -> Hits:
    """Shadow-ray trace (TraceShadow, Lights.hlsli:27-53).

    An opaque-class hit anywhere in range fully blocks the ray
    (combiner alpha 1 -> payload.shadowHit hits 0); alpha-class hits
    are collected for the batched shadow-alpha accumulation
    (rt64_shader.cpp:594-674). Backface culling is off: the reference
    leaves SKIP_BACKFACE_SHADOWS undefined (Lights.hlsli:46-48).
    """
    return trace(
        origins, dirs, t_min, t_max, scene,
        k_alpha=k_alpha, cull_backface=False, chunk=chunk,
    )
