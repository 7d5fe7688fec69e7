"""Wavefront ray tracer — XLA path, structure-of-arrays layout.

Replaces DXR's driver traversal + any-hit callbacks (TraceRay with
RAY_FLAG_FORCE_NON_OPAQUE and the emitted insertion sort at
rt64_shader.cpp:547-581) with a wavefront design tuned for TPU:

  * ALL hot-loop math is structure-of-arrays: ray and triangle vector
    components are separate (N, 1)/(1, C) planes so every op is a
    well-tiled (N, C) VPU op. Trailing-dim-3 tensors are catastrophic
    on TPU (the minor dim pads to the 128-lane tile): the SoA form
    measured 6.7x faster *and* ~500x faster to compile.
  * The closest *opaque-class* hit is a pure masked min-reduction over
    triangle chunks — no sorting, no divergence. A triangle is
    opaque-class when its evaluated combiner alpha is guaranteed 1;
    classification happens in scene assembly.
  * *Alpha-class* triangles (foliage, decals — a small fraction of any
    N64 scene) are compacted into a dense side list each frame; only
    that list feeds the K-ordered hit collection (K = MAX_HIT_QUERIES
    analog, GlobalHitBuffers.hlsli:8), sorted by depth-biased t like
    the reference's per-pixel insertion sort (WithDistanceBias,
    Instances.hlsli).
  * Shading/alpha evaluation happens afterwards in one batched pass
    (ops/shading.py) — the reference's any-hit work, hoisted out of
    traversal.

The Pallas packet kernels (ops/tracer_pallas.py) add cluster culling on
top; this module is the always-correct XLA implementation they are
validated against.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rt64tpu.ops.vecmath import pvary

RAY_MIN_DISTANCE = 0.1  # Ray.hlsli:8
RAY_MAX_DISTANCE = 100000.0  # Ray.hlsli:9
_BIG = 3.0e37


@jax.tree_util.register_pytree_node_class
class TraceScene(NamedTuple):
    """Flattened world-space triangle soup, SoA (see scene_buffers).

    vx0[c] etc. hold component c of each corner: shape (3, T).
    `has_alpha` is STATIC pytree aux data: True/False compiles the alpha
    sweep in/out (a runtime lax.cond fences the TPU schedule); None
    keeps the runtime skip for callers without host knowledge.
    """

    v0: jax.Array  # (3, T) world corner 0 components
    v1: jax.Array  # (3, T)
    v2: jax.Array  # (3, T)
    valid: jax.Array  # (T,) bool — padding is False
    alpha: jax.Array  # (T,) bool — alpha-class (needs any-hit evaluation)
    no_cull: jax.Array  # (T,) bool — instance disables backface culling
    bias: jax.Array  # (T,) float — per-instance depthBias sort bias
    alpha_idx: jax.Array  # (A,) int32 — compacted alpha triangle ids, -1 pad
    has_alpha: bool | None = None  # STATIC (aux): scene has alpha tris

    def tree_flatten(self):
        return tuple(self[:-1]), self.has_alpha

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, has_alpha=aux)

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[1]

    def corners_aos(self):
        """(T, 3) corner views for shading-side consumers."""
        return self.v0.T, self.v1.T, self.v2.T


def make_trace_scene_arrays(v0_aos, v1_aos, v2_aos, valid, alpha, no_cull, bias,
                            alpha_cap: int) -> TraceScene:
    """Build a TraceScene from (T, 3) corner arrays."""
    return TraceScene(
        v0=v0_aos.T, v1=v1_aos.T, v2=v2_aos.T,
        valid=valid, alpha=alpha, no_cull=no_cull, bias=bias,
        alpha_idx=compact_alpha(valid, alpha, alpha_cap),
    )


def compact_alpha(valid, alpha, capacity: int):
    """Dense list of alpha-class triangle indices (padded with -1)."""
    is_alpha = valid & alpha
    order = jnp.argsort(~is_alpha, stable=True)
    idx = order[:capacity].astype(jnp.int32)
    keep = jnp.take(is_alpha, idx)
    return jnp.where(keep, idx, -1)


def sort_alpha_spatial(alpha_idx, v0, v1, v2):
    """Reorder the compacted alpha list by Morton code of the triangle
    centroid (world space, in-jit).

    The alpha cull boxes (_alpha_chunk_aabbs) chunk the compacted list
    in order; upload order groups triangles by INSTANCE, so e.g. the
    castle's foliage billboards — placed randomly across the map —
    produce chunk AABBs spanning the whole scene and a useless cull
    (51% of primary rays were 'candidates'). Morton-sorting the list by
    centroid keeps each chunk spatially tight, the same trick the
    opaque side gets from mesh-upload Morton ordering
    (ops/geometry.morton_order). A ~256-element argsort is noise.

    -1 pads sort to the end (key 0xFFFFFFFF)."""
    live = alpha_idx >= 0
    safe = jnp.maximum(alpha_idx, 0)
    c = (v0[:, safe] + v1[:, safe] + v2[:, safe]) * (1.0 / 3.0)  # (3, A)
    big = jnp.float32(_BIG)
    lo = jnp.where(live[None], c, big).min(axis=1)
    hi = jnp.where(live[None], c, -big).max(axis=1)
    ext = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(
        (c - lo[:, None]) / ext[:, None] * 1023.0, 0.0, 1023.0
    ).astype(jnp.uint32)

    def expand(v):
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    code = (expand(q[0]) << 2) | (expand(q[1]) << 1) | expand(q[2])
    key = jnp.where(live, code, jnp.uint32(0xFFFFFFFF))
    return jnp.take(alpha_idx, jnp.argsort(key))


class Hits(NamedTuple):
    """Trace output: closest opaque hit + K nearest alpha-class hits."""

    t_op: jax.Array  # (N,) unbiased t of the opaque hit (BIG when none)
    tri_op: jax.Array  # (N,) triangle index, -1 when none
    uv_op: jax.Array  # (N, 2) barycentrics of the opaque hit
    t_a: jax.Array  # (N, K) biased-sorted, unbiased t values (BIG pad)
    tri_a: jax.Array  # (N, K) triangle indices, -1 pad
    uv_a: jax.Array  # (N, K, 2)
    alpha_dropped: jax.Array  # () int32 — rays culled past the alpha
    # compaction capacity (trace_alpha compact_capacity); 0 when exact


class _Rays(NamedTuple):
    """SoA ray bundle: each component (N, 1)."""

    ox: jax.Array
    oy: jax.Array
    oz: jax.Array
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    t_min: jax.Array
    t_max: jax.Array

    @staticmethod
    def of(origins, dirs, t_min, t_max) -> "_Rays":
        """origins/dirs: planar (3, N)."""
        return _Rays(
            ox=origins[0][:, None], oy=origins[1][:, None], oz=origins[2][:, None],
            dx=dirs[0][:, None], dy=dirs[1][:, None], dz=dirs[2][:, None],
            t_min=t_min[:, None], t_max=t_max[:, None],
        )


def _intersect_soa(r: _Rays, c0, c1, c2, no_cull, cull_backface: bool):
    """Moller-Trumbore, SoA: rays (N,1 planes) x tris (3,C) -> (N,C).

    Front face matches the reference's geometric normal convention
    (triangleNormal = -cross(p2-p0, p1-p0), rt64_shader.cpp:176): a
    triangle is front-facing when det > 0.

    Returns (t, u, v, hit).
    """
    eps = jnp.float32(1e-9)
    row = lambda m, i: m[i][None, :]  # (1, C)
    e1x = row(c1, 0) - row(c0, 0)
    e1y = row(c1, 1) - row(c0, 1)
    e1z = row(c1, 2) - row(c0, 2)
    e2x = row(c2, 0) - row(c0, 0)
    e2y = row(c2, 1) - row(c0, 1)
    e2z = row(c2, 2) - row(c0, 2)
    # pvec = dir x e2
    px = r.dy * e2z - r.dz * e2y
    py = r.dz * e2x - r.dx * e2z
    pz = r.dx * e2y - r.dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    if cull_backface:
        keep = jnp.where(no_cull[None, :], jnp.abs(det) > eps, det > eps)
    else:
        keep = jnp.abs(det) > eps
    inv_det = 1.0 / jnp.where(keep, det, 1.0)
    tx = r.ox - row(c0, 0)
    ty = r.oy - row(c0, 1)
    tz = r.oz - row(c0, 2)
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (r.dx * qx + r.dy * qy + r.dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        keep & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= r.t_min) & (t <= r.t_max)
    )
    return t, u, v, hit


def trace_opaque(
    origins, dirs, t_min, t_max, scene: TraceScene,
    cull_backface: bool = True, chunk: int = 512,
):
    """Closest opaque-class hit: masked min-reduce over triangle chunks.

    origins/dirs: planar (3, N). Returns (t_biased, tri, uv): tri = -1
    for miss; t is the *biased* sort key (caller unbias via scene.bias).
    """
    n = origins.shape[1]
    t_total = scene.num_triangles
    chunk = min(chunk, t_total)
    assert t_total % chunk == 0, (t_total, chunk)
    n_chunks = t_total // chunk
    rays = _Rays.of(origins, dirs, t_min, t_max)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(carry, ci):
        t_op, tri_op = carry
        s = ci * chunk
        sl3 = lambda a: jax.lax.dynamic_slice(a, (0, s), (3, chunk))
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s, chunk)
        t, u, v, hit = _intersect_soa(
            rays, sl3(scene.v0), sl3(scene.v1), sl3(scene.v2),
            sl(scene.no_cull), cull_backface,
        )
        hit = hit & (sl(scene.valid) & ~sl(scene.alpha))[None, :]
        key = jnp.where(hit, t - sl(scene.bias)[None, :], _BIG)
        # Min + masked index reduce: no argmin/take_along_axis (gathers
        # are the expensive op on TPU; two reduces are nearly free).
        best = key.min(axis=1)
        idx = jnp.where(key <= best[:, None], s + col, -1).max(axis=1)
        better = best < t_op
        t_op = jnp.where(better, best, t_op)
        tri_op = jnp.where(better, idx, tri_op)
        return (t_op, tri_op), None

    init = pvary(
        (jnp.full((n,), _BIG, jnp.float32), jnp.full((n,), -1, jnp.int32))
    )
    (t_op, tri_op), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    tri_op = jnp.where(t_op < _BIG * 0.5, tri_op, -1)
    # Recover barycentrics by re-intersecting only the winning triangle
    # (one row-gather per ray).
    uv_op = _reintersect_uv(rays, scene, tri_op)
    return t_op, tri_op, uv_op


def _reintersect_uv(rays: _Rays, scene: TraceScene, tri):
    """Barycentrics of a known hit triangle per ray: gather its corners
    (3 small row-gathers) and redo the Moller-Trumbore uv math."""
    tri_s = jnp.maximum(tri, 0)
    c0 = scene.v0[:, tri_s]  # (3, N)
    c1 = scene.v1[:, tri_s]
    c2 = scene.v2[:, tri_s]
    return _uv_from_corners(rays, c0, c1, c2, tri)


def _uv_from_corners(rays: _Rays, c0, c1, c2, tri):
    e1 = c1 - c0
    e2 = c2 - c0
    dx, dy, dz = rays.dx[:, 0], rays.dy[:, 0], rays.dz[:, 0]
    px = dy * e2[2] - dz * e2[1]
    py = dz * e2[0] - dx * e2[2]
    pz = dx * e2[1] - dy * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    tx = rays.ox[:, 0] - c0[0]
    ty = rays.oy[:, 0] - c0[1]
    tz = rays.oz[:, 0] - c0[2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1[2] - tz * e1[1]
    qy = tz * e1[0] - tx * e1[2]
    qz = tx * e1[1] - ty * e1[0]
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    ok = (tri >= 0)
    return jnp.stack([jnp.where(ok, u, 0.0), jnp.where(ok, v, 0.0)], axis=-1)


def _extract_k_smallest(key, ids, k: int, payloads=()):
    """K smallest (key, id) pairs per row, ascending — built ONLY from
    min/max reduces and masked selects. TPU top_k lowers to a full sort
    (measured ~30x slower at this shape); k passes of masked
    min-extraction are nearly free on the VPU.

    key: (N, M) float; ids: (1, M) or (N, M) int32 triangle ids.
    payloads: extra (N, M) float arrays extracted at the same columns
    (gather-free payload carry — TPU gathers cost per row).
    Returns (t (N, K) ascending, tri (N, K), *payloads (N, K)),
    -1/_BIG/0 padded.
    """
    m = key.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    ids = jnp.broadcast_to(ids, key.shape) if ids.shape[0] == 1 else ids
    ts, tris = [], []
    pls = [[] for _ in payloads]
    for _ in range(k):
        best = key.min(axis=1)
        sel = key <= best[:, None]
        # Choose one column (max col among ties), then read ITS id and
        # mask exactly that column out — ids and mask must agree.
        csel = jnp.where(sel, col, -1).max(axis=1)
        at = col == csel[:, None]
        tri = jnp.where(at, ids, -1).max(axis=1)
        miss = best >= _BIG * 0.5
        ts.append(jnp.where(miss, _BIG, best))
        tris.append(jnp.where(miss, -1, tri))
        for acc, p in zip(pls, payloads):
            pv = jnp.where(at, p, -_BIG).max(axis=1)
            acc.append(jnp.where(miss, 0.0, pv))
        key = jnp.where(at, _BIG, key)
    return (jnp.stack(ts, axis=1), jnp.stack(tris, axis=1),
            *[jnp.stack(acc, axis=1) for acc in pls])


def trace_alpha(
    origins, dirs, t_min, t_max, scene: TraceScene, k_alpha: int,
    cull_backface: bool, chunk: int = 256, compact_capacity: int = 0,
):
    """K nearest alpha-class hits over the compacted alpha list.

    Returns (t_biased (N,K) sorted, tri (N,K), uv (N,K,2),
    bias (N,K) — the extracted hits' depth biases, dropped).
    The K-slot collection is sort-free (see _extract_k_smallest) and
    gather-free: barycentrics ride the extraction as masked-reduce
    payloads.

    With compact_capacity > 0 the sweep is CULLED + COMPACTED: each ray
    slab-tests the alpha list's 128-triangle chunk AABBs (O(N x A/128),
    tiny), and only the rays whose segment can touch alpha geometry —
    typically a few percent — run the O(rays x A) intersection sweep.
    Rays beyond the capacity are dropped and counted (`dropped`); the
    caller grows the capacity and re-specializes (the capacity-bucket
    pattern; see shading.shade_hits_compacted). This is the alpha-side
    analog of the driver BVH cull the reference gets for free
    (contrib/nv_helpers_dx12).
    """
    n = origins.shape[1]
    k = k_alpha
    a_cap = scene.alpha_idx.shape[0]
    # The cull+compact detour costs ~2 ms of gathers/scatters at 480p;
    # it only wins once the raw sweep is the bigger term. Profiling the
    # castle frame showed the direct sweep's (N, A) masked-extraction
    # planes dominate from A=256 up (~19 ms at 480p), so compact for
    # any list past one chunk; only tiny lists take the direct sweep.
    if compact_capacity and 0 < compact_capacity < n and a_cap >= 128:
        from rt64tpu.ops.shading import compact_indices

        lo_c, hi_c = _alpha_chunk_aabbs(scene)
        hit_c = _slab_any(origins, dirs, t_min, t_max, lo_c, hi_c)
        ray_mask = hit_c.any(axis=1)

        idx, count = compact_indices(ray_mask, compact_capacity)
        safe_r = jnp.minimum(idx, n - 1)
        live_r = idx < n
        o_c = origins[:, safe_r]
        d_c = dirs[:, safe_r]
        tmin_c = t_min[safe_r]
        tmax_c = jnp.where(live_r, t_max[safe_r], tmin_c - 1.0)
        t_cc, tri_cc, uv_cc, b_cc = _alpha_sweep(
            o_c, d_c, tmin_c, tmax_c, scene, k, cull_backface, chunk
        )
        t_a = jnp.full((n, k), _BIG, jnp.float32).at[idx].set(
            t_cc, mode="drop")
        tri_a = jnp.full((n, k), -1, jnp.int32).at[idx].set(
            tri_cc, mode="drop")
        uv_a = jnp.zeros((n, k, 2), jnp.float32).at[idx].set(
            uv_cc, mode="drop")
        b_a = jnp.zeros((n, k), jnp.float32).at[idx].set(b_cc, mode="drop")
        return (t_a, tri_a, uv_a, b_a,
                jnp.maximum(count - compact_capacity, 0))
    t_a, tri_a, uv_a, b_a = _alpha_sweep(
        origins, dirs, t_min, t_max, scene, k, cull_backface, chunk
    )
    return t_a, tri_a, uv_a, b_a, jnp.int32(0)


def _alpha_chunk_aabbs(scene: TraceScene, ch: int = 128):
    """AABBs of the compacted alpha list in 128-triangle chunks
    (the alpha-side traversal-cull boxes): (lo (3, M), hi (3, M))."""
    ids = scene.alpha_idx
    a_cap = ids.shape[0]
    safe_t = jnp.maximum(ids, 0)
    alive = (ids >= 0)[None]
    g3 = lambda a: a[:, safe_t]
    av0, av1, av2 = g3(scene.v0), g3(scene.v1), g3(scene.v2)
    big = jnp.float32(_BIG)
    lo = jnp.where(alive, jnp.minimum(jnp.minimum(av0, av1), av2), big)
    hi = jnp.where(alive, jnp.maximum(jnp.maximum(av0, av1), av2), -big)
    pad_c = (-a_cap) % ch
    if pad_c:
        lo = jnp.concatenate([lo, jnp.full((3, pad_c), big)], axis=1)
        hi = jnp.concatenate([hi, jnp.full((3, pad_c), -big)], axis=1)
    nch = (a_cap + pad_c) // ch
    return lo.reshape(3, nch, ch).min(axis=2), hi.reshape(3, nch, ch).max(axis=2)


class AlphaCompact(NamedTuple):
    """K-hit alpha trace results in COMPACTED ray space (see
    trace_alpha_to_compact): callers shade and resolve in this space and
    scatter their fold results back once."""

    idx: jax.Array  # (CAP,) source ray lane, == n for pad lanes
    mask: jax.Array  # (N,) candidate mask (lane compacted iff mask &
    # rank(mask) < CAP) — lets the scatter-back run gather-side
    # (framegraph._scatter_carry), since TPU scatter with runtime
    # indices serializes
    origins: jax.Array  # (3, CAP) gathered ray origins
    dirs: jax.Array  # (3, CAP) gathered ray dirs
    noise: jax.Array  # (CAP,) gathered per-pixel noise
    t: jax.Array  # (CAP, K) UNBIASED hit t ascending by biased key (_BIG pad)
    tri: jax.Array  # (CAP, K) triangle ids (-1 pad)
    uv: jax.Array  # (CAP, K, 2) barycentrics
    extra: tuple  # gathered caller aux arrays (pytree of f32 (C?, CAP))
    dropped: jax.Array  # () int32 — candidate rays beyond CAP


def trace_alpha_to_compact(
    origins, dirs, t_min, t_max, scene: TraceScene, k_alpha: int,
    cull_backface: bool, capacity: int, noise_rand,
    t_opaque_biased=None, extra=(), chunk: int = 256,
):
    """Alpha K-hit trace with ONE cull+compact and NO full-width
    scatter-back.

    The previous shape (trace_alpha + per-slot shade_hits_compacted)
    compacted the same sparse alpha lanes up to 5 times per pass and
    scattered (N, K) t/tri/uv/bias planes plus K full HitShade planes
    back to full width — profiled at ~35 ms of the 480p castle frame.
    Here the slab cull + compaction runs ONCE; rays, noise, the opaque
    depth bound, and any caller `extra` per-ray arrays ride a single
    packed gather; the sweep, shading, and front-to-back resolve all
    stay in compacted space (framegraph._fold_shaded_slots scatters the
    resolved carry once at the end).

    Reference analog: the DXR any-hit sequence only ever touches rays
    whose BVH traversal reaches alpha geometry (rt64_shader.cpp:444+);
    this is the packet-framework equivalent of that sparsity.

    extra: pytree of float32 arrays shaped (N,) or (C, N), gathered to
    compacted width and returned as AlphaCompact.extra.
    t_opaque_biased: (N,) biased opaque-hit keys; alpha hits at/behind
    the opaque hit are masked out (they can never contribute).
    """
    from rt64tpu.ops.shading import compact_indices

    n = origins.shape[1]
    k = k_alpha
    # Per-TRIANGLE cull boxes when the alpha list is small: alpha
    # geometry is typically crossed flat billboards, whose per-instance
    # chunk AABB is a fat cube — measured 29% of castle primary rays
    # 'candidates' vs 5.2% against the flat per-triangle boxes. The
    # (N x A) slab test at A<=512 costs ~0.3 ms, far less than the
    # sweep width it removes; larger lists chunk by 4 to bound it.
    a_cap = scene.alpha_idx.shape[0]
    lo_c, hi_c = _alpha_chunk_aabbs(scene, ch=1 if a_cap <= 512 else 4)
    cull_tmax = t_max
    if t_opaque_biased is not None:
        # Only alpha hits IN FRONT of the opaque hit survive the
        # behind-mask below (key < t_opb, i.e. true t < t_opb + bias),
        # so the cull segment ends at the opaque hit: foliage behind
        # the terrain you're looking at — and the entire alpha list for
        # opaque-blocked shadow rays (t_opb == 0) — stops producing
        # candidates. Measured on the castle 480p frame this cut
        # primary alpha candidates 51% -> a few percent (the 2-chunk
        # AABBs alone spanned half the screen).
        alpha_bias_max = jnp.max(
            jnp.where(scene.alpha & scene.valid, scene.bias, 0.0)
        )
        cull_tmax = jnp.minimum(t_max, t_opaque_biased + alpha_bias_max)
    ray_mask = _slab_any_bundled(origins, dirs, t_min, cull_tmax, lo_c, hi_c)
    idx, count = compact_indices(ray_mask, capacity)
    safe_r = jnp.minimum(idx, n - 1)
    live_r = idx < n

    extra_leaves, extra_def = jax.tree_util.tree_flatten(extra)
    rows = [origins, dirs, t_min[None], t_max[None], noise_rand[None]]
    if t_opaque_biased is not None:
        rows.append(t_opaque_biased[None])
    for leaf in extra_leaves:
        rows.append(leaf[None] if leaf.ndim == 1 else leaf)
    packed = jnp.concatenate(rows, 0)
    # ROW-MAJOR gather: transpose once ((RR, N) -> (N, RR) is one
    # layout copy at full memory bandwidth), gather compacted ROWS,
    # transpose the small result back. Gathering columns of the (RR, N)
    # layout made XLA emit a per-plane loop-fusion gather (RR row
    # gathers of 4-byte rows) that profiled ~1 ms/call at 480p.
    g = packed.T[safe_r].T
    o_c, d_c = g[0:3], g[3:6]
    tmin_c = g[6]
    # Pad lanes get an empty interval: they sweep nothing.
    tmax_c = jnp.where(live_r, g[7], tmin_c - 1.0)
    noise_c = g[8]
    r = 9
    if t_opaque_biased is not None:
        t_opb_c = g[r]
        r += 1
    out_extra = []
    for leaf in extra_leaves:
        c = 1 if leaf.ndim == 1 else leaf.shape[0]
        got = g[r : r + c]
        out_extra.append(got[0] if leaf.ndim == 1 else got)
        r += c
    extra_c = jax.tree_util.tree_unflatten(extra_def, out_extra)

    t_cc, tri_cc, uv_cc, b_cc = _alpha_sweep(
        o_c, d_c, tmin_c, tmax_c, scene, k, cull_backface, chunk
    )
    if t_opaque_biased is not None:
        behind = t_cc >= t_opb_c[:, None]
        tri_cc = jnp.where(behind, -1, tri_cc)
        t_cc = jnp.where(behind, _BIG, t_cc)
    t_true = jnp.where(tri_cc >= 0, t_cc + b_cc, _BIG)
    return AlphaCompact(
        idx=idx, mask=ray_mask, origins=o_c, dirs=d_c, noise=noise_c,
        t=t_true, tri=tri_cc, uv=uv_cc, extra=extra_c,
        dropped=jnp.maximum(count - capacity, 0),
    )


def trace_opaque_only(
    origins, dirs, t_min, t_max, scene: TraceScene,
    cull_backface: bool = True, chunk: int = 512, opaque_fn=None,
):
    """Opaque-class closest hit with unbiasing folded in.

    Returns (t_true (N,), tri (N,), uv (N, 2), t_biased (N,));
    t_true/t_biased are _BIG for misses."""
    opaque = opaque_fn or trace_opaque
    res = opaque(
        origins, dirs, t_min, t_max, scene, cull_backface=cull_backface,
        chunk=chunk,
    )
    if len(res) == 4:
        t_opb, tri_op, uv_op, bias_op = res
    else:
        t_opb, tri_op, uv_op = res
        bias_op = scene.bias[jnp.maximum(tri_op, 0)]
    t_true = jnp.where(tri_op >= 0, t_opb + bias_op, _BIG)
    return t_true, tri_op, uv_op, t_opb


def _slab_any_bundled(origins, dirs, t_min, t_max, lo, hi, sub: int = 8):
    """Conservative per-ray any-box mask via SUB-ray interval bundles.

    The exact per-ray form materializes an (N, M) slab matrix — ~1.5 ms
    per frame on the castle shadow population at 480p. Bundling `sub`
    adjacent rays into an interval (origin box, direction box, live
    [t_min, t_max] hull) cuts that to (N/sub, M) at the price of a
    slightly looser mask; the alpha pipeline only uses this as a
    compaction PREFILTER (capacity-bounded, overflow counted), so the
    extra candidates cost cap headroom, not sweep width. Dead rays
    (empty interval) are excluded from the bundle hull and from the
    returned mask."""
    n = origins.shape[1]
    if n % sub:
        hit = _slab_any(origins, dirs, t_min, t_max, lo, hi)
        return hit.any(axis=1)
    ns = n // sub
    live = t_max >= t_min
    big = jnp.float32(_BIG)

    def b3(a, fill, red):
        m = jnp.where(live[None, :], a, fill)
        return red(m.reshape(3, ns, sub), axis=2)

    o_lo = b3(origins, big, jnp.min)
    o_hi = b3(origins, -big, jnp.max)
    d_lo = b3(dirs, big, jnp.min)
    d_hi = b3(dirs, -big, jnp.max)
    tmin_lo = jnp.where(live, t_min, big).reshape(ns, sub).min(axis=1)
    tmax_hi = jnp.where(live, t_max, -big).reshape(ns, sub).max(axis=1)

    m = lo.shape[1]
    t_lo = jnp.full((ns, m), -jnp.inf)
    t_hi = jnp.full((ns, m), jnp.inf)
    eps = 1e-12
    for c in range(3):
        mixed = ((d_lo[c] <= eps) & (d_hi[c] >= -eps))[:, None]
        inv_a = (1.0 / jnp.where(jnp.abs(d_lo[c]) > eps, d_lo[c], 1.0))[:, None]
        inv_b = (1.0 / jnp.where(jnp.abs(d_hi[c]) > eps, d_hi[c], 1.0))[:, None]
        num_lo = lo[c][None, :] - o_hi[c][:, None]
        num_hi = hi[c][None, :] - o_lo[c][:, None]
        t1 = num_lo * inv_a
        t2 = num_lo * inv_b
        t3 = num_hi * inv_a
        t4 = num_hi * inv_b
        ax_lo = jnp.minimum(jnp.minimum(t1, t2), jnp.minimum(t3, t4))
        ax_hi = jnp.maximum(jnp.maximum(t1, t2), jnp.maximum(t3, t4))
        t_lo = jnp.maximum(t_lo, jnp.where(mixed, -_BIG, ax_lo))
        t_hi = jnp.minimum(t_hi, jnp.where(mixed, _BIG, ax_hi))
    t_lo = t_lo - jnp.abs(t_lo) * 1e-5 - 1e-4
    t_hi = t_hi + jnp.abs(t_hi) * 1e-5 + 1e-4
    hit = (
        (t_lo <= t_hi)
        & (t_hi >= tmin_lo[:, None])
        & (t_lo <= tmax_hi[:, None])
    )
    box_ok = jnp.all(lo <= hi, axis=0)
    dead_b = o_lo[0] > o_hi[0]
    bundle_any = (hit & box_ok[None, :]).any(axis=1) & ~dead_b
    return jnp.repeat(bundle_any, sub) & live


def _slab_any(origins, dirs, t_min, t_max, lo, hi):
    """Per-ray slab test vs M boxes -> hit (N, M). Conservative:
    near-parallel axes constrain nothing; inverted boxes never hit."""
    n = origins.shape[1]
    m = lo.shape[1]
    t_lo = jnp.full((n, m), -jnp.inf)
    t_hi = jnp.full((n, m), jnp.inf)
    for c in range(3):
        o = origins[c][:, None]
        d = dirs[c]
        par = (jnp.abs(d) <= 1e-12)[:, None]
        idir = (1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1.0))[:, None]
        ta = (lo[c][None, :] - o) * idir
        tb = (hi[c][None, :] - o) * idir
        t_lo = jnp.maximum(t_lo, jnp.where(par, -_BIG, jnp.minimum(ta, tb)))
        t_hi = jnp.minimum(t_hi, jnp.where(par, _BIG, jnp.maximum(ta, tb)))
    t_lo = t_lo - jnp.abs(t_lo) * 1e-5 - 1e-4
    t_hi = t_hi + jnp.abs(t_hi) * 1e-5 + 1e-4
    hit = (t_lo <= t_hi) & (t_hi >= t_min[:, None]) & (t_lo <= t_max[:, None])
    box_ok = jnp.all(lo <= hi, axis=0)
    return hit & box_ok[None, :]


def _alpha_sweep(
    origins, dirs, t_min, t_max, scene: TraceScene, k_alpha: int,
    cull_backface: bool, chunk: int = 256,
):
    """The raw O(rays x alpha-list) K-hit sweep (see trace_alpha).

    Returns (t_biased (N, K), tri (N, K), uv (N, K, 2), bias (N, K)):
    the depth bias of each extracted hit rides as a masked-reduce
    payload, so callers recover the true t as key + bias with NO
    per-hit gather (the (N, K) bias gather was a top-10 frame cost).
    """
    n = origins.shape[1]
    a_cap = scene.alpha_idx.shape[0]
    k = k_alpha
    t_a = jnp.full((n, k), _BIG, jnp.float32)
    tri_a = jnp.full((n, k), -1, jnp.int32)
    u_a = jnp.zeros((n, k), jnp.float32)
    v_a = jnp.zeros((n, k), jnp.float32)
    b_a = jnp.zeros((n, k), jnp.float32)
    if a_cap == 0:
        return t_a, tri_a, jnp.zeros((n, k, 2), jnp.float32), b_a
    chunk = min(chunk, a_cap)
    rays = _Rays.of(origins, dirs, t_min, t_max)

    def step(carry, ids):
        t_a, tri_a, u_a, v_a, b_a = carry
        live = ids >= 0
        ids_s = jnp.maximum(ids, 0)
        g3 = lambda a: a[:, ids_s]
        g = lambda a: a[ids_s]
        t, u, v, hit = _intersect_soa(
            rays, g3(scene.v0), g3(scene.v1), g3(scene.v2),
            g(scene.no_cull), cull_backface,
        )
        hit = hit & live[None, :]
        bias_row = jnp.broadcast_to(g(scene.bias)[None, :], t.shape)
        key = jnp.where(hit, t - bias_row, _BIG)
        ext = _extract_k_smallest(key, ids[None, :], k,
                                  payloads=(u, v, bias_row))
        ext_t, ext_tri, ext_u, ext_v, ext_b = ext
        if first_chunk[0]:
            return (ext_t, ext_tri, ext_u, ext_v, ext_b)
        return _extract_k_smallest(
            jnp.concatenate([t_a, ext_t], axis=1),
            jnp.concatenate([tri_a, ext_tri], axis=1),
            k,
            payloads=(
                jnp.concatenate([u_a, ext_u], axis=1),
                jnp.concatenate([v_a, ext_v], axis=1),
                jnp.concatenate([b_a, ext_b], axis=1),
            ),
        )

    alpha_idx = scene.alpha_idx
    pad = (-a_cap) % chunk
    if pad:
        alpha_idx = jnp.concatenate(
            [alpha_idx, jnp.full((pad,), -1, jnp.int32)]
        )
    ids_chunks = alpha_idx.reshape(-1, chunk)
    # Unrolled chunk loop (chunk count is static and small): a lax.scan
    # here fences the schedule like every other control-flow construct.
    first_chunk = [True]
    carry = (t_a, tri_a, u_a, v_a, b_a)
    for ci in range(ids_chunks.shape[0]):
        carry = step(carry, ids_chunks[ci])
        first_chunk[0] = False
    t_a, tri_a, u_a, v_a, b_a = carry
    uv_a = jnp.stack([u_a, v_a], axis=-1)  # (N, K, 2)
    return t_a, tri_a, uv_a, b_a


def trace(
    origins,
    dirs,
    t_min,
    t_max,
    scene: TraceScene,
    k_alpha: int,
    cull_backface: bool = True,
    chunk: int = 512,
    opaque_fn=None,
    alpha_compact: int = 0,
) -> Hits:
    """Trace rays against the full scene.

    origins/dirs: planar (3, N); dirs may be non-normalized (t is
    measured in units of |dir| like DXR). opaque_fn optionally overrides
    the opaque traversal (the Pallas kernel hook); it must match
    trace_opaque's signature/returns.
    """
    opaque = opaque_fn or trace_opaque
    res = opaque(
        origins, dirs, t_min, t_max, scene, cull_backface=cull_backface,
        chunk=chunk,
    )
    if len(res) == 4:
        # Backend carried the winner's bias out of the traversal (the
        # Pallas kernel) — no (N,) bias gather needed.
        t_opb, tri_op, uv_op, bias_op = res
    else:
        t_opb, tri_op, uv_op = res
        bias_op = scene.bias[jnp.maximum(tri_op, 0)]
    a_dropped = jnp.int32(0)
    if k_alpha > 0 and scene.has_alpha is not False:
        n = origins.shape[1]
        k = k_alpha

        def run_alpha(_):
            return trace_alpha(
                origins, dirs, t_min, t_max, scene, k_alpha, cull_backface,
                compact_capacity=alpha_compact,
            )

        if scene.has_alpha:
            # Host knows alpha exists: compile the sweep in directly
            # (no conditional — see TraceScene.has_alpha).
            t_ab, tri_a, uv_a, b_a, a_dropped = run_alpha(None)
        else:
            # Unknown (has_alpha None): skip the sweep at runtime when
            # the compacted list is empty (lax.cond runs one branch).
            def skip_alpha(_):
                return (
                    jnp.full((n, k), _BIG, jnp.float32),
                    jnp.full((n, k), -1, jnp.int32),
                    jnp.zeros((n, k, 2), jnp.float32),
                    jnp.zeros((n, k), jnp.float32),
                    jnp.int32(0),
                )

            any_alpha = jnp.any(scene.alpha_idx >= 0)
            t_ab, tri_a, uv_a, b_a, a_dropped = jax.lax.cond(
                any_alpha, run_alpha, skip_alpha, None
            )
        # Alpha hits at/behind the opaque hit can never contribute.
        behind = t_ab >= t_opb[:, None]
        tri_a = jnp.where(behind, -1, tri_a)
        t_ab = jnp.where(behind, _BIG, t_ab)
    else:
        # k_alpha == 0, or the host statically knows there are no alpha
        # triangles: empty slots in the caller-expected K width.
        n = origins.shape[1]
        k = max(k_alpha, 1)
        t_ab = jnp.full((n, k), _BIG, jnp.float32)
        tri_a = jnp.full((n, k), -1, jnp.int32)
        uv_a = jnp.zeros((n, k, 2), jnp.float32)
        b_a = jnp.zeros((n, k), jnp.float32)

    # Unbias: stored keys are t - bias; recover true t for positions
    # (WithoutDistanceBias, Instances.hlsli). The alpha side's bias rode
    # the K-extraction as a payload (no gather); the opaque side's is
    # one (N,) gather.
    t_op_true = jnp.where(tri_op >= 0, t_opb + bias_op, _BIG)
    t_a_true = jnp.where(tri_a >= 0, t_ab + b_a, _BIG)
    return Hits(
        t_op=t_op_true,
        tri_op=tri_op,
        uv_op=uv_op,
        t_a=t_a_true,
        tri_a=tri_a,
        uv_a=uv_a,
        alpha_dropped=a_dropped,
    )


def trace_shadow(
    origins, dirs, t_min, t_max, scene: TraceScene, k_alpha: int,
    chunk: int = 512, opaque_fn=None, alpha_compact: int = 0,
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
        k_alpha=k_alpha, cull_backface=False, chunk=chunk, opaque_fn=opaque_fn,
        alpha_compact=alpha_compact,
    )
