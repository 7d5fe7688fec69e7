"""Pallas packet tracer: cluster-culled closest-hit traversal.

The TPU-native replacement for the driver's BVH traversal (DXR TraceRay
behind contrib/nv_helpers_dx12 BLAS/TLAS builds). Instead of a per-ray
pointer-chasing BVH walk (hostile to 8x128 vector lanes), traversal is
*packet-granular*:

  1. Triangles are Morton-ordered at mesh upload (ops/geometry.py), so
     consecutive CLUSTER_SIZE triangles are spatially coherent; their
     AABBs refit each frame from the triangle rows in one reduction.
  2. An XLA pre-pass slab-tests every ray against every cluster AABB
     (cheap vector math) and reduces to a per-ray-BLOCK visit list:
     which clusters any ray in the block might hit, compacted.
  3. The Pallas kernel walks each block's visit list: cluster triangle
     data (SoA, edge-precomputed) is DMA'd HBM->VMEM double-buffered
     while the previous cluster's 512x128 Moller-Trumbore block runs on
     the VPU. Work is data-dependent per block — empty sky blocks visit
     nothing — while every executed instruction stays full-width.

Outputs match tracer.trace_opaque (biased-t + triangle id; barycentrics
recovered by the shared single-triangle re-intersection), so this
kernel drops in through the opaque_fn hook and is validated against the
XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e37


def _vma_of(*arrays):
    """Union of the inputs' varying-mesh-axes sets (shard_map
    check_vma): pallas_call out_shapes must declare how outputs vary,
    and they vary exactly like the ray inputs. Empty outside
    shard_map."""
    vma = frozenset()
    for a in arrays:
        vma |= getattr(jax.typeof(a), "vma", None) or frozenset()
    return vma


def _pad128(a):
    """Pad the trailing dim to a 128 multiple (DMA slice alignment)."""
    pad = (-a.shape[-1]) % 128
    if not pad:
        return a
    return jnp.concatenate(
        [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1
    )


CLUSTER_SIZE = 128  # triangles per cluster (one lane tile; HBM-DMA path)
# VMEM kernels cull and visit at HALF-tile granularity: 64-triangle
# clusters, two visits packed per 128-lane intersection tile (their
# Woop operands lane-concatenated before the matmul). The per-visit
# elementwise tail is the kernel's dominant cost and 64-triangle boxes
# cut the castle populations' (ray, tri) tile pairs ~45% for the same
# visit-walk length (benchmarks/visitsweep.py: opaque 3059 -> 1704
# tiles, shadows 4477 -> 2266).
K_CS = 64
BLOCK_RAYS = 512  # rays per kernel program (4 sublane rows of 128)
GROUP_CLUSTERS = 8  # clusters per mid-level AABB group (two-level culling)
SUPER_BLOCKS = 4  # ray blocks walked per kernel program (VMEM kernels)
VISIT_UNROLL = 4  # 64-tri visits per while-loop iteration (VMEM kernels)
SHADOW_UNROLL = 8  # shadow-kernel visits per iteration: occlusion blocks
# run longer lists (p90 ~3x the primary population's) and their
# division-free tail is ~half the ops, so coarser early-exit checks win
# (kernelab.py: 5.89 -> 5.58 ms on the captured castle shadow batch;
# the primary kernel measured WORSE at 8 from pad-visit waste).
# Clusters live wholly in VMEM when the table fits comfortably (scene
# up to ~87k triangles); beyond that the kernel falls back to the
# double-buffered HBM DMA walk. VMEM is ~16 MB/core; 4 MB leaves room
# for rays/outputs/scratch.
VMEM_CLUSTER_BYTES = 4 * 1024 * 1024

# Cluster data rows (SoA within a cluster): shape (n_clusters, C_ROWS, CS).
C_V0X, C_V0Y, C_V0Z = 0, 1, 2
C_E1X, C_E1Y, C_E1Z = 3, 4, 5
C_E2X, C_E2Y, C_E2Z = 6, 7, 8
C_BIAS = 9
C_ACTIVE = 10  # 1.0 when valid opaque-class
C_NO_CULL = 11
C_ROWS = 12


def build_cluster_data(scene):
    """Cluster-major triangle data + AABBs from a TraceScene (planar).

    Returns (cluster_tris (nc, C_ROWS, CS), aabb_lo (3, nc), aabb_hi (3, nc)).
    """
    t_total = scene.num_triangles
    assert t_total % CLUSTER_SIZE == 0, t_total
    nc = t_total // CLUSTER_SIZE

    v0, v1, v2 = scene.v0, scene.v1, scene.v2  # (3, T)
    e1 = v1 - v0
    e2 = v2 - v0
    active = (scene.valid & ~scene.alpha).astype(jnp.float32)
    rows = jnp.concatenate(
        [v0, e1, e2, scene.bias[None], active[None],
         scene.no_cull.astype(jnp.float32)[None]],
        axis=0,
    )  # (C_ROWS, T)
    cluster_tris = (
        rows.reshape(C_ROWS, nc, CLUSTER_SIZE).transpose(1, 0, 2)
    )

    lo, hi = build_cluster_boxes(scene, CLUSTER_SIZE)
    return cluster_tris, lo, hi


def build_cluster_boxes(scene, cs: int):
    """Per-cluster AABBs of the opaque-class triangles at `cs`-triangle
    granularity: (lo (3, T//cs), hi (3, T//cs))."""
    t_total = scene.num_triangles
    assert t_total % cs == 0, (t_total, cs)
    nc = t_total // cs
    v0, v1, v2 = scene.v0, scene.v1, scene.v2
    active = scene.valid & ~scene.alpha
    big = jnp.float32(_BIG)
    act = active[None]
    lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    lo = jnp.where(act, lo, big).reshape(3, nc, cs).min(axis=2)
    hi = jnp.where(act, hi, -big).reshape(3, nc, cs).max(axis=2)
    return lo, hi


# Woop unit-triangle transform rows (cluster_mats, shape
# (nc, WS_ROWS, 3*CS)) in SPLIT-OPERAND form: the MXU rounds f32
# matmul operands to bf16 (Mosaic DEFAULT dot precision), which at
# world magnitudes cost ~1% of castle hits and a 2e-2 t-error tail
# (benchmarks/precision_check.py, round 4). Each f32 factor is split
# hi + lo (hi = bf16 rounding, lo = the f32 residual — 8 more mantissa
# bits once the MXU rounds it again), and ALL FOUR product terms ride
# ONE matmul by widening the contraction dim from 8 to 16 — free on
# the 128-deep systolic array:
#
#   s + r = [x_hi | x_lo | x | 1 | 1 | 0...] @
#           [W_hi; W_hi; W_lo; tr_hi; tr_lo; thr; bias]
#         = W_hi x_hi + W_hi x_lo + W_lo x + tr
#
# The third block passes the FULL x against W_lo: in exact arithmetic
# the sum telescopes to W x + tr EXACTLY (interpret mode / the CPU
# parity suite see f32-identical results); on the MXU x rounds to
# x_hi there, leaving the O(2^-18) W_lo x_lo term as the only
# structural loss — ~2^-17-relative overall (only the lo parts round)
# vs 2^-9 single-operand bf16, and three fewer operand rows than the
# explicit 4-term form. The t-error tail this kills was the round-4
# audit's Missing #2 (the DXR traversal the kernel replaces is
# f32-exact); measured on the castle primary population:
# 97.57% -> 99.996% triangle agreement, 1086 -> 0 hit/miss flips,
# t rel err p99 4.8e-3 -> 9.1e-6 (benchmarks/precision_check.py).
#
# For output group g (x/y/z) and triangle j, column g*CS+j holds the
# corresponding W_g / -W_g.v0 parts so that the origin rows produce
# s = W(o - v0) and the direction rows r = W d. The two aux rows ride
# in the same tile but multiply the rays' zero columns (matmul-inert);
# the kernel reads them as per-triangle f32 rows:
#   WS_THR: signed keep threshold. MT's det = -r_z * nn (nn = n.n,
#     n = e1 x e2), so |det| > 1e-9 becomes |r_z| > thr with
#     thr = 1e-9 / nn — one precomputed row replaces the nn row AND
#     the per-visit det multiply. no_cull rides its SIGN (thr < 0
#     means no_cull); inactive/degenerate lanes store +BIG (keep can
#     never pass, so the all-zero-transform convention still holds).
#   WS_BIAS: the winner's depth bias, carried out with the hit.
WS_THR = 11
WS_BIAS = 12
WS_ROWS = 13  # VMEM sublane-pads to 16 either way; 13 keeps the
# per-visit pair concat (the tile's only per-visit data movement)
# 19% leaner than the explicit 4-term 16-row form.


def _bf16_split(a):
    """(hi, lo): hi = a rounded to bf16 (kept f32), lo = the residual.
    hi survives the MXU's operand rounding exactly; lo's own bf16
    rounding keeps 8 further mantissa bits of a."""
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def build_cluster_mats(scene, cs: int = CLUSTER_SIZE):
    """Cluster-major split-operand Woop transforms for the MXU tile.

    The VPU Moller-Trumbore tile costs ~45 elementwise ops per
    (ray, tri) pair; with the unit-triangle (Woop) transform the
    per-visit work becomes ONE (2B,16)x(16,3CS) matmul on the MXU plus
    a ~16-op VPU tail (t = -s_z/r_z, u = s_x + t r_x, v = s_y + t r_y),
    measured 1.8x faster per visit (benchmarks/woopbench.py). W is the
    inverse of [e1 e2 n]: rows (e2 x n, n x e1, n) / (n.n). See the
    WS_* layout comment for the hi/lo split that restores near-f32
    accuracy (the DXR traversal the kernel replaces is f32-exact)."""
    t_total = scene.num_triangles
    assert t_total % cs == 0, (t_total, cs)
    nc = t_total // cs

    v0 = scene.v0
    e1 = scene.v1 - scene.v0
    e2 = scene.v2 - scene.v0

    def cross(a, b):
        return jnp.stack([
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ], axis=0)

    n = cross(e1, e2)
    nn = (n * n).sum(axis=0)
    safe = nn > 1e-30
    inv = jnp.where(safe, 1.0 / jnp.where(safe, nn, 1.0), 0.0)
    w0 = cross(e2, n) * inv[None]
    w1 = cross(n, e1) * inv[None]
    w2 = n * inv[None]
    tr = jnp.stack([
        -(w0 * v0).sum(axis=0),
        -(w1 * v0).sum(axis=0),
        -(w2 * v0).sum(axis=0),
    ], axis=0)  # (3, T)
    active = scene.valid & ~scene.alpha & safe
    # Inactive lanes (invalid / alpha-class / degenerate) get an
    # all-zero transform: r_z = 0 -> det = 0 -> the keep test excludes
    # them, so the intersection tails drop their explicit ACTIVE
    # compare+and (two full-width VPU ops per visit). jnp.where (not
    # multiplication) so NaN/Inf vertex data in an invalid lane still
    # zeroes exactly instead of relying on NaN-comparison semantics.
    act3 = active[None]
    w0 = jnp.where(act3, w0, 0.0)
    w1 = jnp.where(act3, w1, 0.0)
    w2 = jnp.where(act3, w2, 0.0)
    tr = jnp.where(act3, tr, 0.0)
    active = active.astype(jnp.float32)

    w = jnp.stack([w0, w1, w2], axis=1)  # (3 in-dims, 3 groups, T)
    w_hi, w_lo = _bf16_split(w)
    tr_hi, tr_lo = _bf16_split(tr)
    # Signed keep threshold (see WS_THR): 1e-9 / nn, negative when the
    # triangle is double-sided, +BIG when inactive/degenerate.
    thr = jnp.where(
        active > 0.0, 1e-9 * inv, jnp.float32(_BIG)
    )
    thr = jnp.where(scene.no_cull & (active > 0.0), -thr, thr)
    aux = jnp.stack([thr, scene.bias], axis=0)  # (2, T)
    aux3 = jnp.broadcast_to(aux[:, None, :], (2, 3, aux.shape[1]))
    m = jnp.concatenate([
        w_hi, w_hi, w_lo, tr_hi[None], tr_lo[None], aux3,
    ], axis=0)  # (WS_ROWS, 3, T)
    m = m.reshape(WS_ROWS, 3, nc, cs).transpose(2, 0, 1, 3)
    return m.reshape(nc, WS_ROWS, 3 * cs)


def _block_od(rays_ref, sl):
    """(2B, WS_ROWS) split-operand homogeneous ray rows for the Woop
    matmul (see the WS_* layout): first B rows
    [o_hi | o_lo | o | 1 | 1 | 0 | 0], next B rows
    [d_hi | d_lo | d | 0 | 0 | 0 | 0]. Built once per ray block,
    amortized over its cluster visits."""
    b = BLOCK_RAYS
    o_t = rays_ref[0:3, sl].T  # (B, 3)
    d_t = rays_ref[3:6, sl].T
    o_hi, o_lo = _bf16_split(o_t)
    d_hi, d_lo = _bf16_split(d_t)
    ones = jnp.ones((b, 1), jnp.float32)
    zeros2 = jnp.zeros((b, 2), jnp.float32)
    return jnp.concatenate([
        jnp.concatenate([o_hi, o_lo, o_t, ones, ones, zeros2], 1),
        jnp.concatenate(
            [d_hi, d_lo, d_t, jnp.zeros((b, 4), jnp.float32)], 1,
        ),
    ], axis=0)


def _woop_pair(m0, m1, od, tmin, tmax, cull_backface):
    """TWO 64-triangle clusters intersected as ONE (B, 128) lane tile.

    The pair's Woop operands are lane-concatenated group-by-group
    BEFORE the matmul — six (WS_ROWS, 64) shuffles on the tiny operand
    instead of shuffling the (2B, 384) product — so the matmul and the
    whole elementwise tail (the kernel's dominant cost) run at full
    128-lane occupancy over twice-finer culling granularity. Returns
    (hit, t, u, v (B, 128), bias (128,)); column c < 64 is triangle c
    of m0's cluster, else triangle c-64 of m1's."""
    ks = K_CS
    cs = 2 * ks
    b = od.shape[0] // 2
    mm = jnp.concatenate([
        m0[:, 0:ks], m1[:, 0:ks],
        m0[:, ks:2 * ks], m1[:, ks:2 * ks],
        m0[:, 2 * ks:3 * ks], m1[:, 2 * ks:3 * ks],
    ], axis=1)  # (WS_ROWS, 3 * 128)
    sr = jnp.dot(od, mm, preferred_element_type=jnp.float32)  # (2B, 3CS)
    sx, sy, sz = sr[:b, 0:cs], sr[:b, cs:2 * cs], sr[:b, 2 * cs:3 * cs]
    rx, ry, rz = sr[b:, 0:cs], sr[b:, cs:2 * cs], sr[b:, 2 * cs:3 * cs]
    # keep: MT's |det| > 1e-9 with det = -r_z * nn, via the signed
    # precomputed threshold row (see WS_THR) — no det multiply.
    thr_s = mm[WS_THR, 0:cs][None, :]
    thr = jnp.abs(thr_s)
    if cull_backface:
        # Front faces (det>eps <=> r_z < -thr) always accepted;
        # backfaces only when no_cull (thr_s < 0).
        keep = (rz < -thr) | ((thr_s < 0.0) & (rz > thr))
    else:
        keep = jnp.abs(rz) > thr
    t = -sz / jnp.where(keep, rz, 1.0)
    u = sx + t * rx
    v = sy + t * ry
    # No ACTIVE term: inactive lanes have an all-zero transform and a
    # +BIG threshold (build_cluster_mats), so keep excludes them.
    hit = (
        keep & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= tmin) & (t <= tmax)
    )
    return hit, t, u, v, mm[WS_BIAS, 0:cs]


def _woop_pair_occl(m0, m1, od, tmin, tmax):
    """Occlusion-only pair tile: the division-free form of _woop_pair.

    Shadows need only the binary verdict, so multiply the hit
    conditions through by q = r_z^2 > 0 instead of dividing for t
    (t = -s_z/r_z = p/q with p = -s_z r_z):

        u >= 0      <=>  s_x q + p r_x >= 0
        v >= 0      <=>  s_y q + p r_y >= 0
        u + v <= 1  <=>  (s_x + s_y) q + p (r_x + r_y) <= q
        t in [tmin, tmax]  <=>  tmin q <= p <= tmax q

    The VPU divide (a multi-op Newton expansion) drops out of the
    kernel's dominant per-visit tail. `keep` stays the exact MT
    threshold |det| > 1e-9 with det = -r_z * nn, so the accepted
    hit set matches _woop_pair up to multiply-vs-divide rounding on
    exactly-borderline lanes."""
    ks = K_CS
    cs = 2 * ks
    b = od.shape[0] // 2
    mm = jnp.concatenate([
        m0[:, 0:ks], m1[:, 0:ks],
        m0[:, ks:2 * ks], m1[:, ks:2 * ks],
        m0[:, 2 * ks:3 * ks], m1[:, 2 * ks:3 * ks],
    ], axis=1)  # (WS_ROWS, 3 * 128)
    sr = jnp.dot(od, mm, preferred_element_type=jnp.float32)  # (2B, 3CS)
    sx, sy, sz = sr[:b, 0:cs], sr[:b, cs:2 * cs], sr[:b, 2 * cs:3 * cs]
    rx, ry, rz = sr[b:, 0:cs], sr[b:, cs:2 * cs], sr[b:, 2 * cs:3 * cs]
    # |det| > 1e-9 via the signed threshold row; shadows never cull.
    keep = jnp.abs(rz) > jnp.abs(mm[WS_THR, 0:cs][None, :])
    q = rz * rz
    p = -(sz * rz)
    uq = sx * q + p * rx
    vq = sy * q + p * ry
    # q > 0 guards flush-to-zero underflow: squaring doubles the
    # dynamic range, so a near-grazing r_z can underflow q (and p) to
    # exactly 0 while keep (|r_z * nn|) still passes for large-nn
    # triangles — then every inequality degenerates to 0 >= 0 and a
    # miss reads as a hit. One extra VPU AND.
    hit = (
        keep & (q > 0.0) & (uq >= 0.0) & (vq >= 0.0) & (uq + vq <= q)
        & (p >= tmin * q) & (p <= tmax * q)
    )
    return hit


def _slab_per_ray(origins, dirs, t_min, t_max, lo, hi):
    """Per-ray slab test against M boxes: (hit (N, M), entry (N, M)).

    Axes where the ray is (near-)parallel constrain nothing — forcing
    them to the full interval keeps the cull conservative (a signless
    1/eps fallback would wrongly reject real hits). Inverted boxes
    (lo > hi on any axis: padding/empty) never hit.
    """
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
    # Widen by a relative+absolute epsilon: triangles exactly on an AABB
    # face must never be culled by slab rounding.
    t_lo = t_lo - jnp.abs(t_lo) * 1e-5 - 1e-4
    t_hi = t_hi + jnp.abs(t_hi) * 1e-5 + 1e-4
    hit = (t_lo <= t_hi) & (t_hi >= t_min[:, None]) & (t_lo <= t_max[:, None])
    box_ok = jnp.all(lo <= hi, axis=0)
    # Dead rays (empty [t_min, t_max]) must not vote: a slab interval
    # that straddles the empty range passes the two comparisons above,
    # and dead-masked shadow rays were inflating the visit lists ~2.8x
    # (measured: 6700 visits vs 2571 live-exact on the castle frame).
    live = (t_max >= t_min)[:, None]
    hit = hit & box_ok[None, :] & live
    entry = jnp.where(hit, jnp.maximum(t_lo, t_min[:, None]), _BIG)
    return hit, entry


def _slab_interval(o_lo, o_hi, d_lo, d_hi, tmin_lo, tmax_hi, lo, hi):
    """Interval-arithmetic slab test: B ray *bundles* (each bounding all
    of a block's live rays: origin box [o_lo, o_hi] (3, B), direction
    box [d_lo, d_hi] (3, B), t in [tmin_lo, tmax_hi] (B,)) against M
    boxes (3, M). Conservative: a bundle "hits" whenever ANY ray inside
    its bounds could. Returns (hit (B, M), entry (B, M)).

    This is the packet-frustum level of the two-level cull: it runs at
    block granularity (512x fewer rows than per-ray), so testing every
    cluster costs O(blocks x clusters).
    """
    b = o_lo.shape[1]
    m = lo.shape[1]
    t_lo = jnp.full((b, m), -jnp.inf)
    t_hi = jnp.full((b, m), jnp.inf)
    eps = 1e-12
    for c in range(3):
        # Direction interval spanning zero constrains nothing.
        mixed = ((d_lo[c] <= eps) & (d_hi[c] >= -eps))[:, None]
        safe_lo = jnp.where(jnp.abs(d_lo[c]) > eps, d_lo[c], 1.0)
        safe_hi = jnp.where(jnp.abs(d_hi[c]) > eps, d_hi[c], 1.0)
        inv_a = (1.0 / safe_lo)[:, None]
        inv_b = (1.0 / safe_hi)[:, None]
        # Numerator interval: box minus origin interval.
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
    dead = o_lo[0] > o_hi[0]  # no live rays in the block
    hit = hit & box_ok[None, :] & ~dead[:, None]
    entry = jnp.where(hit, jnp.maximum(t_lo, tmin_lo[:, None]), _BIG)
    return hit, entry


def block_visit_lists(origins, dirs, t_min, t_max, aabb_lo, aabb_hi,
                      block_rays: int, bias_max=0.0,
                      group_clusters: int = GROUP_CLUSTERS):
    """Per-ray-block compacted cluster visit lists — the TWO-LEVEL
    XLA pre-pass (the BLAS/TLAS traversal-cull analog of the driver BVH,
    contrib/nv_helpers_dx12/{Bottom,Top}LevelASGenerator.cpp).

    Level 1: every ray slab-tests the GROUP AABBs (GROUP_CLUSTERS
    Morton-adjacent clusters per group) — O(rays x groups), 8x cheaper
    than per-cluster and the only O(rays x boxes) term.
    Level 2: each 512-ray block's interval bounds (origin box,
    direction box, t range over its live rays) slab-test every cluster
    — O(blocks x clusters), 512x cheaper per row than level 1.
    A cluster is visited iff its group passes level 1 for the block AND
    it passes level 2; both levels are conservative so the visit set is
    a superset of the exact per-ray x cluster test.

    Visit lists are sorted FRONT-TO-BACK by the conservative entry
    distance (max of the two levels' lower bounds), which is what lets
    the kernel's while-loop terminate as soon as the next cluster's
    entry lies beyond every ray's current best hit — the packet analog
    of ordered BVH traversal.

    Returns (visits (n_blocks, nc) int32 cluster ids front-to-back,
    padded with nc; counts (n_blocks,); entry (n_blocks, nc) f32
    conservative entry distance per visit slot, minus `bias_max` so it
    lower-bounds the *biased* hit keys the kernel compares against).
    """
    n = origins.shape[1]
    nc = aabb_lo.shape[1]
    assert n % block_rays == 0
    n_blocks = n // block_rays

    # Pad clusters to a group multiple with inverted (never-hit) boxes.
    g = group_clusters
    pad = (-nc) % g
    if pad:
        lo_p = jnp.concatenate(
            [aabb_lo, jnp.full((3, pad), _BIG, aabb_lo.dtype)], axis=1
        )
        hi_p = jnp.concatenate(
            [aabb_hi, jnp.full((3, pad), -_BIG, aabb_hi.dtype)], axis=1
        )
    else:
        lo_p, hi_p = aabb_lo, aabb_hi
    nc_p = nc + pad
    ng = nc_p // g

    # Group AABBs (min/max ignore inverted pads unless the whole group
    # is padding, in which case the group box stays inverted).
    gr_lo = lo_p.reshape(3, ng, g).min(axis=2)
    gr_hi = hi_p.reshape(3, ng, g).max(axis=2)

    # Level 1: per-ray x group.
    hit_g, entry_g = _slab_per_ray(origins, dirs, t_min, t_max, gr_lo, gr_hi)
    block_hit_g = hit_g.reshape(n_blocks, block_rays, ng).any(axis=1)
    block_entry_g = entry_g.reshape(n_blocks, block_rays, ng).min(axis=1)

    # Level 2: block interval bounds x cluster. Dead rays (empty t
    # interval) are excluded from the bounds so sky-masked rays don't
    # inflate the bundle.
    live = t_max >= t_min
    big = jnp.float32(_BIG)
    o_live = jnp.where(live[None, :], origins, big)
    o_lo = o_live.reshape(3, n_blocks, block_rays).min(axis=2)
    o_hi = jnp.where(live[None, :], origins, -big).reshape(
        3, n_blocks, block_rays
    ).max(axis=2)
    d_lo = jnp.where(live[None, :], dirs, big).reshape(
        3, n_blocks, block_rays
    ).min(axis=2)
    d_hi = jnp.where(live[None, :], dirs, -big).reshape(
        3, n_blocks, block_rays
    ).max(axis=2)
    tmin_lo = jnp.where(live, t_min, big).reshape(n_blocks, block_rays).min(axis=1)
    tmax_hi = jnp.where(live, t_max, -big).reshape(n_blocks, block_rays).max(axis=1)
    hit_c, entry_c = _slab_interval(
        o_lo, o_hi, d_lo, d_hi, tmin_lo, tmax_hi, lo_p, hi_p
    )

    # Combine: expand groups to clusters, take the tighter entry bound.
    expand = lambda a: jnp.repeat(a, g, axis=1)
    block_hit = expand(block_hit_g) & hit_c
    entry_b = jnp.maximum(expand(block_entry_g), entry_c)

    counts = block_hit.sum(axis=1).astype(jnp.int32)
    key = jnp.where(block_hit, entry_b, _BIG)
    # Front-to-back compaction; pad with nc (an always-empty slot).
    if nc_p <= 256:
        # Rank-based stable argsort: XLA's generic sort lowers to a
        # bitonic network that profiled ~1.4 ms/frame at 80 columns;
        # for short per-block rows a comparison-matrix rank plus a
        # one-hot contraction computes the identical stable order in
        # O(nc^2) VPU/MXU work (~0.1 ms at this width).
        idx = jnp.arange(nc_p, dtype=jnp.int32)
        before = (key[:, None, :] < key[:, :, None]) | (
            (key[:, None, :] == key[:, :, None])
            & (idx[None, :, None] < idx[None, None, :])
        )
        rank = before.sum(axis=2).astype(jnp.int32)  # (B, nc_p)
        onehot = (rank[:, :, None] == idx[None, None, :]).astype(
            jnp.float32
        )  # [block, source i, dest r]
        order = jnp.einsum(
            "bir,i->br", onehot, idx.astype(jnp.float32)
        ).astype(jnp.int32)
        entry_sorted = jnp.einsum("bir,bi->br", onehot, key)
    else:
        order = jnp.argsort(key, axis=1).astype(jnp.int32)
        entry_sorted = jnp.take_along_axis(key, order, axis=1)
    visits = jnp.where(
        jnp.arange(nc_p)[None, :] < counts[:, None], order, nc
    ).astype(jnp.int32)
    entry = entry_sorted - bias_max
    # Padded cluster ids never hit, so the tail slice is pure padding.
    return visits[:, :nc], counts, entry[:, :nc]


def _kernel(ivals_hbm, entry_hbm, rays_ref, cluster_hbm, t_ref,
            tri_ref, u_ref, v_ref, bias_ref, ivals_ref, entry_ref, vsems,
            scratch, sems, *, cull_backface: bool, nc: int):
    """Ordered packet traversal: clusters arrive front-to-back and the
    walk stops once the next cluster's conservative entry distance lies
    beyond every ray's current best hit (packet early-out, the analog of
    ordered BVH traversal with t-max shrinking).

    The visit tables live in HBM (scalar-prefetching the full
    (blocks, nc) tables overflows SMEM at real scene scales); each
    program DMAs ITS block's row into SMEM scratch first. ivals packs
    [count, visit ids...] so count+visits ride one DMA."""
    b = pl.program_id(0)
    row_i = pltpu.make_async_copy(ivals_hbm.at[b], ivals_ref, vsems.at[0])
    row_e = pltpu.make_async_copy(entry_hbm.at[b], entry_ref, vsems.at[1])
    row_i.start()
    row_e.start()
    row_i.wait()
    row_e.wait()
    count = ivals_ref[0, 0]

    ox = rays_ref[0].reshape(BLOCK_RAYS, 1)
    oy = rays_ref[1].reshape(BLOCK_RAYS, 1)
    oz = rays_ref[2].reshape(BLOCK_RAYS, 1)
    dx = rays_ref[3].reshape(BLOCK_RAYS, 1)
    dy = rays_ref[4].reshape(BLOCK_RAYS, 1)
    dz = rays_ref[5].reshape(BLOCK_RAYS, 1)
    tmin = rays_ref[6].reshape(BLOCK_RAYS, 1)
    tmax = rays_ref[7].reshape(BLOCK_RAYS, 1)

    def cluster_dma(slot, i):
        cid = ivals_ref[0, 1 + i]
        return pltpu.make_async_copy(
            cluster_hbm.at[cid], scratch.at[slot], sems.at[slot]
        )

    @pl.when(count > 0)
    def _():
        cluster_dma(0, 0).start()

    def cond(carry):
        i, worst = carry[0], carry[1]
        return (i < count) & (entry_ref[0, jnp.minimum(i, nc - 1)] <= worst)

    def body(carry):
        i, worst, t_best, tri_best, u_best, v_best, b_best = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < count)
        def _():
            cluster_dma(1 - slot, i + 1).start()

        cluster_dma(slot, i).wait()
        tri = scratch[slot]  # (C_ROWS, CS)
        cid = ivals_ref[0, 1 + i]

        v0x = tri[C_V0X][None, :]
        v0y = tri[C_V0Y][None, :]
        v0z = tri[C_V0Z][None, :]
        e1x = tri[C_E1X][None, :]
        e1y = tri[C_E1Y][None, :]
        e1z = tri[C_E1Z][None, :]
        e2x = tri[C_E2X][None, :]
        e2y = tri[C_E2Y][None, :]
        e2z = tri[C_E2Z][None, :]

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        if cull_backface:
            # det>eps always accepted; backfaces only when no_cull
            # (avoids a bool-select, which Mosaic can't lower).
            keep = (det > 1e-9) | (
                (tri[C_NO_CULL][None, :] > 0.0) & (det < -1e-9)
            )
        else:
            keep = jnp.abs(det) > 1e-9
        inv_det = 1.0 / jnp.where(keep, det, 1.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (
            keep & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin) & (t <= tmax) & (tri[C_ACTIVE][None, :] > 0.0)
        )
        key = jnp.where(hit, t - tri[C_BIAS][None, :], _BIG)
        best = key.min(axis=1, keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, CLUSTER_SIZE), 1)
        idx = jnp.where(
            key <= best, cid * CLUSTER_SIZE + col, -1
        ).max(axis=1, keepdims=True)
        # Hit attributes of the CHOSEN triangle (masked sum == select:
        # exactly one column matches idx). Carrying u/v/bias here means
        # the caller needs no re-intersection and no bias gather — three
        # (N,) full-res gathers that were top-10 frame costs.
        sel = col == (idx - cid * CLUSTER_SIZE)
        pick = lambda a: jnp.sum(jnp.where(sel, a, 0.0), axis=1,
                                 keepdims=True)
        u_c = pick(u)
        v_c = pick(v)
        b_c = pick(jnp.broadcast_to(tri[C_BIAS][None, :],
                                    (BLOCK_RAYS, CLUSTER_SIZE)))
        better = best < t_best
        t_best = jnp.where(better, best, t_best)
        tri_best = jnp.where(better, idx, tri_best)
        u_best = jnp.where(better, u_c, u_best)
        v_best = jnp.where(better, v_c, v_best)
        b_best = jnp.where(better, b_c, b_best)
        worst = jnp.max(t_best)
        return (i + 1, worst, t_best, tri_best, u_best, v_best, b_best)

    # t_best starts at the ray's own t_max (+1 so t == t_max still wins):
    # rays that can't hit anything past t_max stop gating the packet's
    # early-out, so sky-heavy blocks terminate too (t_max is clamped to
    # the scene-AABB exit by the caller).
    t_init = tmax + 1.0
    zero = jnp.zeros((BLOCK_RAYS, 1), jnp.float32)
    init = (
        jnp.int32(0),
        jnp.max(t_init),
        t_init,
        jnp.full((BLOCK_RAYS, 1), -1, jnp.int32),
        zero,
        zero,
        zero,
    )
    i_final, _, t_best, tri_best, u_best, v_best, b_best = (
        jax.lax.while_loop(cond, body, init)
    )

    # Early exit leaves the i_final prefetch in flight; drain it so the
    # kernel never ends with a dangling DMA.
    @pl.when(i_final < count)
    def _():
        cluster_dma(jax.lax.rem(i_final, 2), i_final).wait()

    shape3 = (1, BLOCK_RAYS // 128, 128)
    t_ref[:] = t_best.reshape(shape3)
    tri_ref[:] = tri_best.reshape(shape3)
    u_ref[:] = u_best.reshape(shape3)
    v_ref[:] = v_best.reshape(shape3)
    bias_ref[:] = b_best.reshape(shape3)


def _mt_cluster(tri, ox, oy, oz, dx, dy, dz, tmin, tmax, cull_backface):
    """512x128 Moller-Trumbore of one cluster tile against a ray block.
    Returns (hit mask, t, u, v) — shared by both kernel families."""
    v0x = tri[C_V0X][None, :]
    v0y = tri[C_V0Y][None, :]
    v0z = tri[C_V0Z][None, :]
    e1x = tri[C_E1X][None, :]
    e1y = tri[C_E1Y][None, :]
    e1z = tri[C_E1Z][None, :]
    e2x = tri[C_E2X][None, :]
    e2y = tri[C_E2Y][None, :]
    e2z = tri[C_E2Z][None, :]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    if cull_backface:
        # det>eps always accepted; backfaces only when no_cull
        # (avoids a bool-select, which Mosaic can't lower).
        keep = (det > 1e-9) | (
            (tri[C_NO_CULL][None, :] > 0.0) & (det < -1e-9)
        )
    else:
        keep = jnp.abs(det) > 1e-9
    inv_det = 1.0 / jnp.where(keep, det, 1.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        keep & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= tmin) & (t <= tmax) & (tri[C_ACTIVE][None, :] > 0.0)
    )
    return hit, t, u, v


def _kernel_vmem(ivals_hbm, entry_hbm, rays_ref, cluster_ref, t_ref,
                 tri_ref, u_ref, v_ref, bias_ref, ivals_ref, entry_ref,
                 vsems, *, cull_backface: bool, nc: int, super_blocks: int):
    """VMEM-resident variant of _kernel: the whole cluster table rides
    one HBM->VMEM copy at launch (scenes up to VMEM_CLUSTER_BYTES), so
    the visit walk reads clusters with zero DMA latency. Each program
    walks `super_blocks` ray blocks (amortizing the visit-row SMEM DMA
    + program setup, measured ~6 us/block standalone), and the hit
    carry is kept ELEMENTWISE (BLOCK_RAYS x CLUSTER_SIZE planes folded
    with min/select) — the original per-visit carry did 5 cross-lane
    reductions per cluster, which profiled at ~3.3 us/visit against
    ~0.6 us of Moller-Trumbore VPU work. Two visits per loop iteration
    amortize the packet early-out's unavoidable reduction pair.

    Tie-break parity: per lane, the EARLIER front-to-back visit wins
    equal biased keys (strict <); across lanes the max global triangle
    id among tied lanes wins — the same rule as the XLA extractor
    (tracer._extract_k_smallest)."""
    p = pl.program_id(0)
    row_i = pltpu.make_async_copy(
        ivals_hbm.at[p], ivals_ref, vsems.at[0],
    )
    row_e = pltpu.make_async_copy(
        entry_hbm.at[p], entry_ref, vsems.at[1],
    )
    row_i.start()
    row_e.start()
    row_i.wait()
    row_e.wait()

    col = jax.lax.broadcasted_iota(
        jnp.int32, (BLOCK_RAYS, 2 * K_CS), 1
    )
    for s in range(super_blocks):
        count = ivals_ref[s, 0]
        sl = slice(s * BLOCK_RAYS, (s + 1) * BLOCK_RAYS)
        od = _block_od(rays_ref, sl)
        tmin = rays_ref[6, sl].reshape(BLOCK_RAYS, 1)
        tmax = rays_ref[7, sl].reshape(BLOCK_RAYS, 1)

        def cond(carry):
            i, worst = carry[0], carry[1]
            return (i < count) & (entry_ref[s, jnp.minimum(i, nc - 1)] <= worst)

        def body(carry):
            i, worst, key_best, tid_best, u_best, v_best, b_best = carry
            # Visits beyond `count` read pad-id slots -> the all-zero
            # pad cluster, whose zero Woop transform gives det = 0 on
            # every lane -> no hits; processing pairs only coarsens the
            # early-out check, never its correctness.
            for k in range(0, VISIT_UNROLL, 2):
                cid0 = ivals_ref[s, 1 + i + k]
                cid1 = ivals_ref[s, 1 + i + k + 1]
                hit, t, u, v, bias_row = _woop_pair(
                    cluster_ref[cid0], cluster_ref[cid1], od, tmin, tmax,
                    cull_backface,
                )
                bias = jnp.broadcast_to(bias_row[None, :], key_best.shape)
                # Global triangle id per lane (unique: each cluster is
                # visited once per block at one pair position).
                tid = jnp.where(
                    col < K_CS, cid0 * K_CS + col, cid1 * K_CS + col - K_CS
                )
                key = jnp.where(hit, t - bias, _BIG)
                better = key < key_best
                key_best = jnp.where(better, key, key_best)
                tid_best = jnp.where(better, tid, tid_best)
                u_best = jnp.where(better, u, u_best)
                v_best = jnp.where(better, v, v_best)
                b_best = jnp.where(better, bias, b_best)
            worst = jnp.max(key_best.min(axis=1))
            return (i + VISIT_UNROLL, worst, key_best, tid_best, u_best,
                    v_best, b_best)

        shape3 = (1, BLOCK_RAYS // 128, 128)

        # Visit-less blocks (sky, dead shadow rays) skip the carry init
        # and final extraction entirely — ~half the shadow-population
        # blocks are dead, and the all-miss write is just 5 stores.
        @pl.when(count == 0)
        def _():
            t_ref[s] = (tmax + 1.0).reshape(shape3)[0]
            tri_ref[s] = jnp.full((BLOCK_RAYS, 1), -1,
                                  jnp.int32).reshape(shape3)[0]
            zero1 = jnp.zeros((BLOCK_RAYS, 1), jnp.float32)
            u_ref[s] = zero1.reshape(shape3)[0]
            v_ref[s] = zero1.reshape(shape3)[0]
            bias_ref[s] = zero1.reshape(shape3)[0]

        @pl.when(count > 0)
        def _():
            # key init tmax + 1 (t == t_max still wins under strict <);
            # rays that can hit nothing past t_max stop gating the
            # early-out.
            key0 = jnp.broadcast_to(tmax + 1.0, (BLOCK_RAYS, 2 * K_CS))
            zero = jnp.zeros((BLOCK_RAYS, 2 * K_CS), jnp.float32)
            init = (
                jnp.int32(0),
                jnp.max(tmax + 1.0),
                key0,
                # Sentinel id beyond any real/pad triangle id: never
                # matches the extracted winner, so never-hit lanes pick
                # nothing below.
                jnp.full((BLOCK_RAYS, 2 * K_CS), (nc + 1) * K_CS,
                         jnp.int32),
                zero,
                zero,
                zero,
            )
            _, _, key_best, tid_best, u_best, v_best, b_best = (
                jax.lax.while_loop(cond, body, init)
            )

            # ONE extraction per block (the per-visit version of this
            # was the kernel's cost): winning lane = max global id among
            # lanes tied at the per-ray min key.
            best = key_best.min(axis=1, keepdims=True)
            found = best <= tmax
            idx = jnp.where(key_best <= best, tid_best, -1).max(
                axis=1, keepdims=True
            )
            idx = jnp.where(found, idx, -1)
            at = tid_best == idx  # the winning lane (tid unique per lane)
            pick = lambda a: jnp.sum(jnp.where(at, a, 0.0), axis=1,
                                     keepdims=True)
            t_ref[s] = best.reshape(shape3)[0]
            tri_ref[s] = idx.reshape(shape3)[0]
            u_ref[s] = pick(u_best).reshape(shape3)[0]
            v_ref[s] = pick(v_best).reshape(shape3)[0]
            bias_ref[s] = pick(b_best).reshape(shape3)[0]


def _prep_super(rays8, visits, counts, entries, super_blocks: int,
                unroll: int = VISIT_UNROLL):
    """Pad to a super-block multiple and lay the visit tables out as
    (programs, super_blocks, row): count + visit ids ride one DMA; the
    id row is padded with the pad-cluster id `nc` so the unrolled walk
    can read past `count` harmlessly."""
    n = rays8.shape[1]
    n_blocks = n // BLOCK_RAYS
    nc = visits.shape[1]
    pad_b = (-n_blocks) % super_blocks
    ivals = jnp.concatenate(
        [counts[:, None], visits,
         jnp.full((n_blocks, unroll), nc, jnp.int32)], axis=1
    )
    pad_cols = (-ivals.shape[1]) % 128
    if pad_cols:
        ivals = jnp.concatenate(
            [ivals, jnp.full((n_blocks, pad_cols), nc, jnp.int32)], axis=1
        )
    entries_p = _pad128(entries)
    if pad_b:
        # Padded blocks: count 0, pad-id visits.
        pad_row = jnp.full((pad_b, ivals.shape[1]), nc, jnp.int32)
        pad_row = pad_row.at[:, 0].set(0)
        ivals = jnp.concatenate([ivals, pad_row], 0)
        entries_p = jnp.concatenate(
            [entries_p, jnp.full((pad_b, entries_p.shape[1]), _BIG)], 0
        )
        rays8 = jnp.concatenate(
            [rays8, jnp.zeros((8, pad_b * BLOCK_RAYS), rays8.dtype)], 1
        )
    nbp = n_blocks + pad_b
    ivals = ivals.reshape(nbp // super_blocks, super_blocks, -1)
    entries_p = entries_p.reshape(nbp // super_blocks, super_blocks, -1)
    return rays8, ivals, entries_p, n_blocks, nbp


@functools.partial(
    jax.jit, static_argnames=("cull_backface", "interpret", "super_blocks")
)
def _trace_opaque_vmem_impl(rays8, cluster_tris, visits, counts, entries,
                            cull_backface: bool, interpret: bool,
                            super_blocks: int = SUPER_BLOCKS):
    nv = visits.shape[1]
    rays8, ivals, entries_p, n_blocks, nbp = _prep_super(
        rays8, visits, counts, entries, super_blocks, VISIT_UNROLL
    )
    kern = functools.partial(_kernel_vmem, cull_backface=cull_backface,
                             nc=nv, super_blocks=super_blocks)
    t, tri, u, v, bias = pl.pallas_call(
        kern,
        grid=(nbp // super_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # ivals
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # entries
            pl.BlockSpec((8, super_blocks * BLOCK_RAYS), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            # The whole cluster table in VMEM; the index map is constant
            # so Pallas copies it once, not per program.
            pl.BlockSpec(cluster_tris.shape, lambda p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((super_blocks, BLOCK_RAYS // 128, 128),
                         lambda p: (p, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(5)
        ),
        scratch_shapes=[
            pltpu.SMEM((super_blocks, ivals.shape[2]), jnp.int32),
            pltpu.SMEM((super_blocks, entries_p.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=tuple(
            jax.ShapeDtypeStruct((nbp, BLOCK_RAYS // 128, 128), dt,
                                 vma=_vma_of(rays8, ivals, entries_p))
            for dt in (jnp.float32, jnp.int32, jnp.float32, jnp.float32,
                       jnp.float32)
        ),
        interpret=interpret,
    )(ivals, entries_p, rays8, cluster_tris)
    m = n_blocks * BLOCK_RAYS
    out = lambda a: a.reshape(nbp * BLOCK_RAYS)[:m]
    return out(t), out(tri), out(u), out(v), out(bias)


def _shadow_kernel_vmem(ivals_hbm, entry_hbm, rays_ref, cluster_ref,
                        out_ref, ivals_ref, entry_ref, vsems, *, nc: int,
                        super_blocks: int):
    """VMEM-resident + multi-block + elementwise-carry variant of
    _shadow_kernel (see _kernel_vmem for the rationale)."""
    p = pl.program_id(0)
    row_i = pltpu.make_async_copy(
        ivals_hbm.at[p], ivals_ref, vsems.at[0],
    )
    row_e = pltpu.make_async_copy(
        entry_hbm.at[p], entry_ref, vsems.at[1],
    )
    row_i.start()
    row_e.start()
    row_i.wait()
    row_e.wait()

    for s in range(super_blocks):
        count = ivals_ref[s, 0]
        sl = slice(s * BLOCK_RAYS, (s + 1) * BLOCK_RAYS)
        od = _block_od(rays_ref, sl)
        tmin = rays_ref[6, sl].reshape(BLOCK_RAYS, 1)
        tmax = rays_ref[7, sl].reshape(BLOCK_RAYS, 1)

        # STATIC entry bound: clusters whose conservative entry lies
        # beyond every ray's t_max can't block anything that matters.
        # Deliberately NOT tightened per iteration with unblocked-ray
        # t_max: the tightening reductions cost more than they saved
        # at SHADOW_UNROLL=8 (benchmarks/kernelab.py, round 4).
        worst0 = jnp.max(tmax)

        def cond(carry):
            i, blocked_n = carry[0], carry[1]
            return (
                (i < count)
                & (blocked_n < float(BLOCK_RAYS))
                & (entry_ref[s, jnp.minimum(i, nc - 1)] <= worst0)
            )

        def body(carry):
            i, blocked_n, bl = carry
            for k in range(0, SHADOW_UNROLL, 2):
                cid0 = ivals_ref[s, 1 + i + k]
                cid1 = ivals_ref[s, 1 + i + k + 1]
                hit = _woop_pair_occl(
                    cluster_ref[cid0], cluster_ref[cid1], od, tmin, tmax,
                )
                bl = jnp.maximum(bl, jnp.where(hit, 1.0, 0.0))
            row_blocked = bl.max(axis=1, keepdims=True)
            blocked_n = row_blocked.sum()
            return (i + SHADOW_UNROLL, blocked_n, bl)

        @pl.when(count == 0)
        def _():
            out_ref[s] = jnp.zeros(
                (1, BLOCK_RAYS // 128, 128), jnp.int32
            )[0]

        @pl.when(count > 0)
        def _():
            init = (jnp.int32(0), jnp.float32(0),
                    jnp.zeros((BLOCK_RAYS, 2 * K_CS), jnp.float32))
            _, _, bl = jax.lax.while_loop(cond, body, init)
            out_ref[s] = (
                bl.max(axis=1, keepdims=True).reshape(
                    1, BLOCK_RAYS // 128, 128
                )
                > 0.5
            ).astype(jnp.int32)[0]


@functools.partial(jax.jit, static_argnames=("interpret", "super_blocks"))
def _shadow_vmem_impl(rays8, cluster_tris, visits, counts, entries,
                      interpret: bool, super_blocks: int = SUPER_BLOCKS):
    nv = visits.shape[1]
    rays8, ivals, entries_p, n_blocks, nbp = _prep_super(
        rays8, visits, counts, entries, super_blocks, SHADOW_UNROLL
    )
    kern = functools.partial(_shadow_kernel_vmem, nc=nv,
                             super_blocks=super_blocks)
    blocked = pl.pallas_call(
        kern,
        grid=(nbp // super_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((8, super_blocks * BLOCK_RAYS), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cluster_tris.shape, lambda p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((super_blocks, BLOCK_RAYS // 128, 128),
                               lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((super_blocks, ivals.shape[2]), jnp.int32),
            pltpu.SMEM((super_blocks, entries_p.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((nbp, BLOCK_RAYS // 128, 128),
                                       jnp.int32,
                                       vma=_vma_of(rays8, ivals, entries_p)),
        interpret=interpret,
    )(ivals, entries_p, rays8, cluster_tris)
    return blocked.reshape(nbp * BLOCK_RAYS)[: n_blocks * BLOCK_RAYS]


def _clusters_fit_vmem(cluster_tris) -> bool:
    return cluster_tris.size * 4 <= VMEM_CLUSTER_BYTES


@functools.partial(jax.jit, static_argnames=("cull_backface", "interpret"))
def _trace_opaque_pallas_impl(rays8, cluster_tris, visits, counts, entries,
                              cull_backface: bool, interpret: bool):
    n = rays8.shape[1]
    n_blocks = n // BLOCK_RAYS
    nc = cluster_tris.shape[0]
    nv = visits.shape[1]
    kern = functools.partial(_kernel, cull_backface=cull_backface, nc=nv)
    # DMA row slices must be 128-aligned in the trailing dim.
    ivals = _pad128(jnp.concatenate([counts[:, None], visits], axis=1))[:, None]
    entries = _pad128(entries)[:, None]
    t, tri, u, v, bias = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # ivals rows
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # entry rows
            pl.BlockSpec((8, BLOCK_RAYS), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # clusters stay in HBM
        ],
        out_specs=tuple(
            pl.BlockSpec((1, BLOCK_RAYS // 128, 128),
                         lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(5)
        ),
        scratch_shapes=[
            pltpu.SMEM((1, ivals.shape[2]), jnp.int32),
            pltpu.SMEM((1, entries.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, C_ROWS, CLUSTER_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_blocks, BLOCK_RAYS // 128, 128), dt,
                                 vma=_vma_of(rays8, ivals, entries))
            for dt in (jnp.float32, jnp.int32, jnp.float32, jnp.float32,
                       jnp.float32)
        ),
        interpret=interpret,
    )(ivals, entries, rays8, cluster_tris)
    return (t.reshape(n), tri.reshape(n), u.reshape(n), v.reshape(n),
            bias.reshape(n))


def _regroup_order(origins, dirs, t_min, t_max, mode):
    """Ray order that packs coherent rays into the same 512-ray blocks.

    Incoherent populations defeat the per-block cluster culling: castle
    GI bounce rays visit 4.2x the clusters of primary rays, and
    regrouping by direction cell recovers 0.56x (benchmarks/gistats.py).
    mode "dir": direction octant + 4x4 dominant-axis cell (hemisphere
    bounce rays — scattered directions, coherent origins). mode
    "origin": origin cell in the live-ray AABB + direction octant
    (bounce-point shadow rays — scattered origins). Dead rays (empty
    interval) sort last so live blocks stay dense and dead blocks
    skip entirely. Results are bit-identical either way: every kernel
    decision below block granularity is per-ray."""
    n = dirs.shape[1]
    live = t_max >= t_min
    oct_ = (
        (dirs[0] >= 0).astype(jnp.int32)
        + 2 * (dirs[1] >= 0).astype(jnp.int32)
        + 4 * (dirs[2] >= 0).astype(jnp.int32)
    )
    if mode == "dir":
        dom = jnp.maximum(jnp.abs(dirs).max(axis=0), 1e-6)
        u = jnp.clip((dirs[0] / dom * 0.5 + 0.5) * 4.0, 0.0, 3.0)
        v = jnp.clip((dirs[1] / dom * 0.5 + 0.5) * 4.0, 0.0, 3.0)
        key = oct_ * 16 + u.astype(jnp.int32) * 4 + v.astype(jnp.int32)
    else:
        assert mode == "origin", mode
        lo = jnp.min(jnp.where(live[None], origins, _BIG), axis=1)
        hi = jnp.max(jnp.where(live[None], origins, -_BIG), axis=1)
        span = jnp.maximum(hi - lo, 1e-6)
        q = jnp.clip(
            (origins - lo[:, None]) / span[:, None] * 8.0, 0.0, 7.0
        ).astype(jnp.int32)
        key = ((q[0] * 8 + q[1]) * 8 + q[2]) * 8 + oct_
    key = jnp.where(live, key, jnp.int32(1) << 20)
    order = jnp.argsort(key)
    # Inverse permutation by a SECOND argsort instead of a scatter of
    # iota: in-frame the iota scatter fused pathologically (~5 ms at
    # 720p GI scale) while the sort costs ~1.5 ms; scattering the
    # traced outputs directly was worse still (~21 ms — TPU scatter
    # with runtime indices serializes).
    inv = jnp.argsort(order)
    return order, inv


def _regrouped(base_fn, mode: str):
    """Wrap an opaque_fn: permute rays into coherent blocks, trace,
    inverse-permute the results. Plane-wise column gathers: measured
    2x cheaper in-frame than (n, 8) row gathers of the transposed
    layout at 720p GI scale (row tiles pad 8 -> 128 lanes)."""

    def fn(origins, dirs, t_min, t_max, scene, cull_backface=True,
           chunk=0):
        order, inv = _regroup_order(origins, dirs, t_min, t_max, mode)
        g = jnp.concatenate(
            [origins, dirs, t_min[None], t_max[None]], 0
        )[:, order]
        t, tri, uv, bias = base_fn(
            g[0:3], g[3:6], g[6], g[7], scene, cull_backface, chunk,
        )
        packed = jnp.stack(
            [t, uv[:, 0], uv[:, 1], bias,
             jax.lax.bitcast_convert_type(tri, jnp.float32)], 0,
        )[:, inv]
        tri_o = jax.lax.bitcast_convert_type(packed[4], jnp.int32)
        return packed[0], tri_o, packed[1:3].T, packed[3]

    return fn


def make_opaque_fn(interpret: bool = False, regroup=None):
    """Build an opaque_fn for tracer.trace: the Pallas packet tracer.

    regroup ("dir"/"origin"/None): sort incoherent rays into coherent
    blocks first — see _regroup_order."""

    def opaque_fn(origins, dirs, t_min, t_max, scene, cull_backface=True,
                  chunk=0):
        del chunk
        n = origins.shape[1]
        pad = (-n) % BLOCK_RAYS
        if pad:
            padf = lambda a: jnp.concatenate(
                [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1
            )
            pad1 = lambda a: jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
            origins_p, dirs_p = padf(origins), padf(dirs)
            t_min_p, t_max_p = pad1(t_min), pad1(t_max) - 1.0
        else:
            origins_p, dirs_p, t_min_p, t_max_p = origins, dirs, t_min, t_max

        cluster_tris, lo, hi = build_cluster_data(scene)

        # Clamp each ray's t_max to its scene-AABB exit: rays that leave
        # the geometry (sky) stop gating the packet early-out, and rays
        # that miss the scene entirely visit nothing. Misses are
        # identified by tri == -1, so the clamp never changes results.
        glo = lo.min(axis=1, keepdims=True)  # (3, 1)
        ghi = hi.max(axis=1, keepdims=True)
        g_lo = jnp.full(t_min_p.shape, -_BIG)
        g_hi = jnp.full(t_min_p.shape, _BIG)
        for c in range(3):
            d = dirs_p[c]
            par = jnp.abs(d) <= 1e-12
            idir = 1.0 / jnp.where(~par, d, 1.0)
            ta = (glo[c] - origins_p[c]) * idir
            tb = (ghi[c] - origins_p[c]) * idir
            g_lo = jnp.maximum(g_lo, jnp.where(par, -_BIG, jnp.minimum(ta, tb)))
            g_hi = jnp.minimum(g_hi, jnp.where(par, _BIG, jnp.maximum(ta, tb)))
        g_hi = g_hi + jnp.abs(g_hi) * 1e-5 + 1e-4  # never clip boundary hits
        in_box = (g_lo <= g_hi) & (g_hi >= t_min_p)
        t_max_k = jnp.where(in_box, jnp.minimum(t_max_p, g_hi), t_min_p - 1.0)

        bias_max = jnp.max(
            jnp.where(scene.valid & ~scene.alpha, scene.bias, 0.0)
        )
        rays8 = jnp.concatenate(
            [origins_p, dirs_p, t_min_p[None], t_max_k[None]], axis=0
        )
        # VMEM kernels take the Woop matmul form at K_CS-triangle visit
        # granularity (pairs packed per 128-lane tile); the HBM-DMA
        # fallback (scenes past the VMEM budget) keeps the MT triangle
        # rows at CLUSTER_SIZE.
        mats = build_cluster_mats(scene, K_CS)
        if _clusters_fit_vmem(mats):
            lo_k, hi_k = build_cluster_boxes(scene, K_CS)
            visits, counts, entries = block_visit_lists(
                origins_p, dirs_p, t_min_p, t_max_k, lo_k, hi_k,
                BLOCK_RAYS, bias_max=bias_max,
                # 2x the group factor: K_CS boxes are half-size, so the
                # level-1 group boxes (and the per-ray level-1 cost)
                # keep the same physical extent as the 128-tri path.
                group_clusters=2 * GROUP_CLUSTERS,
            )
            # Append an always-inactive pad cluster (visit padding id).
            cluster = jnp.concatenate(
                [mats, jnp.zeros((1,) + mats.shape[1:], mats.dtype)], 0
            )
            impl = _trace_opaque_vmem_impl
        else:
            visits, counts, entries = block_visit_lists(
                origins_p, dirs_p, t_min_p, t_max_k, lo, hi, BLOCK_RAYS,
                bias_max=bias_max,
            )
            cluster = jnp.concatenate(
                [cluster_tris,
                 jnp.zeros((1,) + cluster_tris.shape[1:],
                           cluster_tris.dtype)], 0
            )
            impl = _trace_opaque_pallas_impl
        t, tri, u, v, bias = impl(
            rays8, cluster, visits, counts, entries, cull_backface,
            interpret,
        )
        t, tri = t[:n], tri[:n]
        t = jnp.where(tri >= 0, t, _BIG)
        # The kernel carries the winning hit's u/v/bias out with it, so
        # no re-intersection (3 corner gathers) and no bias gather.
        uv = jnp.stack([u[:n], v[:n]], axis=-1)
        return t, tri, uv, bias[:n]

    if regroup:
        return _regrouped(opaque_fn, regroup)
    return opaque_fn


def _shadow_kernel(ivals_hbm, entry_hbm, rays_ref, cluster_hbm,
                   out_ref, ivals_ref, entry_ref, vsems, scratch, sems, *,
                   nc: int):
    """Any-hit occlusion kernel: early-exits the cluster walk once every
    ray in the block is blocked (the ACCEPT_FIRST_HIT_AND_END_SEARCH
    analog, Lights.hlsli:43), or once the next front-to-back cluster
    starts beyond every unblocked ray's t_max. Backface culling off
    (SKIP_BACKFACE_SHADOWS undefined). Visit tables arrive via
    per-block HBM->SMEM row DMA (see _kernel)."""
    b = pl.program_id(0)
    row_i = pltpu.make_async_copy(ivals_hbm.at[b], ivals_ref, vsems.at[0])
    row_e = pltpu.make_async_copy(entry_hbm.at[b], entry_ref, vsems.at[1])
    row_i.start()
    row_e.start()
    row_i.wait()
    row_e.wait()
    count = ivals_ref[0, 0]

    ox = rays_ref[0].reshape(BLOCK_RAYS, 1)
    oy = rays_ref[1].reshape(BLOCK_RAYS, 1)
    oz = rays_ref[2].reshape(BLOCK_RAYS, 1)
    dx = rays_ref[3].reshape(BLOCK_RAYS, 1)
    dy = rays_ref[4].reshape(BLOCK_RAYS, 1)
    dz = rays_ref[5].reshape(BLOCK_RAYS, 1)
    tmin = rays_ref[6].reshape(BLOCK_RAYS, 1)
    tmax = rays_ref[7].reshape(BLOCK_RAYS, 1)

    def cluster_dma(slot, i):
        cid = ivals_ref[0, 1 + i]
        return pltpu.make_async_copy(
            cluster_hbm.at[cid], scratch.at[slot], sems.at[slot]
        )

    @pl.when(count > 0)
    def _():
        cluster_dma(0, 0).start()

    def cond(carry):
        i, blocked_n, worst, _ = carry
        return (
            (i < count)
            & (blocked_n < float(BLOCK_RAYS))
            & (entry_ref[0, jnp.minimum(i, nc - 1)] <= worst)
        )

    def body(carry):
        i, blocked_n, worst, blocked = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < count)
        def _():
            cluster_dma(1 - slot, i + 1).start()

        cluster_dma(slot, i).wait()
        tri = scratch[slot]
        v0x = tri[C_V0X][None, :]
        v0y = tri[C_V0Y][None, :]
        v0z = tri[C_V0Z][None, :]
        e1x = tri[C_E1X][None, :]
        e1y = tri[C_E1Y][None, :]
        e1z = tri[C_E1Z][None, :]
        e2x = tri[C_E2X][None, :]
        e2y = tri[C_E2Y][None, :]
        e2z = tri[C_E2Z][None, :]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        keep = jnp.abs(det) > 1e-9
        inv_det = 1.0 / jnp.where(keep, det, 1.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (
            keep & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin) & (t <= tmax) & (tri[C_ACTIVE][None, :] > 0.0)
        )
        # Carry as 2D float: i1/1D vector carries fail Mosaic layout.
        blocked = jnp.maximum(
            blocked, jnp.where(hit, 1.0, 0.0).max(axis=1, keepdims=True)
        )
        blocked_n = blocked.sum()
        # Farthest t_max among still-unblocked rays: clusters entirely
        # beyond it can't block anything that matters.
        worst = jnp.max(tmax * (1.0 - blocked))
        return (i + 1, blocked_n, worst, blocked)

    init = (jnp.int32(0), jnp.float32(0), jnp.max(tmax),
            jnp.zeros((BLOCK_RAYS, 1), jnp.float32))
    i_final, _, _, blocked = jax.lax.while_loop(cond, body, init)

    # Early exit leaves the i_final prefetch in flight; drain it so the
    # kernel never ends with a dangling DMA.
    @pl.when(i_final < count)
    def _():
        cluster_dma(jax.lax.rem(i_final, 2), i_final).wait()

    out_ref[:] = (
        blocked.reshape(1, BLOCK_RAYS // 128, 128) > 0.5
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _shadow_pallas_impl(rays8, cluster_tris, visits, counts, entries,
                        interpret: bool):
    n = rays8.shape[1]
    n_blocks = n // BLOCK_RAYS
    nv = visits.shape[1]
    kern = functools.partial(_shadow_kernel, nc=nv)
    ivals = _pad128(jnp.concatenate([counts[:, None], visits], axis=1))[:, None]
    entries = _pad128(entries)[:, None]
    blocked = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((8, BLOCK_RAYS), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_RAYS // 128, 128),
                               lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1, ivals.shape[2]), jnp.int32),
            pltpu.SMEM((1, entries.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, C_ROWS, CLUSTER_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n_blocks, BLOCK_RAYS // 128, 128),
                                       jnp.int32,
                                       vma=_vma_of(rays8, ivals, entries)),
        interpret=interpret,
    )(ivals, entries, rays8, cluster_tris)
    return blocked.reshape(n)


def make_shadow_opaque_fn(interpret: bool = False, regroup=None):
    """opaque_fn for shadow traces: occlusion-only with early exit.

    Returns results in trace_opaque's shape contract: tri = 0 when
    blocked (-1 otherwise), t = 0/BIG — exactly what the shadow-factor
    consumer reads (tri_op >= 0 means fully occluded)."""

    def opaque_fn(origins, dirs, t_min, t_max, scene, cull_backface=False,
                  chunk=0):
        del chunk, cull_backface  # shadows never cull
        n = origins.shape[1]
        pad = (-n) % BLOCK_RAYS
        if pad:
            padf = lambda a: jnp.concatenate(
                [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1
            )
            pad1 = lambda a: jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
            origins_p, dirs_p = padf(origins), padf(dirs)
            t_min_p, t_max_p = pad1(t_min), pad1(t_max) - 1.0
        else:
            origins_p, dirs_p, t_min_p, t_max_p = origins, dirs, t_min, t_max

        rays8 = jnp.concatenate(
            [origins_p, dirs_p, t_min_p[None], t_max_p[None]], axis=0
        )
        mats = build_cluster_mats(scene, K_CS)
        if _clusters_fit_vmem(mats):
            lo_k, hi_k = build_cluster_boxes(scene, K_CS)
            visits, counts, entries = block_visit_lists(
                origins_p, dirs_p, t_min_p, t_max_p, lo_k, hi_k, BLOCK_RAYS,
                group_clusters=2 * GROUP_CLUSTERS,
            )
            cluster = jnp.concatenate(
                [mats, jnp.zeros((1,) + mats.shape[1:], mats.dtype)], 0
            )
            shadow_impl = _shadow_vmem_impl
        else:
            cluster_tris, lo, hi = build_cluster_data(scene)
            visits, counts, entries = block_visit_lists(
                origins_p, dirs_p, t_min_p, t_max_p, lo, hi, BLOCK_RAYS
            )
            cluster = jnp.concatenate(
                [cluster_tris,
                 jnp.zeros((1,) + cluster_tris.shape[1:],
                           cluster_tris.dtype)], 0
            )
            shadow_impl = _shadow_pallas_impl
        blocked = shadow_impl(
            rays8, cluster, visits, counts, entries, interpret
        )[:n] > 0
        t = jnp.where(blocked, 0.0, _BIG)
        tri = jnp.where(blocked, 0, -1)
        uv = jnp.zeros((n, 2), jnp.float32)
        # 4-tuple contract: bias 0 keeps trace_opaque_only from doing a
        # per-ray scene.bias gather that the occlusion consumer never
        # reads (profiled ~1.4 ms per 565k-ray launch).
        return t, tri, uv, jnp.zeros((n,), jnp.float32)

    if regroup:
        # NOT _regrouped_occl-style single-plane inverses: a lone (n,)
        # gather profiled WORSE (3.5 ms) than the stacked 5-plane one
        # (2.5 ms) — multi-row gathers amortize the per-row granule.
        return _regrouped(opaque_fn, regroup)
    return opaque_fn
