"""The frame graph: one jitted program per frame — planar layout.

Reimplements View::render's pass DAG (rt64_view.cpp:1180-1667) as pure
functions over HBM-resident planes:

    build tri rows (TLAS/BLAS refit analog)
    -> primary -> direct -> indirect -> refraction -> reflection loop
    -> DI/GI filter -> compose -> upscale -> post-process

plus the temporal history swap (the rtSwap double-buffer flip,
rt64_view.cpp:1663-1667). Hand-placed UAV barriers disappear — XLA's
dataflow provides the ordering — and every pass fuses into one program.

All per-pixel data is planar ((C, N) / (C, H, W)): trailing small dims
pad to the TPU's 128-lane tile and were measured 6-40x slower. Raygen
math mirrors the five HLSL raygen shaders 1:1 (citations inline). Loop
bounds that shape the program (sample counts, hit slots, reflection
bounces) are static config; everything else is traced.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rt64tpu import descriptors as d
from rt64tpu.ops import bluenoise, filters, fog, lighting, raster, sky, tracer
from rt64tpu.ops import random as rnd
from rt64tpu.ops import shading as shade_ops
from rt64tpu.ops import vecmath as vm
from rt64tpu.pipeline import rows as R
from rt64tpu.pipeline import scene_buffers as sbuf

EPSILON = 1e-6
APPLY_LIGHTS_MINIMUM_ALPHA = 0.5  # Constants.hlsli
_BIG = 3.0e37


@dataclass(frozen=True)
class RenderConfig:
    """Static (shape-determining) configuration — the jit cache key."""

    rt_width: int
    rt_height: int
    display_width: int
    display_height: int
    di_samples: int = 1
    gi_samples: int = 1
    max_lights: int = 12
    max_reflections: int = 2  # rt64_view.cpp:60
    k_primary: int = 4  # alpha hit slots (<= MAX_HIT_QUERIES 16)
    k_secondary: int = 2
    k_shadow: int = 1
    motion_blur_samples: int = 32  # rt64_view.cpp:53
    # STATIC motion-blur gate: the host knows whether the strength knob
    # is zero; a runtime lax.cond over the display image is a multi-ms
    # scheduling fence on TPU. Flipping the knob re-specializes the jit.
    motion_blur_enabled: bool = True
    denoiser_enabled: bool = False
    gi_filter_passes: int = 5  # rt64_view.cpp:1512-1530
    upscaler: int = 0
    tri_chunk: int = 512
    alpha_cap: int = 256  # compacted alpha triangle list capacity
    refraction_enabled: bool = True  # static skip (dryrun/slim configs)
    # Compacted-shade capacity multiplier: grown (re-specializing the
    # jit) when a frame reports alpha_dropped > 0 — the capacity-bucket
    # pattern (limits.py) applied to alpha-hit shading.
    alpha_shade_boost: int = 1
    # STATIC sharpening gate (like motion_blur_enabled): the host knows
    # whether upscaler_sharpness is zero; the strength itself is traced
    # (gp.upscaler_sharpness) so slider drags don't re-specialize.
    sharpen_enabled: bool = False
    use_pallas_tracer: bool = False  # cluster-culled packet kernel (TPU)
    # Run the packet kernels through the Pallas interpreter (CPU):
    # validates the production traversal path — including under
    # shard_map — on hosts without TPU hardware.
    pallas_interpret: bool = False
    # Multi-chip row tiling (parallel/tiling.py): rt_height is this
    # shard's rows; full_height is the whole image (0 = unsharded).
    full_height: int = 0

    @property
    def display_grid_height(self) -> int:
        """Full-image display height (sharded configs divide
        display_height by the device count; screen-space math like the
        sky-plane aspect must use the whole viewport)."""
        if not self.full_height:
            return self.display_height
        return self.display_height * (self.full_height // self.rt_height)

    @property
    def grid_height(self) -> int:
        return self.full_height or self.rt_height

    # Tile-swizzled ray order: each 8x64 pixel tile is contiguous in the
    # flat pixel axis, so the packet tracer's 512-ray blocks are compact
    # screen tiles instead of quarter-rows — far tighter cluster culling
    # (decisive at high resolutions). Enabled whenever dimensions allow;
    # per-pixel math is order-independent so results are identical.
    TILE_H = 8
    TILE_W = 64

    @property
    def tiled(self) -> bool:
        return (
            self.rt_width % self.TILE_W == 0
            and self.rt_height % self.TILE_H == 0
        )


class GlobalParams(NamedTuple):
    """Traced per-frame parameters (GlobalParams.hlsli:8-43)."""

    view: jax.Array
    view_i: jax.Array
    prev_view_i: jax.Array
    projection: jax.Array
    projection_i: jax.Array
    view_proj: jax.Array
    prev_view_proj: jax.Array
    camera_u: jax.Array
    camera_v: jax.Array
    camera_w: jax.Array
    pixel_jitter: jax.Array  # (2,)
    ambient_base: jax.Array  # (3,)
    ambient_no_gi: jax.Array
    eye_light_diffuse: jax.Array
    eye_light_specular: jax.Array
    sky_diffuse_mult: jax.Array
    sky_hsl_mod: jax.Array
    sky_yaw_offset: jax.Array
    gi_diffuse_strength: jax.Array
    gi_sky_strength: jax.Array
    motion_blur_strength: jax.Array
    sky_plane_rec: jax.Array  # int32 quad-pool record (-1 = none)
    frame_count: jax.Array  # uint32
    di_reproject: jax.Array  # bool
    gi_reproject: jax.Array  # bool
    binary_lock_mask: jax.Array  # bool
    # resetAccumulation for the in-frame temporal upscaler
    # (rt64_upscaler.h:40); None when the FSR slot is off.
    temporal_reset: jax.Array | None = None
    # upscalerSharpness (rt64_upscaler.h:25-41): RCAS strength applied
    # to the upscaled output when cfg.sharpen_enabled (the reference
    # feeds it to FSR2's RCAS, rt64_fsr.cpp:141-166, and DLSS,
    # rt64_dlss.cpp:205).
    upscaler_sharpness: jax.Array | None = None


class History(NamedTuple):
    """Temporal state (prev buffers, rt64_view.h:99-110). Flat planes."""

    normal: jax.Array  # (3, N)
    depth: jax.Array  # (N,)
    direct: jax.Array  # (4, N) rgb + history length
    indirect: jax.Array  # (4, N)

    @staticmethod
    def zeros(h: int, w: int) -> "History":
        n = h * w
        return History(
            normal=jnp.zeros((3, n), jnp.float32),
            depth=jnp.zeros((n,), jnp.float32),
            direct=jnp.zeros((4, n), jnp.float32),
            indirect=jnp.zeros((4, n), jnp.float32),
        )


class GBuffers(NamedTuple):
    """Primary-pass outputs (GlobalBuffers.hlsli u0-u15), planar."""

    view_dir: jax.Array  # (3, N)
    position: jax.Array  # (3, N)
    normal: jax.Array  # (3, N)
    specular: jax.Array  # (3, N)
    diffuse_rgb: jax.Array  # (3, N)
    diffuse_a: jax.Array  # (N,)
    instance: jax.Array  # (N,) int32 (-1 none)
    transparent: jax.Array  # (3, N)
    flow: jax.Array  # (2, N) screen-pixel motion
    reactive: jax.Array  # (N,)
    lock: jax.Array  # (N,)
    depth: jax.Array  # (N,)
    refl_alpha: jax.Array  # (N,)
    refr_alpha: jax.Array  # (N,)
    row: jax.Array  # (R.CTXROW, N) stored-hit context row (rows.py CTX_*)
    alpha_dropped: jax.Array  # () int32 — alpha hits beyond shade capacity


class FrameOutputs(NamedTuple):
    image: jax.Array  # (3, DH, DW) linear float
    history: History
    gbuffers: GBuffers
    direct_accum: jax.Array  # (4, N)
    indirect_accum: jax.Array  # (4, N)
    filtered_direct: jax.Array  # (3, N)
    filtered_indirect: jax.Array  # (3, N)
    reflection: jax.Array  # (3, N)
    refraction: jax.Array  # (3, N)
    rt_output: jax.Array  # (3, H, W)
    alpha_dropped: jax.Array  # () int32 (see GBuffers.alpha_dropped)
    # Temporal-upscaler history (3, DH, DW) when the FSR slot ran
    # in-frame (donate back in as render_frame's `temporal`); else None.
    temporal: jax.Array | None = None


def make_trace_scene(sb, rows_t, alpha_cap: int) -> tracer.TraceScene:
    """Tracer view over the triangle rows (zero-copy slices)."""
    flags = rows_t[R.T_FLAGS].astype(jnp.int32)
    alpha = ((flags & R.F_ALPHA_CLASS) != 0) & sb.tri_valid
    no_cull = (flags & R.F_NO_CULL) != 0
    bias = rows_t[R.T_MAT + R.M_DEPTH_BIAS]
    feat = getattr(sb, "features", None)
    v0 = rows_t[R.T_P0 : R.T_P0 + 3]
    v1 = rows_t[R.T_P1 : R.T_P1 + 3]
    v2 = rows_t[R.T_P2 : R.T_P2 + 3]
    alpha_idx = tracer.sort_alpha_spatial(
        tracer.compact_alpha(sb.tri_valid, alpha, alpha_cap), v0, v1, v2
    )
    return tracer.TraceScene(
        v0=v0,
        v1=v1,
        v2=v2,
        valid=sb.tri_valid,
        alpha=alpha,
        no_cull=no_cull,
        bias=bias,
        alpha_idx=alpha_idx,
        has_alpha=None if feat is None else feat.has_alpha,
    )


def _pixel_grid(cfg: RenderConfig, row_offset=0):
    h, w = cfg.rt_height, cfg.rt_width
    xx = jnp.arange(w, dtype=jnp.int32)
    yy = jnp.arange(h, dtype=jnp.int32) + row_offset
    px = jnp.broadcast_to(xx[None, :], (h, w))
    py = jnp.broadcast_to(yy[:, None], (h, w))
    if cfg.tiled:
        px = _from_image_1(cfg, px)
        py = _from_image_1(cfg, py)
    else:
        px = px.reshape(-1)
        py = py.reshape(-1)
    return jnp.stack([px, py], axis=-1)  # (N, 2) int


def _from_image_1(cfg, img_hw):
    """(H, W) -> flat swizzled (N,): pure reshape/transpose."""
    th, tw = cfg.TILE_H, cfg.TILE_W
    h, w = img_hw.shape
    return (
        img_hw.reshape(h // th, th, w // tw, tw)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )


def from_image(cfg, img):
    """(C, H, W) -> (C, N) in the frame's pixel order."""
    c, h, w = img.shape
    if not cfg.tiled:
        return img.reshape(c, -1)
    th, tw = cfg.TILE_H, cfg.TILE_W
    return (
        img.reshape(c, h // th, th, w // tw, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(c, -1)
    )


def to_image(cfg, plane):
    """(C, N) -> (C, H, W) undoing the frame's pixel order."""
    h, w = cfg.rt_height, cfg.rt_width
    squeeze = plane.ndim == 1
    if squeeze:
        plane = plane[None]
    c = plane.shape[0]
    if not cfg.tiled:
        out = plane.reshape(c, h, w)
    else:
        th, tw = cfg.TILE_H, cfg.TILE_W
        out = (
            plane.reshape(c, h // th, w // tw, th, tw)
            .transpose(0, 1, 3, 2, 4)
            .reshape(c, h, w)
        )
    return out[0] if squeeze else out


def flat_index(cfg, x, y):
    """Flat pixel index of integer coords (x, y) in the frame's order
    (the y*W+x analog; used by reprojection gathers). Coordinates are
    GLOBAL (full grid) under row tiling."""
    w = cfg.rt_width
    if not cfg.tiled:
        return y * w + x
    th, tw = cfg.TILE_H, cfg.TILE_W
    block = (y // th) * (w // tw) + x // tw
    within = (y % th) * tw + (x % tw)
    return block * (th * tw) + within


def primary_rays(cfg: RenderConfig, gp: GlobalParams, row_offset=0):
    """Camera ray setup (PrimaryRayGen.hlsl:33-40): planar origin (3, N)
    and NON-normalized direction (3, N), exactly like the reference."""
    pix = _pixel_grid(cfg, row_offset)
    w, h = cfg.rt_width, cfg.grid_height
    dx = ((pix[:, 0].astype(jnp.float32) + 0.5 + gp.pixel_jitter[0]) / w) * 2.0 - 1.0
    dy = ((pix[:, 1].astype(jnp.float32) + 0.5 + gp.pixel_jitter[1]) / h) * 2.0 - 1.0
    pi = gp.projection_i
    # target = [dx, -dy, 1, 1] @ projI (xyz components)
    tx = dx * pi[0, 0] - dy * pi[1, 0] + pi[2, 0] + pi[3, 0]
    ty = dx * pi[0, 1] - dy * pi[1, 1] + pi[2, 1] + pi[3, 1]
    tz = dx * pi[0, 2] - dy * pi[1, 2] + pi[2, 2] + pi[3, 2]
    vi = gp.view_i
    ddx = tx * vi[0, 0] + ty * vi[1, 0] + tz * vi[2, 0]
    ddy = tx * vi[0, 1] + ty * vi[1, 1] + tz * vi[2, 1]
    ddz = tx * vi[0, 2] + ty * vi[1, 2] + tz * vi[2, 2]
    dirs = jnp.stack([ddx, ddy, ddz], 0)
    origin = jnp.broadcast_to(vi[3, :3][:, None], dirs.shape)
    return pix, origin, dirs


def _noise_rand(cfg, gp, pix):
    """Per-pixel combiner-noise random (rt64_shader.cpp:513-516)."""
    flat = (pix[:, 0] + pix[:, 1] * cfg.rt_width).astype(jnp.uint32)
    seed = rnd.init_rand(flat, jnp.broadcast_to(gp.frame_count, flat.shape))
    _, val = rnd.next_rand(seed)
    return val


def world_to_screen(vp, pos):
    """WorldToScreenPos, planar: pos (3, N) -> (u, v) each (N,)."""
    cx = pos[0] * vp[0, 0] + pos[1] * vp[1, 0] + pos[2] * vp[2, 0] + vp[3, 0]
    cy = pos[0] * vp[0, 1] + pos[1] * vp[1, 1] + pos[2] * vp[2, 1] + vp[3, 1]
    cw = pos[0] * vp[0, 3] + pos[1] * vp[1, 3] + pos[2] * vp[2, 3] + vp[3, 3]
    return 0.5 + 0.5 * cx / cw, 0.5 + 0.5 * cy / cw


def _screen_depth(vp, pos):
    cz = pos[0] * vp[0, 2] + pos[1] * vp[1, 2] + pos[2] * vp[2, 2] + vp[3, 2]
    cw = pos[0] * vp[0, 3] + pos[1] * vp[1, 3] + pos[2] * vp[2, 3] + vp[3, 3]
    return cz / cw


def _fresnel(normal, incident, reflectivity, fresnel_multiplier):
    """FresnelReflectAmount (PrimaryRayGen.hlsl:26-30)."""
    d = vm.dot(normal, incident)
    ret = jnp.power(jnp.clip(1.0 + d, EPSILON, 1.0), 5.0)
    return reflectivity + (1.0 - reflectivity) * ret * fresnel_multiplier


def _opaque_fn(cfg, regroup=None):
    """Traversal backend per config: the Pallas packet kernel or None
    (the XLA scan). regroup ("dir"/"origin") sorts incoherent ray
    populations into coherent packet blocks (tracer_pallas._regroup_order)."""
    if cfg.use_pallas_tracer:
        from rt64tpu.ops import tracer_pallas

        return tracer_pallas.make_opaque_fn(
            interpret=cfg.pallas_interpret, regroup=regroup
        )
    return None


def _shadow_fn(cfg, regroup=None):
    """Occlusion backend for shadow rays: the early-exit any-hit kernel
    (ACCEPT_FIRST_HIT_AND_END_SEARCH analog) or None (the XLA scan)."""
    if cfg.use_pallas_tracer:
        from rt64tpu.ops import tracer_pallas

        return tracer_pallas.make_shadow_opaque_fn(
            interpret=cfg.pallas_interpret, regroup=regroup
        )
    return None


def _pack_rows(tree):
    """Flatten a carry pytree of (N,) / (C, N) arrays into one (R, N)
    float32 matrix (bool -> 0/1, int32 -> bitcast) so compacted-space
    results scatter back in ONE per-row-cost scatter."""
    rows = []
    for a in jax.tree_util.tree_leaves(tree):
        if a.dtype == jnp.bool_:
            a = a.astype(jnp.float32)
        elif jnp.issubdtype(a.dtype, jnp.integer):
            a = jax.lax.bitcast_convert_type(a.astype(jnp.int32), jnp.float32)
        rows.append(a[None] if a.ndim == 1 else a)
    return jnp.concatenate(rows, 0)


def _unpack_rows(packed, proto):
    """Inverse of _pack_rows, using `proto` for shapes/dtypes.
    Bools were scattered as exact 0.0/1.0, so > 0.5 restores them."""
    leaves, treedef = jax.tree_util.tree_flatten(proto)
    out, r = [], 0
    for a in leaves:
        c = 1 if a.ndim == 1 else a.shape[0]
        got = packed[r : r + c]
        r += c
        if a.ndim == 1:
            got = got[0]
        if a.dtype == jnp.bool_:
            got = got > 0.5
        elif jnp.issubdtype(a.dtype, jnp.integer):
            got = jax.lax.bitcast_convert_type(got, jnp.int32)
        out.append(got)
    return jax.tree_util.tree_unflatten(treedef, out)


def _prefix_rank(mask):
    """Exclusive prefix count of a (N,) bool mask — lane j's slot in
    the compact_indices ordering. Tiled onto the MXU: within-tile
    exclusive prefixes are one (N/T, T) @ (T, T) strict-lower-triangular
    matmul, cross-tile offsets a tiny cumsum — XLA's generic 1-D cumsum
    lowers to a log-depth scan (~2 ms at 500k lanes), and TPU scatter
    (the alternative inverse) serializes."""
    t = 512
    n = mask.shape[0]
    pad = (-n) % t
    m = mask
    if pad:
        m = jnp.concatenate([m, jnp.zeros((pad,), m.dtype)])
    rows = m.reshape(-1, t).astype(jnp.float32)
    lower = jnp.asarray(
        np.tril(np.ones((t, t), np.float32), -1)
    )  # pre[i] = sum_{j<i} row[j]
    within = jnp.dot(rows, lower.T, preferred_element_type=jnp.float32)
    tot = rows.sum(axis=1)
    offs = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(tot)[:-1]])
    return (within + offs[:, None]).reshape(-1)[:n].astype(jnp.int32)


def _scatter_carry(full, comp, idx, mask=None):
    """Merge a compacted-space carry into its full-width counterpart
    at ray lanes `idx` (pad lanes == n drop). With the candidate `mask`
    the merge runs GATHER-side: slot = prefix rank of the lane, fetch
    the compacted row, select — TPU scatter with runtime indices
    serializes (profiled 4-16 ms/frame at 720p/4K GI scale), while the
    rank is an MXU matmul and the gather's indices are monotonic."""
    fp = _pack_rows(full)
    cp = _pack_rows(comp)
    if mask is not None:
        p = _prefix_rank(mask)
        cap = cp.shape[1]
        sel = mask & (p < cap)
        got = cp[:, jnp.where(sel, p, 0)]
        return _unpack_rows(jnp.where(sel[None], got, fp), full)
    return _unpack_rows(fp.at[:, idx].set(cp, mode="drop"), full)


def _fold_shaded_slots(
    sb, tri_rows, trace_scene, origins, dirs, t_min, t_max, k_alpha,
    noise_rand, cfg, make_carry, slot_fn, cull_backface=True, aux=(),
    mip_diffs=None, regroup=None,
):
    """Trace, then fold slot_fn front-to-back over the K+1 ordered hit
    slots (alpha..., opaque last).

    make_carry(origins, dirs, aux) builds the initial carry at the width
    of its arguments; slot_fn(carry, sh: HitShade, t_s, origins, dirs,
    aux) folds one slot. Both must be width-polymorphic: when the scene
    statically has alpha geometry, the K alpha slots are traced, shaded,
    AND RESOLVED in compacted ray space (one slab cull + compaction for
    the whole pass — see tracer.trace_alpha_to_compact), and the folded
    carry is scattered back to full width once. `aux` is a pytree of
    per-ray f32 arrays the slot body needs ((N,) or (C, N)); it rides
    the same packed gather.

    Each slot is SHADED INSIDE the fold so the per-slot HitShade —
    including its (TROW, M) gathered rows — fuses straight into the
    carry update and is never materialized batch-wide. Slots are
    UNROLLED with no runtime cond: lax.scan/cond here serializes each
    slot's gather DMAs behind the previous slot's compute (profiled:
    the control-flow loops were ~75% of the frame).

    Returns (carry, dropped): dropped counts candidate alpha rays
    beyond the compaction capacity — surfaced so the view can grow
    the capacity and re-specialize (view.py).

    mip_diffs: optional (d_ddx, d_ddy) camera-ray differentials (3, N)
    for ray-diff mip LOD — applied to the OPAQUE winner's diffuse fetch
    only (alpha fringes keep bilinear level 0; their footprint is a few
    texels and the compacted lanes drop the pixel correspondence the
    differentials need).
    """
    n = dirs.shape[1]
    # Candidate rays after the per-triangle opaque-clamped alpha cull
    # measured ~5% on the castle frame; n/16 leaves ~2.4x headroom and
    # the boost ladder (view.py) re-specializes upward on overflow.
    cap = max(1024, (n // 16) * cfg.alpha_shade_boost)
    if trace_scene.has_alpha is True and k_alpha > 0:
        # Compact-once path: opaque full-width, alpha fully compacted.
        t_op, tri_op, uv_op, t_opb = tracer.trace_opaque_only(
            origins, dirs, t_min, t_max, trace_scene,
            cull_backface=cull_backface, chunk=cfg.tri_chunk,
            opaque_fn=_opaque_fn(cfg, regroup),
        )
        ac = tracer.trace_alpha_to_compact(
            origins, dirs, t_min, t_max, trace_scene, k_alpha,
            cull_backface, cap, noise_rand, t_opaque_biased=t_opb,
            extra=aux,
        )
        carry_c = make_carry(ac.origins, ac.dirs, ac.extra)
        for s in range(k_alpha):
            sh_c = shade_ops.shade_hits(
                sb, tri_rows, ac.dirs, ac.tri[:, s], ac.uv[:, s, 0],
                ac.uv[:, s, 1], ac.noise,
            )
            carry_c = slot_fn(carry_c, sh_c, ac.t[:, s], ac.origins,
                              ac.dirs, ac.extra)
        carry = _scatter_carry(make_carry(origins, dirs, aux), carry_c,
                               ac.idx, ac.mask)
        sh = shade_ops.shade_hits(
            sb, tri_rows, dirs, tri_op, uv_op[:, 0], uv_op[:, 1],
            noise_rand,
            mip_args=None if mip_diffs is None else (t_op, *mip_diffs),
        )
        return slot_fn(carry, sh, t_op, origins, dirs, aux), ac.dropped

    # Legacy path: alpha presence unknown at compile time (runtime cond
    # inside tracer.trace) or statically absent.
    hits = tracer.trace(
        origins, dirs, t_min, t_max, trace_scene,
        k_alpha=k_alpha, cull_backface=cull_backface, chunk=cfg.tri_chunk,
        opaque_fn=_opaque_fn(cfg, regroup),
        alpha_compact=cap,
    )
    carry = make_carry(origins, dirs, aux)
    shade_cap = max(512, (n // 8) * cfg.alpha_shade_boost)
    n_alpha_slots = 0 if trace_scene.has_alpha is False else k_alpha
    dropped = hits.alpha_dropped
    for s in range(n_alpha_slots):
        sh, drop_s = shade_ops.shade_hits_compacted(
            sb, tri_rows, dirs, hits.tri_a[:, s], hits.uv_a[:, s, 0],
            hits.uv_a[:, s, 1], noise_rand, shade_cap,
        )
        dropped = dropped + drop_s
        carry = slot_fn(carry, sh, hits.t_a[:, s], origins, dirs, aux)
    sh = shade_ops.shade_hits(
        sb, tri_rows, dirs, hits.tri_op, hits.uv_op[:, 0],
        hits.uv_op[:, 1], noise_rand,
        mip_args=None if mip_diffs is None else (hits.t_op, *mip_diffs),
    )._replace(tri=hits.tri_op)
    return slot_fn(carry, sh, hits.t_op, origins, dirs, aux), dropped


def _ctx_table(tri_rows):
    """(T, CTXROW) column-sliced triangle rows: the 26 columns the
    post-resolve consumers (lighting ctx, reflection fresnel/shine,
    refraction eta) actually read, so full-pixel-width row gathers move
    1/5 the bytes of a (N, TROW) gather. Pure function of tri_rows —
    multiple call sites CSE into one slice inside the jit."""
    return jnp.concatenate(
        [tri_rows[:, s : s + l] for s, l in R.CTX_RUNS], axis=1
    )


def _row_of(tri_rows, tri, valid):
    """Gather compact CONTEXT rows (R.CTXROW, N) for resolved per-pixel
    winners: ONE slim gather instead of carrying full-row selects
    through the slot loop."""
    row = _ctx_table(tri_rows)[jnp.maximum(tri, 0)].T
    return row * valid[None].astype(row.dtype)


def primary_pass(
    sb, gp, cfg, origins, dirs, t_min, t_max, bg_color, tri_rows,
    trace_scene, pix, bn_table, noise_rand,
):
    """Trace + shade + front-to-back alpha resolve, fused per slot
    (PrimaryRayGen.hlsl:76-198)."""
    n = dirs.shape[1]

    def make_carry(origins, dirs, aux):
        m = dirs.shape[1]
        return (
            jnp.ones((m,)),  # res_a
            jnp.zeros((3, m)),  # res_rgb
            jnp.zeros((3, m)),  # res_transparent
            jnp.zeros((3, m)),  # trans_lit_sum
            jnp.zeros((m,)),  # lock_acc
            jnp.zeros((m,)),  # refl_alpha
            jnp.zeros((m,)),  # refr_alpha
            jnp.zeros((m,), bool),  # stored
            jnp.zeros((m,), jnp.int32),  # st_tri; row gathered once at end
            jnp.zeros((3, m)),  # st_pos
            -dirs,  # st_nrm
            jnp.zeros((3, m)),  # st_spec
            jnp.full((m,), -1, jnp.int32),  # st_inst
            jnp.zeros((3, m)),  # st_flow3
            jnp.zeros((m,), bool),  # tl_stored
            jnp.zeros((m,), jnp.int32),  # tl_tri
            jnp.zeros((3, m)),  # tl_pos
            jnp.zeros((3, m)),  # tl_nrm
            jnp.zeros((3, m)),  # tl_spec
        )

    def slot_body(carry, sh, t_s, origins, dirs, aux):
        (res_a, res_rgb, res_transparent, trans_lit_sum, lock_acc,
         refl_alpha, refr_alpha, stored, st_tri, st_pos, st_nrm, st_spec,
         st_inst, st_flow3, tl_stored, tl_tri, tl_pos, tl_nrm,
         tl_spec) = carry
        ambient = vm.splat(gp.ambient_base + gp.ambient_no_gi, dirs)
        color = sh.color  # (4, N)
        inst = sh.instance
        normal = sh.normal
        vspec = sh.specular
        flow3 = sh.flow
        grow = sh.rows_t  # (TROW, N) — fused, never materialized
        mat = lambda off: grow[R.T_MAT + off]
        flags = grow[R.T_FLAGS].astype(jnp.int32)

        valid = inst >= 0
        ha = color[3]
        alpha_contrib = res_a * ha
        live = valid & (alpha_contrib >= EPSILON) & (res_a > EPSILON)
        hit_pos = origins + dirs * t_s[None]

        lock_acc = lock_acc + jnp.where(live, mat(R.M_LOCK) * alpha_contrib, 0.0)

        uses_l = ((flags & R.F_HAS_LIGHTING) != 0) & valid
        apply_l = uses_l & (ha > APPLY_LIGHTS_MINIMUM_ALPHA)

        # Fog folds into transparency (PrimaryRayGen.hlsl:108-113).
        fa = jnp.where(
            mat(R.M_FOG_ENABLED) > 0.0,
            fog.fog_alpha_from_camera(
                hit_pos, gp.view, gp.projection, mat(R.M_FOG_MUL),
                mat(R.M_FOG_OFFSET),
            ),
            0.0,
        )
        fog_rgb = grow[R.T_MAT + R.M_FOG_COLOR : R.T_MAT + R.M_FOG_COLOR + 3]
        res_transparent = res_transparent + jnp.where(
            live[None], fog_rgb * (fa * alpha_contrib)[None], 0.0
        )
        alpha_contrib = alpha_contrib * (1.0 - fa)

        # Reflection seed (PrimaryRayGen.hlsl:116-127).
        refl_f = mat(R.M_REFLECTION)
        has_refl = live & (refl_f > EPSILON)
        fresnel = _fresnel(normal, dirs, refl_f, mat(R.M_REFL_FRESNEL))
        reflect_amount = fresnel * alpha_contrib
        refl_alpha = jnp.where(has_refl, reflect_amount, refl_alpha)
        lock_acc = lock_acc + jnp.where(has_refl, reflect_amount, 0.0)
        alpha_contrib = jnp.where(
            has_refl, alpha_contrib * (1.0 - fresnel), alpha_contrib
        )

        # Color accumulation (PrimaryRayGen.hlsl:129-152).
        color_add = color[:3] * alpha_contrib[None]
        res_rgb = res_rgb + jnp.where((live & apply_l)[None], color_add, 0.0)
        self_l = grow[R.T_MAT + R.M_SELF_LIGHT : R.T_MAT + R.M_SELF_LIGHT + 3]
        spec = grow[R.T_MAT + R.M_SPECULAR : R.T_MAT + R.M_SPECULAR + 3] * vspec

        trans_lit = live & uses_l & ~apply_l
        take_tl = trans_lit & ~tl_stored
        tl_stored = tl_stored | take_tl
        tl_pos = jnp.where(take_tl[None], hit_pos, tl_pos)
        tl_nrm = jnp.where(take_tl[None], normal, tl_nrm)
        tl_spec = jnp.where(take_tl[None], spec, tl_spec)
        tl_tri = jnp.where(take_tl, sh.tri, tl_tri)
        trans_lit_sum = trans_lit_sum + jnp.where(trans_lit[None], color_add, 0.0)
        res_transparent = res_transparent + jnp.where(
            trans_lit[None], color_add * (ambient + self_l), 0.0
        )
        plain = live & ~uses_l
        res_transparent = res_transparent + jnp.where(
            plain[None], color_add * (ambient + self_l), 0.0
        )

        new_res_a = res_a * (1.0 - ha)

        # Refraction seed terminates traversal (PrimaryRayGen.hlsl:156-161).
        has_refr = live & (mat(R.M_REFRACTION) > EPSILON)
        refr_alpha = jnp.where(has_refr, new_res_a, refr_alpha)
        new_res_a = jnp.where(has_refr, 0.0, new_res_a)
        res_a = jnp.where(live, new_res_a, res_a)

        # Primary-hit storage (PrimaryRayGen.hlsl:163-175).
        store_hit = live & (apply_l | has_refl | has_refr) & ~stored
        stored = stored | store_hit
        st_pos = jnp.where(store_hit[None], hit_pos, st_pos)
        st_nrm = jnp.where(store_hit[None], normal, st_nrm)
        st_spec = jnp.where(store_hit[None], spec, st_spec)
        st_inst = jnp.where(store_hit, inst, st_inst)
        st_flow3 = jnp.where(store_hit[None], flow3, st_flow3)
        st_tri = jnp.where(store_hit, sh.tri, st_tri)
        return (
            res_a, res_rgb, res_transparent, trans_lit_sum, lock_acc,
            refl_alpha, refr_alpha, stored, st_tri, st_pos, st_nrm, st_spec,
            st_inst, st_flow3, tl_stored, tl_tri, tl_pos, tl_nrm, tl_spec,
        )

    mip_diffs = None
    feat_mips = getattr(sb, "features", None)
    if feat_mips is not None and feat_mips.has_mips:
        # Camera-ray direction differentials (Ray.hlsli:40-49) for the
        # opt-in mip LOD path; compiled out of stock scenes (has_mips
        # is static). Like the reference (PrimaryRayGen.hlsl:36,59),
        # the differentials use a cameraUVW-basis direction — it is
        # parallel to the traced projI-basis dir but its scale is
        # consistent with cameraU/cameraV, which computeRayDiffs'
        # dot(d, r) terms require.
        from rt64tpu.ops import raydiff

        w_, h_ = cfg.rt_width, cfg.grid_height
        ndx = ((pix[:, 0].astype(jnp.float32) + 0.5 + gp.pixel_jitter[0])
               / w_) * 2.0 - 1.0
        ndy = ((pix[:, 1].astype(jnp.float32) + 0.5 + gp.pixel_jitter[1])
               / h_) * 2.0 - 1.0
        nn = (gp.camera_u[:, None] * ndx[None]
              + gp.camera_v[:, None] * ndy[None]
              + gp.camera_w[:, None])
        mip_diffs = raydiff.compute_ray_diffs(
            nn, gp.camera_u, gp.camera_v, (float(w_), float(h_)),
        )
    carry, alpha_dropped = _fold_shaded_slots(
        sb, tri_rows, trace_scene, origins, dirs, t_min, t_max,
        cfg.k_primary, noise_rand, cfg, make_carry, slot_body,
        mip_diffs=mip_diffs,
    )

    (res_a, res_rgb, res_transparent, trans_lit_sum, lock_acc,
     refl_alpha, refr_alpha, stored, st_tri, st_pos, st_nrm, st_spec,
     st_inst, st_flow3, tl_stored, tl_tri, tl_pos, tl_nrm, tl_spec) = carry

    # Shared transparent light (1 light, checkShadows=true,
    # PrimaryRayGen.hlsl:139-147). One row gather per selected id
    # replaces carrying full rows through the slot loop. Pixels without
    # a transparent-lit hit ride as dead rays (tl_ctx.has_lighting
    # False -> live masking empties their shadow intervals). The shadow
    # TRACE is deferred: render_frame batches this plan's rays with the
    # DI rounds into ONE packet-kernel launch (lighting.trace_plans),
    # removing a whole launch + visit-list build + alpha compaction
    # from the frame.
    st_row = _row_of(tri_rows, st_tri, stored)

    feat = getattr(sb, "features", None)
    if feat is None or feat.has_lit_transparent:
        tl_row = _row_of(tri_rows, tl_tri, tl_stored)
        tl_ctx = lighting.ctx_from_rows(tl_row, tl_stored)
        tl_plan = lighting.plan_lights(
            sb, pix, bn_table, gp.frame_count, dirs, tl_pos, tl_nrm,
            tl_spec, tl_ctx, max_light_count=1,
            di_samples=cfg.di_samples, noise_rand=noise_rand,
        )
    else:
        # No instance can produce a trans-lit hit (ShadeFeatures):
        # the plan, its row gather, and its 1xN shadow rays all
        # compile out.
        tl_plan = None

    # Motion flow (PrimaryRayGen.hlsl:52-56, 163-175, 194).
    bg_pos = origins + dirs * tracer.RAY_MAX_DISTANCE
    pu, pv = world_to_screen(gp.prev_view_proj, bg_pos)
    cu, cv = world_to_screen(gp.view_proj, bg_pos)
    flow_bg_x = (cu - pu) * cfg.rt_width
    flow_bg_y = (cv - pv) * cfg.rt_height
    pu2, pv2 = world_to_screen(gp.prev_view_proj, st_pos - st_flow3)
    cu2, cv2 = world_to_screen(gp.view_proj, st_pos)
    flow_x = jnp.where(stored, (cu2 - pu2) * cfg.rt_width, flow_bg_x)
    flow_y = jnp.where(stored, (cv2 - pv2) * cfg.rt_height, flow_bg_y)
    flow = jnp.stack([-flow_x, flow_y], 0)  # gFlow sign flip (hlsl:194)

    depth = jnp.where(stored, _screen_depth(gp.view_proj, st_pos), 1.0)
    # reactive is PROVISIONAL here: the transparent-light contribution
    # lands in render_frame (after the batched shadow trace), which
    # patches transparent + reactive then.
    reactive = jnp.minimum(res_transparent.max(axis=0), 0.9)
    lock_mask = jnp.where(
        gp.binary_lock_mask,
        (lock_acc > 0.5).astype(jnp.float32),
        jnp.minimum(lock_acc, 1.0),
    )

    # Background blend (PrimaryRayGen.hlsl:183-185).
    res_rgb = res_rgb + bg_color * res_a[None]
    # NOTE (measured): storing the color-like planes as bf16 here
    # showed NO win on castle config 2 (30.9 fps vs 30.6-32.7 f32
    # across repeat runs — inside the bench's ~7% run-to-run noise).
    # The cast fusions and per-consumer upcasts eat the saved HBM
    # bytes at this pass count; plane traffic is spread across many
    # small fusions, not concentrated in G-buffer re-reads.
    g = GBuffers(
        view_dir=dirs,
        position=st_pos,
        normal=st_nrm,
        specular=st_spec,
        diffuse_rgb=res_rgb,
        diffuse_a=1.0 - res_a,
        instance=st_inst,
        transparent=res_transparent,
        flow=flow,
        reactive=reactive,
        lock=lock_mask,
        depth=depth,
        refl_alpha=refl_alpha,
        refr_alpha=refr_alpha,
        row=st_row,
        alpha_dropped=alpha_dropped,
    )
    return g, tl_plan, trans_lit_sum


def _reproject(prev_buf, prev_depth, prev_normal, depth, normal, flow, cfg,
               row_offset=0):
    """Temporal reprojection (DirectRayGen.hlsl:35-48). The prev buffers
    cover the FULL image (replicated under row tiling) so flow may cross
    shard boundaries."""
    h, w = cfg.grid_height, cfg.rt_width
    pix = _pixel_grid(cfg, row_offset).astype(jnp.float32)
    px = jnp.floor(pix[:, 0] + 0.5 + flow[0]).astype(jnp.int32)
    py = jnp.floor(pix[:, 1] + 0.5 + flow[1]).astype(jnp.int32)
    inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    flat = flat_index(cfg, jnp.clip(px, 0, w - 1), jnp.clip(py, 0, h - 1))
    # ONE consolidated history gather: TPU gathers cost per-row, so the
    # depth/normal/accum planes are stacked and fetched together.
    hist_planes = jnp.concatenate([prev_depth[None], prev_normal, prev_buf], 0)
    got = jnp.where(inb[None], hist_planes[:, flat], 0.0)
    p_depth = got[0]
    p_normal = got[1:4]
    p_accum = got[4:]
    weight_depth = jnp.abs(depth - p_depth) / 0.01
    weight_normal = jnp.power(jnp.maximum(vm.dot(p_normal, normal), 0.0), 128.0)
    history_weight = jnp.exp(-weight_depth) * weight_normal
    return p_accum[:3], p_accum[3] * history_weight


def direct_pass(
    cfg, gp, g: GBuffers, hist: History, ctx, direct_light, row_offset=0,
):
    """DirectRayGen.hlsl:14-65. Returns (4, N) accumulation.

    `direct_light` is the already-traced ComputeLightsRandom result:
    render_frame batches the DI shadow rays with the transparent
    light's into one kernel launch (lighting.trace_plans) and finishes
    each plan separately."""
    n = g.instance.shape[0]
    no_hit = g.instance < 0

    # DI reprojection is compiled out in the reference
    # (DI_REPROJECTION_SUPPORT undefined, rt64_view.cpp:1012-1016), so
    # the history gather is statically elided too — gp.di_reproject is
    # hardwired False (view.py) and the masked gather still cost ~1.8
    # ms/frame at 512x368 before this skip.
    new_direct = jnp.zeros((3, n))
    hist_len = jnp.zeros((n,))

    res = direct_light + ctx.self_light

    # Eye light (DirectRayGen.hlsl:53-58) — keeps the reference's
    # non-normalized per-pixel ray direction.
    lambert = jnp.maximum(vm.dot(g.normal, -g.view_dir), 0.0)
    reflected = vm.reflect(g.view_dir, g.normal)
    sdot = jnp.clip(vm.dot(reflected, -g.view_dir), 0.0, 1.0)
    spec_f = g.specular * jnp.power(sdot, ctx.spec_exp)[None]
    res = (
        res
        + vm.splat(gp.eye_light_diffuse, res) * lambert[None]
        + vm.splat(gp.eye_light_specular, res) * spec_f
    )

    hist_len = jnp.minimum(hist_len + 1.0, 64.0)
    new_direct = new_direct + (res - new_direct) / hist_len[None]
    out = jnp.concatenate([new_direct, hist_len[None]], 0)
    miss = jnp.concatenate([jnp.ones((3, n)), jnp.zeros((1, n))], 0)
    return jnp.where(no_hit[None], miss, out)


def _simple_resolve_fold(
    sb, tri_rows, trace_scene, origins, dirs, t_min, t_max, k_alpha,
    noise_rand, cfg, regroup=None,
):
    """Fused trace+shade+resolve for secondary rays
    (IndirectRayGen.hlsl:95-117): accumulate color front-to-back,
    remember the last contributing hit."""
    def make_carry(origins, dirs, aux):
        m = dirs.shape[1]
        return (
            jnp.ones((m,)), jnp.zeros((3, m)), jnp.zeros((3, m)),
            jnp.zeros((3, m)), jnp.zeros((3, m)),
            jnp.zeros((m,), jnp.int32), jnp.full((m,), -1, jnp.int32),
        )

    def slot_body(carry, sh, t_s, origins, dirs, aux):
        res_a, res_rgb, res_pos, res_nrm, res_spec, res_tri, res_inst = carry
        inst = sh.instance
        valid = inst >= 0
        ha = sh.color[3]
        alpha_contrib = res_a * ha
        live = valid & (alpha_contrib >= EPSILON) & (res_a > EPSILON)
        hit_pos = origins + dirs * t_s[None]
        grow = sh.rows_t
        spec = grow[R.T_MAT + R.M_SPECULAR : R.T_MAT + R.M_SPECULAR + 3] * sh.specular
        res_rgb = res_rgb + jnp.where(
            live[None], sh.color[:3] * alpha_contrib[None], 0.0
        )
        res_a = jnp.where(live, res_a * (1.0 - ha), res_a)
        res_pos = jnp.where(live[None], hit_pos, res_pos)
        res_nrm = jnp.where(live[None], sh.normal, res_nrm)
        res_spec = jnp.where(live[None], spec, res_spec)
        res_tri = jnp.where(live, sh.tri, res_tri)
        res_inst = jnp.where(live, inst, res_inst)
        return res_a, res_rgb, res_pos, res_nrm, res_spec, res_tri, res_inst

    ((res_a, res_rgb, res_pos, res_nrm, res_spec, res_tri, res_inst),
     dropped) = _fold_shaded_slots(
        sb, tri_rows, trace_scene, origins, dirs, t_min, t_max,
        k_alpha, noise_rand, cfg, make_carry, slot_body, regroup=regroup,
    )
    res_row = _row_of(tri_rows, res_tri, res_inst >= 0)
    return (res_rgb, res_a, res_pos, res_nrm, res_spec, res_inst, res_row,
            dropped)


def _background_env(sb, bg_planes, ray_dir):
    """SampleBackgroundAsEnvMap for bounce-miss rays, statically
    elided when the scene has no raster background: bg_planes is then
    the black base and the per-ray env gather returns zeros — at 4K
    internal it profiled 171 ms/frame of zero-gathering (config 5)."""
    if sb.features.has_raster_bg:
        return sky.sample_background_env(bg_planes, ray_dir)
    return jnp.zeros((3, ray_dir.shape[1]))


def indirect_pass(
    sb, tri_rows, trace_scene, cfg, gp, g: GBuffers, hist: History,
    pix, bn_table, noise_rand, bg_planes, row_offset=0,
):
    """IndirectRayGen.hlsl:31-137: 1-bounce blue-noise diffuse GI."""
    n = g.instance.shape[0]
    ambient3 = gp.ambient_base + gp.ambient_no_gi
    if cfg.gi_samples <= 0:
        base = jnp.broadcast_to(ambient3[:, None], (3, n))
        return jnp.concatenate([base, jnp.zeros((1, n))], 0), jnp.int32(0)

    ambient = vm.splat(ambient3, g.normal) * jnp.ones((3, n))
    active = g.instance >= 0
    origin = g.position
    normal = g.normal

    prev_rgb, prev_len = _reproject(
        hist.indirect, hist.depth, hist.normal, g.depth, normal, g.flow, cfg,
        row_offset,
    )
    new_indirect = jnp.where(gp.gi_reproject, prev_rgb, jnp.zeros((3, n)))
    hist_len = jnp.where(gp.gi_reproject, prev_len, jnp.zeros((n,)))

    blue_noise_mult = 64 // cfg.gi_samples
    t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
    # Sky pixels trace nothing: empty interval lets ray blocks skip.
    t_max = jnp.where(active, tracer.RAY_MAX_DISTANCE, -1.0)

    def gi_body(carry, s):
        new_indirect, hist_len, dropped = carry
        bn = bluenoise.get_blue_noise(
            bn_table, pix, gp.frame_count + s * blue_noise_mult
        )
        ray_dir = _cos_hemisphere(bn[..., 0], bn[..., 1], normal)
        (res_rgb, res_a, res_pos, res_nrm, res_spec, res_inst, res_row,
         gi_drop) = _simple_resolve_fold(
            sb, tri_rows, trace_scene, origin, ray_dir, t_min, t_max,
            cfg.k_secondary, noise_rand, cfg, regroup="dir",
        )

        bg = _background_env(sb, bg_planes, ray_dir)
        sky_c = sky.sample_sky_plane(
            sb.quad_pool, sb.quad_records,
            jnp.broadcast_to(gp.sky_plane_rec, (n,)), ray_dir,
            gp.sky_yaw_offset, gp.sky_diffuse_mult, gp.sky_hsl_mod,
        )
        bg = bg * (1.0 - sky_c[3])[None] + sky_c[:3] * sky_c[3][None]

        # 1-light direct estimate at the bounce (IndirectRayGen.hlsl:121-127).
        ctx = lighting.ctx_from_rows(res_row, res_inst >= 0)
        direct_b, db_drop = lighting.compute_lights_random(
            sb, tri_rows, trace_scene, pix, bn_table, gp.frame_count,
            ray_dir, res_pos, res_nrm, res_spec, ctx,
            max_light_count=1, di_samples=cfg.di_samples, check_shadows=True,
            noise_rand=noise_rand, shadow_k_alpha=cfg.k_shadow,
            opaque_fn=_shadow_fn(cfg, regroup="origin"),
            alpha_compact=max(1024, (res_pos.shape[1] // 32) * cfg.alpha_shade_boost),
            shade_boost=cfg.alpha_shade_boost,
        )
        bounce = (
            res_rgb * (1.0 - res_a)[None]
            * (ambient + direct_b + ctx.self_light)
            * gp.gi_diffuse_strength
        )
        res_ind = ambient + jnp.where((res_inst >= 0)[None], bounce, 0.0)
        res_ind = res_ind + bg * gp.gi_sky_strength * res_a[None]

        hist_len2 = jnp.minimum(hist_len + 1.0, 64.0)
        new_indirect2 = new_indirect + (res_ind - new_indirect) / hist_len2[None]
        return (new_indirect2, hist_len2, dropped + gi_drop + db_drop), None

    # Unrolled GI rounds (see compute_lights_random on scan fences).
    carry = (new_indirect, hist_len, jnp.int32(0))
    for s in range(cfg.gi_samples, 0, -1):
        carry, _ = gi_body(carry, jnp.int32(s))
    new_indirect, hist_len, gi_dropped = carry
    out = jnp.concatenate([new_indirect, hist_len[None]], 0)
    fallback = jnp.concatenate(
        [jnp.broadcast_to(ambient3[:, None], (3, n)), jnp.zeros((1, n))], 0
    )
    return jnp.where(active[None], out, fallback), gi_dropped


def _cos_hemisphere(r1, r2, normal):
    """getCosHemisphereSampleBlueNoise (IndirectRayGen.hlsl:17-29), planar."""
    a = jnp.abs(normal)
    xm = ((a[0] - a[1]) < 0) & ((a[0] - a[2]) < 0)
    ym = ((a[1] - a[2]) < 0) & ~xm
    zm = ~(xm | ym)
    basis = jnp.stack(
        [xm.astype(normal.dtype), ym.astype(normal.dtype), zm.astype(normal.dtype)],
        0,
    )
    bitangent = vm.cross(normal, basis)
    tangent = vm.cross(bitangent, normal)
    r = jnp.sqrt(r1)
    phi = 2.0 * jnp.pi * r2
    return (
        tangent * (r * jnp.cos(phi))[None]
        + bitangent * (r * jnp.sin(phi))[None]
        + normal * jnp.sqrt(jnp.maximum(0.0, 1.0 - r1))[None]
    )


def _lit_secondary_fold(
    sb, gp, cfg, tri_rows, trace_scene, origins, dirs, t_min, t_max,
    noise_rand, fog_mode, store_any,
):
    """Fused trace+shade+resolve for reflection/refraction rays with the
    fog + lighting split (ReflectionRayGen.hlsl:68-126,
    RefractionRayGen.hlsl:63-110)."""
    def make_carry(origins, dirs, aux):
        m = dirs.shape[1]
        return (
            jnp.ones((m,)), jnp.zeros((3, m)), jnp.zeros((3, m)),
            jnp.zeros((3, m)), jnp.zeros((3, m)), jnp.zeros((3, m)),
            jnp.zeros((m,), jnp.int32), jnp.full((m,), -1, jnp.int32),
        )

    def slot_body(carry, sh, t_s, origins, dirs, aux):
        (res_a, res_rgb, res_transparent, res_pos, res_nrm, res_spec,
         res_tri, res_inst) = carry
        ambient = vm.splat(gp.ambient_base + gp.ambient_no_gi, dirs)
        grow = sh.rows_t
        mat = lambda off: grow[R.T_MAT + off]
        flags = grow[R.T_FLAGS].astype(jnp.int32)
        inst = sh.instance
        valid = inst >= 0
        ha = sh.color[3]
        alpha_contrib = res_a * ha
        live = valid & (alpha_contrib >= EPSILON) & (res_a > EPSILON)
        hit_pos = origins + dirs * t_s[None]
        if fog_mode == "camera":
            fa = fog.fog_alpha_from_camera(
                hit_pos, gp.view, gp.projection, mat(R.M_FOG_MUL),
                mat(R.M_FOG_OFFSET),
            )
        else:
            fa = fog.fog_alpha_from_origin(
                hit_pos, origins, mat(R.M_FOG_MUL), mat(R.M_FOG_OFFSET)
            )
        fa = jnp.where(mat(R.M_FOG_ENABLED) > 0.0, fa, 0.0)
        fog_rgb = grow[R.T_MAT + R.M_FOG_COLOR : R.T_MAT + R.M_FOG_COLOR + 3]
        res_transparent = res_transparent + jnp.where(
            live[None], fog_rgb * (fa * alpha_contrib)[None], 0.0
        )
        alpha_contrib = alpha_contrib * (1.0 - fa)
        color_add = sh.color[:3] * alpha_contrib[None]
        uses_l = ((flags & R.F_HAS_LIGHTING) != 0) & valid
        lit = live & uses_l
        self_l = grow[R.T_MAT + R.M_SELF_LIGHT : R.T_MAT + R.M_SELF_LIGHT + 3]
        res_rgb = res_rgb + jnp.where(lit[None], color_add, 0.0)
        res_transparent = res_transparent + jnp.where(
            (live & ~uses_l)[None], color_add * (ambient + self_l), 0.0
        )
        spec = grow[R.T_MAT + R.M_SPECULAR : R.T_MAT + R.M_SPECULAR + 3] * sh.specular
        # Refraction stores only lit hits (RefractionRayGen.hlsl:84-93);
        # reflection stores any live hit (ReflectionRayGen.hlsl:114-118).
        store = live if store_any else lit
        res_pos = jnp.where(store[None], hit_pos, res_pos)
        res_nrm = jnp.where(store[None], sh.normal, res_nrm)
        res_spec = jnp.where(store[None], spec, res_spec)
        res_tri = jnp.where(store, sh.tri, res_tri)
        res_inst = jnp.where(store, inst, res_inst)
        res_a = jnp.where(live, res_a * (1.0 - ha), res_a)
        return (res_a, res_rgb, res_transparent, res_pos, res_nrm, res_spec,
                res_tri, res_inst)

    ((res_a, res_rgb, res_transparent, res_pos, res_nrm, res_spec, res_tri,
      res_inst), dropped) = _fold_shaded_slots(
        sb, tri_rows, trace_scene, origins, dirs, t_min, t_max,
        cfg.k_secondary, noise_rand, cfg, make_carry, slot_body,
    )
    res_row = _row_of(tri_rows, res_tri, res_inst >= 0)
    return (res_rgb, res_a, res_pos, res_nrm, res_spec, res_inst, res_row,
            res_transparent, dropped)


def refraction_pass(
    sb, tri_rows, trace_scene, cfg, gp, g: GBuffers, pix, bn_table,
    noise_rand, bg_planes, bg_color,
):
    """RefractionRayGen.hlsl:17-117. Returns ((3, N), dropped).

    bg_color is the (3, N) screen-space background+sky fallback the
    refracted miss reads (RefractionRayGen.hlsl:30-36) — the same
    fixed-grid sample render_frame computed for the primary pass.

    Scenes without refractive materials skip this pass statically
    (cfg.refraction_enabled); within an enabled scene, pixels that
    seeded no refraction ride as dead rays (empty trace intervals) — a
    runtime lax.cond fence costs more than the masked work."""
    return _refraction_impl(
        sb, tri_rows, trace_scene, cfg, gp, g, pix, bn_table,
        noise_rand, bg_planes, bg_color,
    )


def _refraction_impl(
    sb, tri_rows, trace_scene, cfg, gp, g: GBuffers, pix, bn_table,
    noise_rand, bg_planes, bg_color,
):
    n = g.instance.shape[0]
    active = (g.instance >= 0) & (g.refr_alpha > EPSILON)
    eta = g.row[R.CTX_REFRACTION]
    ray_dir = _refract(g.view_dir, g.normal, eta)

    bg = bg_color

    t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
    t_max = jnp.where(active, tracer.RAY_MAX_DISTANCE, -1.0)
    (rgb, res_a, pos, nrm, spec, inst, row, transparent,
     fold_drop) = _lit_secondary_fold(
        sb, gp, cfg, tri_rows, trace_scene, g.position, ray_dir, t_min, t_max,
        noise_rand, fog_mode="camera", store_any=False,
    )
    ctx = lighting.ctx_from_rows(row, inst >= 0)
    direct, li_drop = lighting.compute_lights_random(
        sb, tri_rows, trace_scene, pix, bn_table, gp.frame_count,
        ray_dir, pos, nrm, spec, ctx,
        max_light_count=1, di_samples=cfg.di_samples, check_shadows=True,
        noise_rand=noise_rand, shadow_k_alpha=cfg.k_shadow,
        opaque_fn=_shadow_fn(cfg),
        alpha_compact=max(1024, (pos.shape[1] // 32) * cfg.alpha_shade_boost),
        shade_boost=cfg.alpha_shade_boost,
    )
    ambient = vm.splat(gp.ambient_base + gp.ambient_no_gi, rgb)
    rgb = jnp.where((inst >= 0)[None], rgb * (ambient + direct + ctx.self_light), rgb)
    rgb = rgb + bg * res_a[None] + transparent
    return (jnp.where(active[None], rgb * g.refr_alpha[None], 0.0),
            fold_drop + li_drop)


def _refract(d, n, eta):
    """HLSL refract(i, n, eta) with non-normalized i (bug-compatible)."""
    ndi = vm.dot(n, d)
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    out = d * eta[None] - n * (eta * ndi + jnp.sqrt(jnp.maximum(k, 0.0)))[None]
    return jnp.where((k >= 0.0)[None], out, 0.0)


def reflection_pass(
    sb, tri_rows, trace_scene, cfg, gp, g: GBuffers, refl_state,
    pix, bn_table, noise_rand, bg_planes,
):
    """One ReflectionRayGen iteration (ReflectionRayGen.hlsl:25-143).

    refl_state = (rgb, alpha, position, view_dir, normal, inst, row);
    the pass mutates the shading state in place for the next bounce
    (ReflectionRayGen.hlsl:117-124), looped max_reflections times
    (rt64_view.cpp:1417-1436).
    """
    return _reflection_impl(
        sb, tri_rows, trace_scene, cfg, gp, g, refl_state, pix, bn_table,
        noise_rand, bg_planes,
    )


def _reflection_impl(
    sb, tri_rows, trace_scene, cfg, gp, g, refl_state, pix, bn_table,
    noise_rand, bg_planes,
):
    refl_rgb, refl_a, sh_pos, view_dir, sh_nrm, inst_id, sh_row = refl_state
    n = inst_id.shape[0]
    active = (inst_id >= 0) & (refl_a > EPSILON)
    ray_dir = vm.reflect(view_dir, sh_nrm)

    bg = _background_env(sb, bg_planes, ray_dir)
    sky_c = sky.sample_sky_plane(
        sb.quad_pool, sb.quad_records,
        jnp.broadcast_to(gp.sky_plane_rec, (n,)), ray_dir,
        gp.sky_yaw_offset, gp.sky_diffuse_mult, gp.sky_hsl_mod,
    )
    bg = bg * (1.0 - sky_c[3])[None] + sky_c[:3] * sky_c[3][None]

    t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
    t_max = jnp.where(active, tracer.RAY_MAX_DISTANCE, -1.0)

    ambient = vm.splat(gp.ambient_base + gp.ambient_no_gi, ray_dir)
    # Bug-compatible: the fresnel multiplier reads the *primary* pixel's
    # material (ReflectionRayGen.hlsl:100). Both it and the incoming
    # reflection weight are per-pixel, so they ride the fold's aux
    # gather into compacted space.
    primary_fresnel = sh_row[R.CTX_REFL_FRESNEL]

    def make_carry(origins, dirs, aux):
        m = dirs.shape[1]
        return (
            jnp.ones((m,)), jnp.zeros((3, m)), jnp.zeros((3, m)),
            jnp.zeros((3, m)), jnp.zeros((3, m)), jnp.zeros((3, m)),
            jnp.zeros((m,), jnp.int32), jnp.full((m,), -1, jnp.int32),
            jnp.zeros((m,)),
        )

    def slot_body(carry, sh, t_s, origins, dirs, aux):
        (res_a, res_rgb, res_transparent, res_pos, res_nrm, res_spec,
         res_tri, res_inst, new_refl_a) = carry
        refl_a, primary_fresnel = aux
        ambient = vm.splat(gp.ambient_base + gp.ambient_no_gi, dirs)
        grow = sh.rows_t
        mat = lambda off: grow[R.T_MAT + off]
        flags = grow[R.T_FLAGS].astype(jnp.int32)
        inst = sh.instance
        valid = inst >= 0
        ha = sh.color[3]
        alpha_contrib = res_a * ha
        live = valid & (alpha_contrib >= EPSILON) & (res_a > EPSILON)
        hit_pos = origins + dirs * t_s[None]
        fa = jnp.where(
            mat(R.M_FOG_ENABLED) > 0.0,
            fog.fog_alpha_from_origin(
                hit_pos, origins, mat(R.M_FOG_MUL), mat(R.M_FOG_OFFSET)
            ),
            0.0,
        )
        fog_rgb = grow[R.T_MAT + R.M_FOG_COLOR : R.T_MAT + R.M_FOG_COLOR + 3]
        res_transparent = res_transparent + jnp.where(
            live[None], fog_rgb * (fa * alpha_contrib)[None], 0.0
        )
        alpha_contrib = alpha_contrib * (1.0 - fa)

        hit_refl = mat(R.M_REFLECTION)
        has_refl = live & (hit_refl > EPSILON)
        fres = _fresnel(sh.normal, dirs, hit_refl, primary_fresnel)
        new_refl_a = new_refl_a + jnp.where(
            has_refl, fres * alpha_contrib * refl_a, 0.0
        )

        color_add = sh.color[:3] * alpha_contrib[None]
        uses_l = ((flags & R.F_HAS_LIGHTING) != 0) & valid
        lit = live & uses_l
        self_l = grow[R.T_MAT + R.M_SELF_LIGHT : R.T_MAT + R.M_SELF_LIGHT + 3]
        res_rgb = res_rgb + jnp.where(lit[None], color_add, 0.0)
        res_transparent = res_transparent + jnp.where(
            (live & ~uses_l)[None], color_add * (ambient + self_l), 0.0
        )
        spec = grow[R.T_MAT + R.M_SPECULAR : R.T_MAT + R.M_SPECULAR + 3] * sh.specular
        res_pos = jnp.where(live[None], hit_pos, res_pos)
        res_nrm = jnp.where(live[None], sh.normal, res_nrm)
        res_spec = jnp.where(live[None], spec, res_spec)
        res_tri = jnp.where(live, sh.tri, res_tri)
        res_inst = jnp.where(live, inst, res_inst)
        res_a = jnp.where(live, res_a * (1.0 - ha), res_a)
        return (res_a, res_rgb, res_transparent, res_pos, res_nrm, res_spec,
                res_tri, res_inst, new_refl_a)

    ((res_a, res_rgb, res_transparent, res_pos, res_nrm, res_spec, res_tri,
      res_inst, new_refl_a), refl_dropped) = _fold_shaded_slots(
        sb, tri_rows, trace_scene, sh_pos, ray_dir, t_min, t_max,
        cfg.k_secondary, noise_rand, cfg, make_carry, slot_body,
        aux=(refl_a, primary_fresnel),
    )

    res_row = _row_of(tri_rows, res_tri, res_inst >= 0)
    # Lighting at the final hit (checkShadows=false,
    # ReflectionRayGen.hlsl:125-132) + shading-buffer writeback.
    ctx = lighting.ctx_from_rows(res_row, res_inst >= 0)
    direct, li_drop = lighting.compute_lights_random(
        sb, tri_rows, trace_scene, pix, bn_table, gp.frame_count,
        ray_dir, res_pos, res_nrm, res_spec, ctx,
        max_light_count=1, di_samples=cfg.di_samples, check_shadows=False,
        noise_rand=noise_rand, shadow_k_alpha=cfg.k_shadow,
    )
    got = res_inst >= 0
    res_rgb = jnp.where(
        got[None], res_rgb * (ambient + direct + ctx.self_light), res_rgb
    )
    upd = active & got
    sh_pos = jnp.where(upd[None], res_pos, sh_pos)
    view_dir = jnp.where(upd[None], ray_dir, view_dir)
    sh_nrm = jnp.where(upd[None], res_nrm, sh_nrm)
    inst_id = jnp.where(upd, res_inst, inst_id)
    sh_row = jnp.where(upd[None], res_row, sh_row)

    # Background blend + artificial shine (ReflectionRayGen.hlsl:134-143).
    res_rgb = res_rgb + bg * res_a[None] + res_transparent
    shine = sh_row[R.CTX_REFL_SHINE]
    highlight = vm.splat((1.0, 1.05, 1.2), res_rgb)
    shadow_c = vm.splat((0.1, 0.05, 0.0), res_rgb)
    up_amt = jnp.power(jnp.maximum(ray_dir[1], 0.0) * shine, 3.0)[None]
    dn_amt = jnp.power(jnp.maximum(-ray_dir[1], 0.0) * shine, 3.0)[None]
    res_rgb = res_rgb * (1.0 - up_amt) + highlight * up_amt
    res_rgb = res_rgb * (1.0 - dn_amt) + shadow_c * dn_amt

    add = res_rgb * refl_a[None] * jnp.clip(1.0 - new_refl_a, 0.0, 1.0)[None]
    refl_rgb = refl_rgb + jnp.where(active[None], add, 0.0)
    refl_a = jnp.where(active, jnp.clip(new_refl_a, 0.0, 1.0), refl_a)
    return ((refl_rgb, refl_a, sh_pos, view_dir, sh_nrm, inst_id, sh_row),
            refl_dropped + li_drop)


def render_frame(
    sb: sbuf.SceneBuffers,
    gp: GlobalParams,
    history: History,
    bn_table,
    # (3, H, W) host-provided background base plane. CONTRACT: consumed
    # only when the scene statically has raster-background triangles
    # (ShadeFeatures.has_raster_bg) — without them the whole background
    # machinery (raster composite, fixed-grid blend, bounce-miss env
    # fetch) is compiled out and a non-black host plane is ignored
    # (the reference's host always clears to black before the BG
    # instances draw, rt64_view.cpp:1292-1319).
    bg_planes,
    temporal=None,  # (3, DH, DW) temporal-upscaler history (FSR slot)
    cfg: RenderConfig = None,
    visualization_mode: int = 0,
    row_offset=0,
) -> FrameOutputs:
    """The full frame: View::render as one pure function."""
    h, w = cfg.rt_height, cfg.rt_width
    n = h * w

    tri_rows, rows_t = shade_ops.build_tri_rows(sb)
    trace_scene = make_trace_scene(sb, rows_t, cfg.alpha_cap)

    pix, origins, dirs = primary_rays(cfg, gp, row_offset)
    noise_rand = _noise_rand(cfg, gp, pix)

    # All blue-noise fetches in the frame read the regular pixel grid at
    # a uniform frame index, so replace the per-pixel gather with a
    # dynamic-sliced 64x64 tile repeated across the screen (see
    # bluenoise.grid_sampler). Downstream get_blue_noise calls hit the
    # callable fast path.
    if not callable(bn_table):
        swz = None
        if cfg.tiled:
            swz = lambda plane: jnp.stack(
                [_from_image_1(cfg, plane[..., c]) for c in range(3)],
                axis=-1,
            )
        bn_table = bluenoise.grid_sampler(
            bn_table, w, h, row_offset=row_offset, swizzle=swz
        )

    # Under row tiling the background plane arrives full-height
    # (replicated); take this shard's band.
    if bg_planes.shape[1] != h:
        bg_planes = jax.lax.dynamic_slice_in_dim(bg_planes, row_offset, h, axis=1)

    # Raster background pass (rt64_view.cpp:1292-1319): composited over
    # the host-provided plane; rays sample the result. Statically
    # elided with the rest of the background machinery when the scene
    # has no raster-background triangles (ShadeFeatures.has_raster_bg).
    if sb.features.has_raster_bg:
        bg_rgba = jnp.concatenate(
            [from_image(cfg, bg_planes), jnp.ones((1, n))], 0
        )
        bg_rgba = raster.rasterize(
            bg_rgba, sb.raster_bg, sb.raster_bg_count, sb.instance_rows,
            sb.quad_pool, sb.quad_records, w, h, noise_rand, pix=pix,
            row_offset=row_offset,
        )
        bg_planes = to_image(cfg, bg_rgba[:3])

    # Background + sky (PrimaryRayGen.hlsl:47-56). The sky-plane uv is
    # a function of the GLOBAL screen position (sv); the raster
    # background fetch addresses the band-local plane (sv_bg) — they
    # only coincide unsharded.
    # Fixed-grid background + sky (PrimaryRayGen.hlsl:47-56): both are
    # regular-grid resamples here — the bg fetch is a uniform jitter
    # shift of the band-local plane (pure elementwise) and the sky-plane
    # uv is affine in screen position, so it rides two banded matmuls
    # (ops/sky.sample_sky_2d_grid) instead of per-pixel pool gathers.
    if sb.features.has_raster_bg:
        bg_color = sky.sample_background_grid(
            bg_planes, gp.pixel_jitter[0], gp.pixel_jitter[1]
        )
    else:
        bg_color = jnp.zeros((3, n))
    if sb.sky_plane is not None:
        sky_c = sky.sample_sky_2d_grid(
            sb.sky_plane, gp.sky_plane_rec, gp.pixel_jitter, gp.view_i,
            jnp.asarray(
                [cfg.display_width, cfg.display_grid_height], jnp.float32
            ),
            gp.sky_yaw_offset, gp.sky_diffuse_mult, gp.sky_hsl_mod,
            w, h, cfg.grid_height, row_offset,
        )
        bg_color = (
            bg_color * (1.0 - sky_c[3])[None] + sky_c[:3] * sky_c[3][None]
        )

    t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
    t_max = jnp.full((n,), tracer.RAY_MAX_DISTANCE)
    g, tl_plan, trans_lit_sum = primary_pass(
        sb, gp, cfg, origins, dirs, t_min, t_max, bg_color,
        tri_rows, trace_scene, pix, bn_table, noise_rand,
    )

    # ONE batched shadow launch for the transparent light + all DI
    # rounds (PrimaryRayGen.hlsl:139-147 + DirectRayGen.hlsl:49-51):
    # one visit-list build, one occlusion kernel, one alpha
    # cull+compaction for (1 + max_lights) x di_samples ray sets.
    di_ctx = lighting.ctx_from_rows(g.row, g.instance >= 0)
    di_plan = lighting.plan_lights(
        sb, pix, bn_table, gp.frame_count, g.view_dir, g.position,
        g.normal, g.specular, di_ctx, max_light_count=cfg.max_lights,
        di_samples=cfg.di_samples, noise_rand=noise_rand,
    )
    plans = [di_plan] if tl_plan is None else [tl_plan, di_plan]
    factors, light_drop = lighting.trace_plans(
        plans, sb, tri_rows, trace_scene, cfg.k_shadow,
        opaque_fn=_shadow_fn(cfg),
        alpha_compact=max(1024, (n // 32) * cfg.alpha_shade_boost),
        shade_boost=cfg.alpha_shade_boost,
    )
    di_f = factors[-1]
    if tl_plan is not None:
        tl_light = lighting.finish_lights(tl_plan, factors[0])
        transparent = g.transparent + trans_lit_sum * tl_light
        g = g._replace(
            transparent=transparent,
            reactive=jnp.minimum(transparent.max(axis=0), 0.9),
        )

    alpha_dropped = g.alpha_dropped + light_drop
    direct_accum = direct_pass(
        cfg, gp, g, history, di_ctx, lighting.finish_lights(di_plan, di_f),
        row_offset,
    )
    indirect_accum, i_drop = indirect_pass(
        sb, tri_rows, trace_scene, cfg, gp, g, history, pix, bn_table,
        noise_rand, bg_planes, row_offset,
    )
    alpha_dropped = alpha_dropped + i_drop
    if cfg.refraction_enabled:
        refraction_rgb, r_drop = refraction_pass(
            sb, tri_rows, trace_scene, cfg, gp, g, pix, bn_table, noise_rand,
            bg_planes, bg_color,
        )
        alpha_dropped = alpha_dropped + r_drop
    else:
        refraction_rgb = jnp.zeros((3, n))
    refl_state = (
        jnp.zeros((3, n)), g.refl_alpha, g.position, g.view_dir, g.normal,
        g.instance, g.row,
    )
    # Unrolled bounce loop (rt64_view.cpp:1417-1436): each bounce
    # depends on the last, but straight-line code still lets XLA overlap
    # DMA prefetch across the boundary (a lax.scan cannot).
    for _ in range(cfg.max_reflections):
        refl_state, rf_drop = reflection_pass(
            sb, tri_rows, trace_scene, cfg, gp, g, refl_state, pix,
            bn_table, noise_rand, bg_planes,
        )
        alpha_dropped = alpha_dropped + rf_drop
    reflection_rgb = refl_state[0]

    # DI denoise is compiled out in the reference (rt64_view.cpp:1439-1443).
    filtered_direct = direct_accum[:3]
    if cfg.denoiser_enabled:
        fi = to_image(cfg, indirect_accum[:3])
        for _ in range(cfg.gi_filter_passes):
            fi = filters.gaussian_3x3(fi)
        filtered_indirect = from_image(cfg, fi)
    else:
        filtered_indirect = indirect_accum[:3]

    rt_rgb = to_image(cfg, filters.compose(
        g.diffuse_rgb, g.diffuse_a, filtered_direct, filtered_indirect,
        reflection_rgb, refraction_rgb, g.transparent,
    ))

    # Upscale to display resolution IN-FRAME — the reference's
    # production path renders at rtWidth x rtHeight and upscales before
    # postprocess (rt64_view.cpp:114-141, 1584-1618). Running the
    # upscaler inside the jitted frame keeps the temporal history
    # donated on-device with no host round-trip between render and
    # upscale.
    new_temporal = None
    scaling = (cfg.display_height, cfg.display_width) != (h, w)
    if scaling and cfg.upscaler in (d.UPSCALER_FSR, d.UPSCALER_AUTO):
        from rt64tpu.models import upscaler as ups

        temporal_in = (
            temporal if temporal is not None
            else jnp.zeros((3, cfg.display_height, cfg.display_width))
        )
        reset = (
            gp.temporal_reset if gp.temporal_reset is not None
            else jnp.bool_(temporal is None)
        )
        disp = ups.temporal_accumulate(
            temporal_in, rt_rgb, to_image(cfg, g.flow),
            to_image(cfg, g.reactive), to_image(cfg, g.lock), reset,
            cfg.display_height, cfg.display_width,
        )
        new_temporal = disp
    elif scaling and cfg.upscaler == d.UPSCALER_XESS:
        from rt64tpu.models import upscaler as ups

        temporal_in = (
            temporal if temporal is not None
            else jnp.zeros((4, cfg.display_height, cfg.display_width))
        )
        reset = (
            gp.temporal_reset if gp.temporal_reset is not None
            else jnp.bool_(temporal is None)
        )
        disp, new_temporal = ups.xess_accumulate(
            temporal_in, rt_rgb, to_image(cfg, g.depth),
            to_image(cfg, g.flow), to_image(cfg, g.reactive), reset,
            cfg.display_height, cfg.display_width,
        )
    elif scaling and cfg.upscaler == d.UPSCALER_DLSS:
        from rt64tpu.models import learned_upscaler as lus

        disp = lus._run(
            lus.get_params(), rt_rgb, to_image(cfg, g.depth),
            to_image(cfg, g.flow), to_image(cfg, g.reactive),
            cfg.display_height, cfg.display_width,
        )
    elif scaling:
        disp = filters.bilinear_resize(
            rt_rgb, cfg.display_height, cfg.display_width
        )
    else:
        disp = rt_rgb

    # RCAS sharpening of the upscaled output (the upscalerSharpness
    # consumer; see GlobalParams.upscaler_sharpness). Runs AFTER the
    # temporal history was captured — FSR2's RCAS is a display-side
    # pass; the accumulator feeds back unsharpened history. RCAS's
    # no-ringing lobe bound assumes display-range [0, 1] input (the
    # reference runs it post-tonemap too), so clip first — the present
    # pack applies the identical clip, so displayed content is
    # unchanged where the knob is 0.
    if cfg.sharpen_enabled and scaling and cfg.upscaler != d.UPSCALER_OFF:
        disp = filters.rcas(
            jnp.clip(disp, 0.0, 1.0),
            gp.upscaler_sharpness if gp.upscaler_sharpness is not None
            else jnp.float32(0.0),
        )

    if visualization_mode == 0:
        if (cfg.display_height, cfg.display_width) != (h, w):
            flow_disp = filters.bilinear_resize(
                to_image(cfg, g.flow), cfg.display_height, cfg.display_width
            )
        else:
            flow_disp = to_image(cfg, g.flow)
        if cfg.motion_blur_enabled:
            disp = filters.motion_blur(
                disp, flow_disp, (float(w), float(h)),
                gp.motion_blur_strength, cfg.motion_blur_samples,
            )
    else:
        disp = debug_visualization(
            visualization_mode, cfg, g, direct_accum, indirect_accum,
            filtered_direct, filtered_indirect, reflection_rgb, refraction_rgb,
        )

    # Raster foreground (HUD) over the final image
    # (rt64_view.cpp:1657-1661), at display resolution.
    dh, dw = disp.shape[1], disp.shape[2]
    disp_rgba = jnp.concatenate(
        [disp.reshape(3, dh * dw), jnp.ones((1, dh * dw))], 0
    )
    fg_noise = jnp.zeros((dh * dw,))
    disp_rgba = raster.rasterize(
        disp_rgba, sb.raster_fg, sb.raster_fg_count, sb.instance_rows,
        sb.quad_pool, sb.quad_records, dw, dh, fg_noise,
    )  # display image stays row-major; default grid is correct
    disp = disp_rgba[:3].reshape(3, dh, dw)

    new_history = History(
        normal=g.normal, depth=g.depth, direct=direct_accum,
        indirect=indirect_accum,
    )
    return FrameOutputs(
        image=disp,
        history=new_history,
        gbuffers=g,
        direct_accum=direct_accum,
        indirect_accum=indirect_accum,
        filtered_direct=filtered_direct,
        filtered_indirect=filtered_indirect,
        reflection=reflection_rgb,
        refraction=refraction_rgb,
        rt_output=rt_rgb,
        alpha_dropped=alpha_dropped,
        temporal=new_temporal,
    )


def debug_visualization(
    mode: int, cfg, g: GBuffers, direct_accum, indirect_accum,
    filtered_direct, filtered_indirect, reflection, refraction,
):
    """DebugPS.hlsl visualization modes (17 total)."""
    h, w = cfg.rt_height, cfg.rt_width

    def img3(x):
        return to_image(cfg, x)

    def img1(x):
        return jnp.broadcast_to(to_image(cfg, x[None]), (3, h, w))

    if mode == 1:
        out = img3(g.position)
    elif mode == 2:
        out = img3((g.normal + 1.0) / 2.0)
    elif mode == 3:
        out = img3(g.specular)
    elif mode == 4:
        out = img3(g.diffuse_rgb)
    elif mode == 5:
        seed = rnd.init_rand(
            jnp.maximum(g.instance, 0).astype(jnp.uint32), jnp.uint32(0)
        )
        seed, r = rnd.next_rand(seed)
        seed, gg = rnd.next_rand(seed)
        seed, b = rnd.next_rand(seed)
        col = jnp.stack([r, gg, b], 0) * (g.instance >= 0)[None]
        out = img3(col)
    elif mode == 6:
        out = img3(direct_accum[:3])
    elif mode == 7:
        out = img3(filtered_direct)
    elif mode == 8:
        out = img3(indirect_accum[:3])
    elif mode == 9:
        out = img3(filtered_indirect)
    elif mode == 10:
        out = img3(reflection)
    elif mode == 11:
        out = img3(refraction)
    elif mode == 12:
        out = img3(g.transparent)
    elif mode == 13:
        out = _flow_visualization(cfg, to_image(cfg, g.flow))
    elif mode == 14:
        out = img1(g.reactive)
    elif mode == 15:
        out = img1(g.lock)
    elif mode == 16:
        out = img1(g.depth)
    else:
        out = jnp.full((3, h, w), 0.5)
    if out.shape[1:] != (cfg.display_height, cfg.display_width):
        out = filters.bilinear_resize(out, cfg.display_height, cfg.display_width)
    return out


def _flow_visualization(cfg, flow):
    """Motion-vector line drawing (DebugPS.hlsl:15-46)."""
    h, w = cfg.rt_height, cfg.rt_width
    block = 32.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    cx = jnp.floor(xx / block) * block + block * 0.5
    cy = jnp.floor(yy / block) * block + block * 0.5
    cxi = jnp.clip(cx.astype(jnp.int32), 0, w - 1)
    cyi = jnp.clip(cy.astype(jnp.int32), 0, h - 1)
    flat = (
        jnp.broadcast_to(cyi, (h, w)) * w + jnp.broadcast_to(cxi, (h, w))
    ).reshape(-1)
    fx = flow[0].reshape(-1)[flat].reshape(h, w)
    fy = flow[1].reshape(-1)[flat].reshape(h, w)
    px = cx + fx
    py = cy + fy
    dx = px - cx
    dy = py - cy
    l2 = dx * dx + dy * dy
    t = jnp.clip(((xx - cx) * dx + (yy - cy) * dy) / jnp.maximum(l2, 1e-12), 0.0, 1.0)
    qx = cx + t * dx
    qy = cy + t * dy
    dist = jnp.sqrt((xx - qx) ** 2 + (yy - qy) ** 2)
    dist = jnp.where(l2 > 0.0, dist, jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2))
    on = (dist < 1.0).astype(jnp.float32)
    return jnp.broadcast_to(on[None], (3, h, w))
