"""The frame graph: one jitted program per frame.

Reimplements View::render's pass DAG (rt64_view.cpp:1180-1667) as pure
functions over HBM-resident arrays:

    primary -> direct -> indirect -> refraction -> reflection loop
            -> DI/GI filter -> compose -> upscale -> post-process

plus the temporal history swap (the rtSwap double-buffer flip,
rt64_view.cpp:1663-1667). Hand-placed UAV barriers disappear — XLA's
dataflow provides the ordering — and every pass fuses into one program.

Raygen math mirrors the five HLSL raygen shaders 1:1 (citations
inline). Loop bounds that shape the program (sample counts, hit slots,
reflection bounces) are static config; everything else is traced.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rt64tpu.ops import bluenoise, filters, fog, lighting, math3d, sky
from rt64tpu.ops import random as rnd
from rt64tpu.ops import shading as shade_ops
from rt64tpu.ops import tracer
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
    k_shadow: int = 2
    motion_blur_samples: int = 32  # rt64_view.cpp:53
    denoiser_enabled: bool = False
    gi_filter_passes: int = 5  # rt64_view.cpp:1512-1530
    upscaler: int = 0
    tri_chunk: int = 256
    alpha_cap: int = 256  # compacted alpha triangle list capacity


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
    sky_plane_tex_index: jax.Array  # int32
    frame_count: jax.Array  # uint32
    di_reproject: jax.Array  # bool
    gi_reproject: jax.Array  # bool
    binary_lock_mask: jax.Array  # bool
    visualization_mode: jax.Array  # int32


class History(NamedTuple):
    """Temporal state (prev buffers, rt64_view.h:99-110)."""

    normal: jax.Array  # (H, W, 3)
    depth: jax.Array  # (H, W)
    direct: jax.Array  # (H, W, 4) rgb + history length
    indirect: jax.Array  # (H, W, 4)

    @staticmethod
    def zeros(h: int, w: int) -> "History":
        return History(
            normal=jnp.zeros((h, w, 3), jnp.float32),
            depth=jnp.zeros((h, w), jnp.float32),
            direct=jnp.zeros((h, w, 4), jnp.float32),
            indirect=jnp.zeros((h, w, 4), jnp.float32),
        )


class GBuffers(NamedTuple):
    """Primary-pass outputs (GlobalBuffers.hlsli u0-u15)."""

    view_direction: jax.Array  # (N, 3)
    shading_position: jax.Array  # (N, 3)
    shading_normal: jax.Array  # (N, 3)
    shading_specular: jax.Array  # (N, 3)
    diffuse: jax.Array  # (N, 4)
    instance_id: jax.Array  # (N,)
    transparent: jax.Array  # (N, 3)
    flow: jax.Array  # (N, 2) screen-pixel motion
    reactive_mask: jax.Array  # (N,)
    lock_mask: jax.Array  # (N,)
    depth: jax.Array  # (N,)
    reflection_alpha: jax.Array  # (N,)
    refraction_alpha: jax.Array  # (N,)


def make_trace_scene(
    sb: sbuf.SceneBuffers, world: shade_ops.WorldGeometry, alpha_cap: int = 256
) -> tracer.TraceScene:
    """Build the tracer's triangle-soup view of the frame."""
    v0, v1, v2 = (
        world.world_pos[sb.tri_idx[:, 0]],
        world.world_pos[sb.tri_idx[:, 1]],
        world.world_pos[sb.tri_idx[:, 2]],
    )
    inst = sb.tri_instance
    alpha = (sb.mat_i[inst, sbuf.II_ALPHA_CLASS] == 1) & sb.tri_valid
    no_cull = sb.mat_i[inst, sbuf.II_NO_CULL] == 1
    bias = sb.mat_f[inst, sbuf.MAT_DEPTH_BIAS]
    return tracer.make_trace_scene_arrays(
        v0, v1, v2, sb.tri_valid, alpha, no_cull, bias, alpha_cap
    )


def build_world(sb: sbuf.SceneBuffers) -> shade_ops.WorldGeometry:
    """Per-frame vertex transform — the TLAS-rebuild/BLAS-refit analog."""
    from rt64tpu.ops.geometry import transform_vertices

    wp, wn = transform_vertices(
        sb.pos, sb.nrm, sb.transforms, sb.normal_mats, sb.vert_instance
    )
    return shade_ops.WorldGeometry(world_pos=wp, world_nrm=wn)


def _pixel_grid(cfg: RenderConfig):
    h, w = cfg.rt_height, cfg.rt_width
    xx = jnp.arange(w, dtype=jnp.int32)
    yy = jnp.arange(h, dtype=jnp.int32)
    px = jnp.broadcast_to(xx[None, :], (h, w)).reshape(-1)
    py = jnp.broadcast_to(yy[:, None], (h, w)).reshape(-1)
    return jnp.stack([px, py], axis=-1)  # (N, 2)


def primary_rays(cfg: RenderConfig, gp: GlobalParams):
    """Camera ray setup (PrimaryRayGen.hlsl:33-40): returns origin,
    non-normalized direction (the reference traces un-normalized), and
    the NDC-ish d for background lookups."""
    pix = _pixel_grid(cfg)
    dims = jnp.asarray([cfg.rt_width, cfg.rt_height], jnp.float32)
    d = ((pix.astype(jnp.float32) + 0.5 + gp.pixel_jitter) / dims) * 2.0 - 1.0
    target = math3d.transform_points_h(
        jnp.stack([d[:, 0], -d[:, 1], jnp.ones_like(d[:, 0])], axis=-1),
        gp.projection_i,
    )
    origin = gp.view_i[3, :3]
    direction = math3d.transform_dirs(target[:, :3], gp.view_i)
    return pix, origin, direction


def _noise_rand(cfg: RenderConfig, gp: GlobalParams, pix):
    """Per-pixel combiner-noise random (rt64_shader.cpp:513-516)."""
    flat = (pix[:, 0] + pix[:, 1] * cfg.rt_width).astype(jnp.uint32)
    seed = rnd.init_rand(flat, jnp.broadcast_to(gp.frame_count, flat.shape))
    _, val = rnd.next_rand(seed)
    return val


def _resolve_hits(
    sb, gp, cfg, shade: shade_ops.HitShade, t_all, origins, dirs,
    bg_color, world, trace_scene, pix, bn_table, noise_rand,
):
    """Front-to-back alpha resolve (PrimaryRayGen.hlsl:76-177).

    shade/t_all cover K+1 slots ordered near-to-far (alpha slots then
    the opaque hit). Returns the full primary g-buffer set.
    """
    n, k1 = t_all.shape
    inst = shade.instance
    inst_s = jnp.maximum(inst, 0)
    mat_f = sb.mat_f[inst_s]  # (N, K1, MAT_WIDTH)
    uses_lighting = (sb.light_groups_inst[inst_s] > 0) & (inst >= 0)

    hit_alpha = shade.color[..., 3]
    hit_pos = origins[:, None, :] + dirs[:, None, :] * t_all[..., None]

    # Fog per hit (PrimaryRayGen.hlsl:108-113).
    fog_rgba = fog.fog_from_camera(
        hit_pos, gp.view, gp.projection,
        mat_f[..., sbuf.MAT_FOG_R : sbuf.MAT_FOG_R + 3],
        mat_f[..., sbuf.MAT_FOG_MUL], mat_f[..., sbuf.MAT_FOG_OFFSET],
    )
    fog_a = jnp.where(mat_f[..., sbuf.MAT_FOG_ENABLED] > 0.0, fog_rgba[..., 3], 0.0)

    refl_factor = mat_f[..., sbuf.MAT_REFLECTION]
    refr_factor = mat_f[..., sbuf.MAT_REFRACTION]
    fresnel_mult = mat_f[..., sbuf.MAT_REFLECTION_FRESNEL]
    self_light = mat_f[..., sbuf.MAT_SELF_LIGHT_R : sbuf.MAT_SELF_LIGHT_R + 3]
    lock = mat_f[..., sbuf.MAT_LOCK_MASK]

    ambient = gp.ambient_base + gp.ambient_no_gi

    # Sequential scan over the K+1 slots (static unroll; K is small).
    res_a = jnp.ones((n,), jnp.float32)
    res_rgb = jnp.zeros((n, 3), jnp.float32)
    res_transparent = jnp.zeros((n, 3), jnp.float32)
    trans_lit_sum = jnp.zeros((n, 3), jnp.float32)  # x resTransparentLight later
    lock_acc = jnp.zeros((n,), jnp.float32)
    refl_alpha = jnp.zeros((n,), jnp.float32)
    refr_alpha = jnp.zeros((n,), jnp.float32)
    stored = jnp.zeros((n,), bool)
    st_pos = jnp.zeros((n, 3), jnp.float32)
    st_nrm = -dirs
    st_spec = jnp.zeros((n, 3), jnp.float32)
    st_inst = jnp.full((n,), -1, jnp.int32)
    st_flow3 = jnp.zeros((n, 3), jnp.float32)
    st_t = jnp.zeros((n,), jnp.float32)
    tl_stored = jnp.zeros((n,), bool)  # transparent-light source chosen
    tl_pos = jnp.zeros((n, 3), jnp.float32)
    tl_nrm = jnp.zeros((n, 3), jnp.float32)
    tl_spec = jnp.zeros((n, 3), jnp.float32)
    tl_inst = jnp.full((n,), -1, jnp.int32)

    for hslot in range(k1):
        valid = inst[:, hslot] >= 0
        alpha_contrib = res_a * hit_alpha[:, hslot]
        live = valid & (alpha_contrib >= EPSILON) & (res_a > EPSILON)

        lock_acc = lock_acc + jnp.where(live, lock[:, hslot] * alpha_contrib, 0.0)

        uses_l = uses_lighting[:, hslot]
        apply_l = uses_l & (hit_alpha[:, hslot] > APPLY_LIGHTS_MINIMUM_ALPHA)

        # Fog folds into transparency (PrimaryRayGen.hlsl:109-113).
        fa = fog_a[:, hslot]
        fog_rgb = fog_rgba[:, hslot, :3]
        res_transparent = res_transparent + jnp.where(
            live[:, None], fog_rgb * (fa * alpha_contrib)[:, None], 0.0
        )
        alpha_contrib = alpha_contrib * (1.0 - fa)

        # Reflection seed (PrimaryRayGen.hlsl:116-127).
        has_refl = live & (refl_factor[:, hslot] > EPSILON)
        fresnel = _fresnel(
            shade.normal[:, hslot], dirs, refl_factor[:, hslot],
            fresnel_mult[:, hslot],
        )
        reflect_amount = fresnel * alpha_contrib
        refl_alpha = jnp.where(has_refl, reflect_amount, refl_alpha)
        lock_acc = lock_acc + jnp.where(has_refl, reflect_amount, 0.0)
        alpha_contrib = jnp.where(
            has_refl, alpha_contrib * (1.0 - fresnel), alpha_contrib
        )

        # Color accumulation (PrimaryRayGen.hlsl:129-152).
        color_add = shade.color[:, hslot, :3] * alpha_contrib[:, None]
        res_rgb = res_rgb + jnp.where((live & apply_l)[:, None], color_add, 0.0)
        trans_lit = live & uses_l & ~apply_l
        # Lazy single-light estimate shared by all such hits: remember
        # the first one (PrimaryRayGen.hlsl:139-147).
        take_tl = trans_lit & ~tl_stored
        tl_stored = tl_stored | take_tl
        tl_pos = jnp.where(take_tl[:, None], hit_pos[:, hslot], tl_pos)
        tl_nrm = jnp.where(take_tl[:, None], shade.normal[:, hslot], tl_nrm)
        tl_spec = jnp.where(
            take_tl[:, None],
            sb.mat_f[inst_s[:, hslot], sbuf.MAT_SPECULAR_R : sbuf.MAT_SPECULAR_R + 3]
            * shade.specular[:, hslot],
            tl_spec,
        )
        tl_inst = jnp.where(take_tl, inst[:, hslot], tl_inst)
        trans_lit_sum = trans_lit_sum + jnp.where(trans_lit[:, None], color_add, 0.0)
        res_transparent = res_transparent + jnp.where(
            trans_lit[:, None],
            color_add * (ambient + self_light[:, hslot]),
            0.0,
        )
        plain = live & ~uses_l
        res_transparent = res_transparent + jnp.where(
            plain[:, None], color_add * (ambient + self_light[:, hslot]), 0.0
        )

        new_res_a = res_a * (1.0 - hit_alpha[:, hslot])

        # Refraction seed terminates traversal (PrimaryRayGen.hlsl:156-161).
        has_refr = live & (refr_factor[:, hslot] > EPSILON)
        refr_alpha = jnp.where(has_refr, new_res_a, refr_alpha)
        new_res_a = jnp.where(has_refr, 0.0, new_res_a)
        res_a = jnp.where(live, new_res_a, res_a)

        # Primary-hit storage (PrimaryRayGen.hlsl:163-175): first hit
        # flagged by lighting/reflection/refraction.
        store_hit = live & (apply_l | has_refl | has_refr) & ~stored
        stored = stored | store_hit
        st_pos = jnp.where(store_hit[:, None], hit_pos[:, hslot], st_pos)
        st_nrm = jnp.where(store_hit[:, None], shade.normal[:, hslot], st_nrm)
        st_spec = jnp.where(
            store_hit[:, None],
            sb.mat_f[inst_s[:, hslot], sbuf.MAT_SPECULAR_R : sbuf.MAT_SPECULAR_R + 3]
            * shade.specular[:, hslot],
            st_spec,
        )
        st_inst = jnp.where(store_hit, inst[:, hslot], st_inst)
        st_flow3 = jnp.where(store_hit[:, None], shade.flow[:, hslot], st_flow3)
        st_t = jnp.where(store_hit, t_all[:, hslot], st_t)

    # Shared transparent light (1 light, checkShadows=true).
    tl_light = lighting.compute_lights_random(
        sb, world, trace_scene, pix, bn_table, gp.frame_count,
        dirs, tl_inst, tl_pos, tl_nrm, tl_spec,
        max_light_count=1, di_samples=cfg.di_samples, check_shadows=True,
        noise_rand=noise_rand, shadow_k_alpha=cfg.k_shadow,
    )
    res_transparent = res_transparent + trans_lit_sum * tl_light

    # Motion flow: stored hit or background (PrimaryRayGen.hlsl:52-56,164-170).
    res_px = jnp.asarray([cfg.rt_width, cfg.rt_height], jnp.float32)
    bg_position = origin_bg = origins + dirs * tracer.RAY_MAX_DISTANCE
    prev_bg = math3d.world_to_screen(gp.prev_view_proj, bg_position)
    cur_bg = math3d.world_to_screen(gp.view_proj, bg_position)
    flow_bg = (cur_bg - prev_bg) * res_px
    prev_pos = math3d.world_to_screen(gp.prev_view_proj, st_pos - st_flow3)
    cur_pos = math3d.world_to_screen(gp.view_proj, st_pos)
    flow_hit = (cur_pos - prev_pos) * res_px
    flow = jnp.where(stored[:, None], flow_hit, flow_bg)
    flow = jnp.stack([-flow[:, 0], flow[:, 1]], axis=-1)  # hlsl:194

    proj_pos = math3d.transform_points_h(st_pos, gp.view_proj)
    depth = jnp.where(stored, proj_pos[:, 2] / proj_pos[:, 3], 1.0)

    reactive = jnp.minimum(res_transparent.max(axis=-1), 0.9)
    lock_mask = jnp.where(
        gp.binary_lock_mask,
        (lock_acc > 0.5).astype(jnp.float32),
        jnp.minimum(lock_acc, 1.0),
    )

    # Background blend (PrimaryRayGen.hlsl:183-185).
    res_rgb = res_rgb + bg_color * res_a[:, None]
    diffuse = jnp.concatenate([res_rgb, (1.0 - res_a)[:, None]], axis=-1)

    return GBuffers(
        view_direction=dirs,
        shading_position=st_pos,
        shading_normal=st_nrm,
        shading_specular=st_spec,
        diffuse=diffuse,
        instance_id=st_inst,
        transparent=res_transparent,
        flow=flow,
        reactive_mask=reactive,
        lock_mask=lock_mask,
        depth=depth,
        reflection_alpha=refl_alpha,
        refraction_alpha=refr_alpha,
    )


def _fresnel(normal, incident, reflectivity, fresnel_multiplier):
    """FresnelReflectAmount (PrimaryRayGen.hlsl:26-30)."""
    d = jnp.sum(normal * incident, axis=-1)
    ret = jnp.power(jnp.clip(1.0 + d, EPSILON, 1.0), 5.0)
    return reflectivity + (1.0 - reflectivity) * ret * fresnel_multiplier


def _trace_and_shade(
    sb, world, trace_scene, origins, dirs, t_min, t_max, k_alpha,
    noise_rand, cfg, cull_backface=True,
):
    """Trace + shade + assemble ordered K+1 hit slots (alpha..., opaque)."""
    hits = tracer.trace(
        origins, dirs, t_min, t_max, trace_scene,
        k_alpha=k_alpha, cull_backface=cull_backface, chunk=cfg.tri_chunk,
    )
    tri_all = jnp.concatenate([hits.tri_a, hits.tri_op[:, None]], axis=1)
    uv_all = jnp.concatenate([hits.uv_a, hits.uv_op[:, None, :]], axis=1)
    t_all = jnp.concatenate([hits.t_a, hits.t_op[:, None]], axis=1)
    shade = shade_ops.shade_hits(
        sb, world, dirs[:, None, :], tri_all, uv_all, noise_rand[:, None]
    )
    return shade, t_all


def _simple_resolve(sb, shade, t_all, origins, dirs):
    """Secondary-ray resolve (IndirectRayGen.hlsl:95-117 and friends):
    accumulate color front-to-back, remember the last contributing hit."""
    n, k1 = t_all.shape
    inst = shade.instance
    res_a = jnp.ones((n,), jnp.float32)
    res_rgb = jnp.zeros((n, 3), jnp.float32)
    res_pos = jnp.zeros((n, 3), jnp.float32)
    res_nrm = jnp.zeros((n, 3), jnp.float32)
    res_spec = jnp.zeros((n, 3), jnp.float32)
    res_inst = jnp.full((n,), -1, jnp.int32)
    for hslot in range(k1):
        valid = inst[:, hslot] >= 0
        ha = shade.color[:, hslot, 3]
        alpha_contrib = res_a * ha
        live = valid & (alpha_contrib >= EPSILON) & (res_a > EPSILON)
        hit_pos = origins + dirs * t_all[:, hslot, None]
        spec = (
            sb.mat_f[jnp.maximum(inst[:, hslot], 0),
                     sbuf.MAT_SPECULAR_R : sbuf.MAT_SPECULAR_R + 3]
            * shade.specular[:, hslot]
        )
        res_rgb = res_rgb + jnp.where(
            live[:, None], shade.color[:, hslot, :3] * alpha_contrib[:, None], 0.0
        )
        res_a = jnp.where(live, res_a * (1.0 - ha), res_a)
        res_pos = jnp.where(live[:, None], hit_pos, res_pos)
        res_nrm = jnp.where(live[:, None], shade.normal[:, hslot], res_nrm)
        res_spec = jnp.where(live[:, None], spec, res_spec)
        res_inst = jnp.where(live, inst[:, hslot], res_inst)
    return res_rgb, res_a, res_pos, res_nrm, res_spec, res_inst


def _reproject(prev_buf, prev_depth, prev_normal, depth, normal, flow, cfg):
    """Temporal reprojection weights (DirectRayGen.hlsl:35-48).

    prev_buf: (H, W, 4); returns (prev_rgb (N,3), history_len (N,)).
    """
    h, w = cfg.rt_height, cfg.rt_width
    pix = _pixel_grid(cfg).astype(jnp.float32)
    prev_idx = jnp.floor(pix + 0.5 + flow).astype(jnp.int32)  # int2(x + .5 + flow)
    px = prev_idx[:, 0]
    py = prev_idx[:, 1]
    inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    p_depth = jnp.where(inb, prev_depth[pyc, pxc], 0.0)
    p_normal = jnp.where(inb[:, None], prev_normal[pyc, pxc], 0.0)
    p_accum = jnp.where(inb[:, None], prev_buf[pyc, pxc], 0.0)
    weight_depth = jnp.abs(depth - p_depth) / 0.01
    weight_normal = jnp.power(
        jnp.maximum(jnp.sum(p_normal * normal, axis=-1), 0.0), 128.0
    )
    history_weight = jnp.exp(-weight_depth) * weight_normal
    return p_accum[:, :3], p_accum[:, 3] * history_weight


def direct_pass(
    sb, world, trace_scene, cfg, gp, g: GBuffers, hist: History,
    pix, bn_table, noise_rand, dirs_view,
):
    """DirectRayGen.hlsl:14-65."""
    n = g.instance_id.shape[0]
    no_hit = g.instance_id < 0

    new_direct = jnp.zeros((n, 3), jnp.float32)
    hist_len = jnp.zeros((n,), jnp.float32)
    prev_rgb, prev_len = _reproject(
        hist.direct, hist.depth, hist.normal, g.depth, g.shading_normal,
        g.flow, cfg,
    )
    new_direct = jnp.where(gp.di_reproject, prev_rgb, new_direct)
    hist_len = jnp.where(gp.di_reproject, prev_len, hist_len)

    res = lighting.compute_lights_random(
        sb, world, trace_scene, pix, bn_table, gp.frame_count,
        dirs_view, g.instance_id, g.shading_position, g.shading_normal,
        g.shading_specular,
        max_light_count=cfg.max_lights, di_samples=cfg.di_samples,
        check_shadows=True, noise_rand=noise_rand, shadow_k_alpha=cfg.k_shadow,
    )
    inst_s = jnp.maximum(g.instance_id, 0)
    res = res + sb.mat_f[inst_s, sbuf.MAT_SELF_LIGHT_R : sbuf.MAT_SELF_LIGHT_R + 3]

    # Eye light (DirectRayGen.hlsl:53-58) — note the reference uses the
    # non-normalized per-pixel ray direction; we keep that behavior.
    spec_exp = sb.mat_f[inst_s, sbuf.MAT_SPECULAR_EXP]
    lambert = jnp.maximum(jnp.sum(g.shading_normal * -dirs_view, axis=-1), 0.0)
    reflected = dirs_view - 2.0 * jnp.sum(
        dirs_view * g.shading_normal, axis=-1, keepdims=True
    ) * g.shading_normal
    sdot = jnp.clip(jnp.sum(reflected * -dirs_view, axis=-1), 0.0, 1.0)
    spec_f = g.shading_specular * jnp.power(sdot, spec_exp)[:, None]
    res = res + gp.eye_light_diffuse * lambert[:, None] + gp.eye_light_specular * spec_f

    hist_len = jnp.minimum(hist_len + 1.0, 64.0)
    new_direct = new_direct + (res - new_direct) / hist_len[:, None]
    out = jnp.concatenate([new_direct, hist_len[:, None]], axis=-1)
    return jnp.where(no_hit[:, None], jnp.asarray([1.0, 1.0, 1.0, 0.0]), out)


def indirect_pass(
    sb, world, trace_scene, cfg, gp, g: GBuffers, hist: History,
    pix, bn_table, noise_rand, bg_image,
):
    """IndirectRayGen.hlsl:31-137: 1-bounce blue-noise diffuse GI."""
    n = g.instance_id.shape[0]
    ambient = gp.ambient_base + gp.ambient_no_gi
    if cfg.gi_samples <= 0:
        base = jnp.broadcast_to(ambient, (n, 3))
        return jnp.concatenate([base, jnp.zeros((n, 1))], axis=-1)

    active = g.instance_id >= 0
    origin = g.shading_position
    normal = g.shading_normal

    new_indirect = jnp.zeros((n, 3), jnp.float32)
    hist_len = jnp.zeros((n,), jnp.float32)
    prev_rgb, prev_len = _reproject(
        hist.indirect, hist.depth, hist.normal, g.depth, normal, g.flow, cfg
    )
    new_indirect = jnp.where(gp.gi_reproject, prev_rgb, new_indirect)
    hist_len = jnp.where(gp.gi_reproject, prev_len, hist_len)

    blue_noise_mult = 64 // cfg.gi_samples

    def gi_body(carry, s):
        new_indirect, hist_len = carry
        bn = bluenoise.get_blue_noise(
            bn_table, pix, gp.frame_count + s * blue_noise_mult
        )
        ray_dir = rnd.cos_hemisphere_sample(bn[:, :2], normal)
        t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
        t_max = jnp.full((n,), tracer.RAY_MAX_DISTANCE)
        shade, t_all = _trace_and_shade(
            sb, world, trace_scene, origin, ray_dir, t_min, t_max,
            cfg.k_secondary, noise_rand, cfg,
        )
        res_rgb, res_a, res_pos, res_nrm, res_spec, res_inst = _simple_resolve(
            sb, shade, t_all, origin, ray_dir
        )

        bg = sky.sample_background_env(bg_image, ray_dir)
        sky_c = sky.sample_sky_plane(
            sb.tex_pool, sb.tex_records, gp.sky_plane_tex_index, ray_dir,
            gp.sky_yaw_offset, gp.sky_diffuse_mult, gp.sky_hsl_mod,
        )
        bg = bg * (1.0 - sky_c[:, 3:4]) + sky_c[:, :3] * sky_c[:, 3:4]

        # 1-light direct estimate at the bounce (IndirectRayGen.hlsl:121-127).
        direct_b = lighting.compute_lights_random(
            sb, world, trace_scene, pix, bn_table, gp.frame_count,
            ray_dir, res_inst, res_pos, res_nrm, res_spec,
            max_light_count=1, di_samples=cfg.di_samples, check_shadows=True,
            noise_rand=noise_rand, shadow_k_alpha=cfg.k_shadow,
        )
        inst_s = jnp.maximum(res_inst, 0)
        self_l = sb.mat_f[inst_s, sbuf.MAT_SELF_LIGHT_R : sbuf.MAT_SELF_LIGHT_R + 3]
        bounce = (
            res_rgb * (1.0 - res_a)[:, None]
            * (ambient + direct_b + self_l)
            * gp.gi_diffuse_strength
        )
        res_ind = ambient + jnp.where((res_inst >= 0)[:, None], bounce, 0.0)
        res_ind = res_ind + bg * gp.gi_sky_strength * res_a[:, None]

        hist_len = jnp.minimum(hist_len + 1.0, 64.0)
        new_indirect = new_indirect + (res_ind - new_indirect) / hist_len[:, None]
        return (new_indirect, hist_len), None

    (new_indirect, hist_len), _ = jax.lax.scan(
        gi_body, (new_indirect, hist_len),
        jnp.arange(cfg.gi_samples, 0, -1, dtype=jnp.int32),
    )
    out = jnp.concatenate([new_indirect, hist_len[:, None]], axis=-1)
    fallback = jnp.concatenate(
        [jnp.broadcast_to(ambient, (n, 3)), jnp.zeros((n, 1))], axis=-1
    )
    return jnp.where(active[:, None], out, fallback)


def refraction_pass(
    sb, world, trace_scene, cfg, gp, g: GBuffers, pix, bn_table,
    noise_rand, bg_image, screen_uv,
):
    """RefractionRayGen.hlsl:17-117. Returns refraction rgb (N, 3)."""
    n = g.instance_id.shape[0]
    inst_s = jnp.maximum(g.instance_id, 0)
    active = (g.instance_id >= 0) & (g.refraction_alpha > EPSILON)
    eta = sb.mat_f[inst_s, sbuf.MAT_REFRACTION]
    ray_dir = _refract(g.view_direction, g.shading_normal, eta)

    bg = sky.sample_background_2d(bg_image, screen_uv)
    sky_c = sky.sample_sky_2d(
        sb.tex_pool, sb.tex_records, gp.sky_plane_tex_index, screen_uv,
        gp.view_i, jnp.asarray([cfg.display_width, cfg.display_height], jnp.float32),
        gp.sky_yaw_offset, gp.sky_diffuse_mult, gp.sky_hsl_mod,
    )
    bg = bg * (1.0 - sky_c[:, 3:4]) + sky_c[:, :3] * sky_c[:, 3:4]

    t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
    t_max = jnp.full((n,), tracer.RAY_MAX_DISTANCE)
    shade, t_all = _trace_and_shade(
        sb, world, trace_scene, g.shading_position, ray_dir, t_min, t_max,
        cfg.k_secondary, noise_rand, cfg,
    )
    rgb, res_a, pos, nrm, spec, inst, transparent = _lit_secondary_resolve(
        sb, gp, shade, t_all, g.shading_position, ray_dir, fog_mode="camera",
        view=gp.view, projection=gp.projection,
    )
    direct = lighting.compute_lights_random(
        sb, world, trace_scene, pix, bn_table, gp.frame_count,
        ray_dir, inst, pos, nrm, spec,
        max_light_count=1, di_samples=cfg.di_samples, check_shadows=True,
        noise_rand=noise_rand, shadow_k_alpha=cfg.k_shadow,
    )
    ambient = gp.ambient_base + gp.ambient_no_gi
    self_l = sb.mat_f[jnp.maximum(inst, 0), sbuf.MAT_SELF_LIGHT_R : sbuf.MAT_SELF_LIGHT_R + 3]
    rgb = jnp.where(
        (inst >= 0)[:, None], rgb * (ambient + direct + self_l), rgb
    )
    rgb = rgb + bg * res_a[:, None] + transparent
    return jnp.where(active[:, None], rgb * g.refraction_alpha[:, None], 0.0)


def _refract(d, n, eta):
    """HLSL refract(i, n, eta) with non-normalized i (bug-compatible)."""
    ndi = jnp.sum(n * d, axis=-1, keepdims=True)
    k = 1.0 - eta[:, None] ** 2 * (1.0 - ndi**2)
    out = eta[:, None] * d - (eta[:, None] * ndi + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k >= 0.0, out, 0.0)


def _lit_secondary_resolve(sb, gp, shade, t_all, origins, dirs, fog_mode, view, projection, store_any=False):
    """Reflection/refraction hit resolve with fog + lighting split
    (ReflectionRayGen.hlsl:68-126, RefractionRayGen.hlsl:63-110)."""
    n, k1 = t_all.shape
    inst = shade.instance
    inst_s = jnp.maximum(inst, 0)
    mat_f = sb.mat_f[inst_s]
    uses_lighting = (sb.light_groups_inst[inst_s] > 0) & (inst >= 0)
    ambient = gp.ambient_base + gp.ambient_no_gi
    self_light = mat_f[..., sbuf.MAT_SELF_LIGHT_R : sbuf.MAT_SELF_LIGHT_R + 3]

    hit_pos = origins[:, None, :] + dirs[:, None, :] * t_all[..., None]
    if fog_mode == "camera":
        fog_rgba = fog.fog_from_camera(
            hit_pos, view, projection,
            mat_f[..., sbuf.MAT_FOG_R : sbuf.MAT_FOG_R + 3],
            mat_f[..., sbuf.MAT_FOG_MUL], mat_f[..., sbuf.MAT_FOG_OFFSET],
        )
    else:
        fog_rgba = fog.fog_from_origin(
            hit_pos, origins[:, None, :],
            mat_f[..., sbuf.MAT_FOG_R : sbuf.MAT_FOG_R + 3],
            mat_f[..., sbuf.MAT_FOG_MUL], mat_f[..., sbuf.MAT_FOG_OFFSET],
        )
    fog_a = jnp.where(mat_f[..., sbuf.MAT_FOG_ENABLED] > 0.0, fog_rgba[..., 3], 0.0)

    res_a = jnp.ones((n,), jnp.float32)
    res_rgb = jnp.zeros((n, 3), jnp.float32)
    res_transparent = jnp.zeros((n, 3), jnp.float32)
    res_pos = jnp.zeros((n, 3), jnp.float32)
    res_nrm = jnp.zeros((n, 3), jnp.float32)
    res_spec = jnp.zeros((n, 3), jnp.float32)
    res_inst = jnp.full((n,), -1, jnp.int32)
    for hslot in range(k1):
        valid = inst[:, hslot] >= 0
        ha = shade.color[:, hslot, 3]
        alpha_contrib = res_a * ha
        live = valid & (alpha_contrib >= EPSILON) & (res_a > EPSILON)
        fa = fog_a[:, hslot]
        res_transparent = res_transparent + jnp.where(
            live[:, None], fog_rgba[:, hslot, :3] * (fa * alpha_contrib)[:, None], 0.0
        )
        alpha_contrib = alpha_contrib * (1.0 - fa)
        color_add = shade.color[:, hslot, :3] * alpha_contrib[:, None]
        lit = live & uses_lighting[:, hslot]
        res_rgb = res_rgb + jnp.where(lit[:, None], color_add, 0.0)
        res_transparent = res_transparent + jnp.where(
            (live & ~uses_lighting[:, hslot])[:, None],
            color_add * (ambient + self_light[:, hslot]),
            0.0,
        )
        spec = (
            mat_f[:, hslot, sbuf.MAT_SPECULAR_R : sbuf.MAT_SPECULAR_R + 3]
            * shade.specular[:, hslot]
        )
        # Refraction stores only lit hits (RefractionRayGen.hlsl:84-93);
        # reflection stores any live hit (ReflectionRayGen.hlsl:114-118).
        store = live if store_any else lit
        res_pos = jnp.where(store[:, None], hit_pos[:, hslot], res_pos)
        res_nrm = jnp.where(store[:, None], shade.normal[:, hslot], res_nrm)
        res_spec = jnp.where(store[:, None], spec, res_spec)
        res_inst = jnp.where(store, inst[:, hslot], res_inst)
        res_a = jnp.where(live, res_a * (1.0 - ha), res_a)
    return res_rgb, res_a, res_pos, res_nrm, res_spec, res_inst, res_transparent


def reflection_pass(
    sb, world, trace_scene, cfg, gp, g: GBuffers, refl_state,
    pix, bn_table, noise_rand,
    bg_image,
):
    """One ReflectionRayGen iteration (ReflectionRayGen.hlsl:25-143).

    refl_state = (reflection_rgb, reflection_alpha, shading_position,
    view_direction, shading_normal, instance_id) — the pass mutates the
    shading buffers in place for the next bounce
    (ReflectionRayGen.hlsl:117-124), which the host loops
    max_reflections times (rt64_view.cpp:1417-1436).
    """
    refl_rgb, refl_a, sh_pos, view_dir, sh_nrm, inst_id = refl_state
    n = inst_id.shape[0]
    inst_s = jnp.maximum(inst_id, 0)
    active = (inst_id >= 0) & (refl_a > EPSILON)

    ray_dir = view_dir - 2.0 * jnp.sum(
        view_dir * sh_nrm, axis=-1, keepdims=True
    ) * sh_nrm  # reflect()

    bg = sky.sample_background_env(bg_image, ray_dir)
    sky_c = sky.sample_sky_plane(
        sb.tex_pool, sb.tex_records, gp.sky_plane_tex_index, ray_dir,
        gp.sky_yaw_offset, gp.sky_diffuse_mult, gp.sky_hsl_mod,
    )
    bg = bg * (1.0 - sky_c[:, 3:4]) + sky_c[:, :3] * sky_c[:, 3:4]

    t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
    t_max = jnp.full((n,), tracer.RAY_MAX_DISTANCE)
    shade, t_all = _trace_and_shade(
        sb, world, trace_scene, sh_pos, ray_dir, t_min, t_max,
        cfg.k_secondary, noise_rand, cfg,
    )

    # Per-hit loop with fresnel accumulation for the next bounce.
    hit_inst = shade.instance
    hit_inst_s = jnp.maximum(hit_inst, 0)
    mat_f = sb.mat_f[hit_inst_s]
    uses_lighting = (sb.light_groups_inst[hit_inst_s] > 0) & (hit_inst >= 0)
    ambient = gp.ambient_base + gp.ambient_no_gi
    self_light = mat_f[..., sbuf.MAT_SELF_LIGHT_R : sbuf.MAT_SELF_LIGHT_R + 3]
    hit_pos = sh_pos[:, None, :] + ray_dir[:, None, :] * t_all[..., None]
    fog_rgba = fog.fog_from_origin(
        hit_pos, sh_pos[:, None, :],
        mat_f[..., sbuf.MAT_FOG_R : sbuf.MAT_FOG_R + 3],
        mat_f[..., sbuf.MAT_FOG_MUL], mat_f[..., sbuf.MAT_FOG_OFFSET],
    )
    fog_a = jnp.where(mat_f[..., sbuf.MAT_FOG_ENABLED] > 0.0, fog_rgba[..., 3], 0.0)
    # Bug-compatible: the fresnel multiplier reads the *primary* pixel's
    # material, not the hit's (ReflectionRayGen.hlsl:100).
    primary_fresnel_mult = sb.mat_f[inst_s, sbuf.MAT_REFLECTION_FRESNEL]

    res_a = jnp.ones((n,), jnp.float32)
    res_rgb = jnp.zeros((n, 3), jnp.float32)
    res_transparent = jnp.zeros((n, 3), jnp.float32)
    res_pos = jnp.zeros((n, 3), jnp.float32)
    res_nrm = jnp.zeros((n, 3), jnp.float32)
    res_spec = jnp.zeros((n, 3), jnp.float32)
    res_inst = jnp.full((n,), -1, jnp.int32)
    new_refl_a = jnp.zeros((n,), jnp.float32)
    k1 = t_all.shape[1]
    for hslot in range(k1):
        valid = hit_inst[:, hslot] >= 0
        ha = shade.color[:, hslot, 3]
        alpha_contrib = res_a * ha
        live = valid & (alpha_contrib >= EPSILON) & (res_a > EPSILON)
        fa = fog_a[:, hslot]
        res_transparent = res_transparent + jnp.where(
            live[:, None], fog_rgba[:, hslot, :3] * (fa * alpha_contrib)[:, None], 0.0
        )
        alpha_contrib = alpha_contrib * (1.0 - fa)

        hit_refl = mat_f[:, hslot, sbuf.MAT_REFLECTION]
        has_refl = live & (hit_refl > EPSILON)
        fres = _fresnel(shade.normal[:, hslot], ray_dir, hit_refl, primary_fresnel_mult)
        new_refl_a = new_refl_a + jnp.where(
            has_refl, fres * alpha_contrib * refl_a, 0.0
        )

        color_add = shade.color[:, hslot, :3] * alpha_contrib[:, None]
        lit = live & uses_lighting[:, hslot]
        res_rgb = res_rgb + jnp.where(lit[:, None], color_add, 0.0)
        res_transparent = res_transparent + jnp.where(
            (live & ~uses_lighting[:, hslot])[:, None],
            color_add * (ambient + self_light[:, hslot]),
            0.0,
        )
        spec = (
            mat_f[:, hslot, sbuf.MAT_SPECULAR_R : sbuf.MAT_SPECULAR_R + 3]
            * shade.specular[:, hslot]
        )
        res_pos = jnp.where(live[:, None], hit_pos[:, hslot], res_pos)
        res_nrm = jnp.where(live[:, None], shade.normal[:, hslot], res_nrm)
        res_spec = jnp.where(live[:, None], spec, res_spec)
        res_inst = jnp.where(live, hit_inst[:, hslot], res_inst)
        res_a = jnp.where(live, res_a * (1.0 - ha), res_a)

    # Lighting at the final hit (checkShadows=false,
    # ReflectionRayGen.hlsl:125-132), and shading-buffer writeback.
    direct = lighting.compute_lights_random(
        sb, world, trace_scene, pix, bn_table, gp.frame_count,
        ray_dir, res_inst, res_pos, res_nrm, res_spec,
        max_light_count=1, di_samples=cfg.di_samples, check_shadows=False,
        noise_rand=noise_rand, shadow_k_alpha=cfg.k_shadow,
    )
    got = res_inst >= 0
    self_f = sb.mat_f[jnp.maximum(res_inst, 0),
                      sbuf.MAT_SELF_LIGHT_R : sbuf.MAT_SELF_LIGHT_R + 3]
    res_rgb = jnp.where(got[:, None], res_rgb * (ambient + direct + self_f), res_rgb)
    upd = active & got
    sh_pos = jnp.where(upd[:, None], res_pos, sh_pos)
    view_dir = jnp.where(upd[:, None], ray_dir, view_dir)
    sh_nrm = jnp.where(upd[:, None], res_nrm, sh_nrm)
    inst_id = jnp.where(upd, res_inst, inst_id)

    # Background blend + artificial shine (ReflectionRayGen.hlsl:134-143).
    res_rgb = res_rgb + bg * res_a[:, None] + res_transparent
    shine = sb.mat_f[inst_s, sbuf.MAT_REFLECTION_SHINE]
    highlight = jnp.asarray([1.0, 1.05, 1.2])
    shadow_c = jnp.asarray([0.1, 0.05, 0.0])
    up_amt = jnp.power(jnp.maximum(ray_dir[:, 1], 0.0) * shine, 3.0)[:, None]
    dn_amt = jnp.power(jnp.maximum(-ray_dir[:, 1], 0.0) * shine, 3.0)[:, None]
    res_rgb = res_rgb * (1.0 - up_amt) + highlight * up_amt
    res_rgb = res_rgb * (1.0 - dn_amt) + shadow_c * dn_amt

    add = res_rgb * refl_a[:, None] * jnp.clip(1.0 - new_refl_a, 0.0, 1.0)[:, None]
    refl_rgb = refl_rgb + jnp.where(active[:, None], add, 0.0)
    refl_a = jnp.where(active, jnp.clip(new_refl_a, 0.0, 1.0), refl_a)
    return (refl_rgb, refl_a, sh_pos, view_dir, sh_nrm, inst_id)


class FrameOutputs(NamedTuple):
    """Everything a frame produces: the display image, the history for
    the next frame, and the g-buffer taps the inspector/tests read."""

    image: jax.Array  # (display_h, display_w, 3) linear float
    history: History
    gbuffers: GBuffers
    direct_accum: jax.Array  # (N, 4)
    indirect_accum: jax.Array  # (N, 4)
    filtered_direct: jax.Array  # (N, 3)
    filtered_indirect: jax.Array  # (N, 3)
    reflection: jax.Array  # (N, 3)
    refraction: jax.Array  # (N, 3)
    rt_output: jax.Array  # (H, W, 3) composed render-res image


def render_frame(
    sb: sbuf.SceneBuffers,
    gp: GlobalParams,
    history: History,
    bn_table,
    bg_image,
    cfg: RenderConfig,
    visualization_mode: int = 0,
) -> FrameOutputs:
    """The full frame: View::render as one pure function."""
    h, w = cfg.rt_height, cfg.rt_width
    n = h * w

    world = build_world(sb)
    trace_scene = make_trace_scene(sb, world, cfg.alpha_cap)

    pix, origin, dirs = primary_rays(cfg, gp)
    origins = jnp.broadcast_to(origin, dirs.shape)
    noise_rand = _noise_rand(cfg, gp, pix)

    # Background + sky (PrimaryRayGen.hlsl:47-56).
    dims = jnp.asarray([w, h], jnp.float32)
    screen_uv = (pix.astype(jnp.float32) + gp.pixel_jitter) / dims
    bg_color = sky.sample_background_2d(bg_image, screen_uv)
    sky_c = sky.sample_sky_2d(
        sb.tex_pool, sb.tex_records, gp.sky_plane_tex_index, screen_uv,
        gp.view_i, jnp.asarray([cfg.display_width, cfg.display_height], jnp.float32),
        gp.sky_yaw_offset, gp.sky_diffuse_mult, gp.sky_hsl_mod,
    )
    bg_color = bg_color * (1.0 - sky_c[:, 3:4]) + sky_c[:, :3] * sky_c[:, 3:4]

    # Primary trace + resolve.
    t_min = jnp.full((n,), tracer.RAY_MIN_DISTANCE)
    t_max = jnp.full((n,), tracer.RAY_MAX_DISTANCE)
    shade, t_all = _trace_and_shade(
        sb, world, trace_scene, origins, dirs, t_min, t_max,
        cfg.k_primary, noise_rand, cfg,
    )
    g = _resolve_hits(
        sb, gp, cfg, shade, t_all, origins, dirs, bg_color,
        world, trace_scene, pix, bn_table, noise_rand,
    )

    # Direct / indirect lighting.
    direct_accum = direct_pass(
        sb, world, trace_scene, cfg, gp, g, history, pix, bn_table,
        noise_rand, dirs,
    )
    indirect_accum = indirect_pass(
        sb, world, trace_scene, cfg, gp, g, history, pix, bn_table,
        noise_rand, bg_image,
    )

    # Refraction, then the reflection loop (rt64_view.cpp:1405-1436).
    refraction_rgb = refraction_pass(
        sb, world, trace_scene, cfg, gp, g, pix, bn_table, noise_rand,
        bg_image, screen_uv,
    )
    refl_state = (
        jnp.zeros((n, 3), jnp.float32), g.reflection_alpha,
        g.shading_position, g.view_direction, g.shading_normal, g.instance_id,
    )
    if cfg.max_reflections > 0:
        def refl_body(state, _):
            return (
                reflection_pass(
                    sb, world, trace_scene, cfg, gp, g, state, pix, bn_table,
                    noise_rand, bg_image,
                ),
                None,
            )

        refl_state, _ = jax.lax.scan(
            refl_body, refl_state, jnp.arange(cfg.max_reflections)
        )
    reflection_rgb = refl_state[0]

    # DI denoise is compiled out in the reference (rt64_view.cpp:1439-1443):
    # filtered direct is a plain copy.
    filtered_direct = direct_accum[:, :3]
    # GI: 5x gaussian ping-pong when the denoiser is on
    # (rt64_view.cpp:1488-1530).
    fi = indirect_accum[:, :3].reshape(h, w, 3)
    if cfg.denoiser_enabled:
        for _ in range(cfg.gi_filter_passes):
            fi = filters.gaussian_3x3(fi)
    filtered_indirect = fi.reshape(n, 3)

    # Compose (ComposePS.hlsl).
    rt_rgb = filters.compose(
        g.diffuse, filtered_direct, filtered_indirect,
        reflection_rgb, refraction_rgb, g.transparent,
    ).reshape(h, w, 3)

    # Upscale to display resolution.
    if (cfg.display_height, cfg.display_width) != (h, w):
        from rt64tpu.models.upscaler import run_upscaler

        disp = run_upscaler(
            cfg, gp, rt_rgb,
            g.flow.reshape(h, w, 2),
            g.reactive_mask.reshape(h, w),
            g.lock_mask.reshape(h, w),
            g.depth.reshape(h, w),
        )
    else:
        disp = rt_rgb

    # Post-process: motion blur (PostProcessPS) or debug visualization.
    if visualization_mode == 0:
        flow_disp = filters.bilinear_resize(
            g.flow.reshape(h, w, 2), cfg.display_height, cfg.display_width
        )
        disp = filters.motion_blur(
            disp, flow_disp, jnp.asarray([w, h], jnp.float32),
            gp.motion_blur_strength, cfg.motion_blur_samples,
        )
    else:
        disp = debug_visualization(
            visualization_mode, cfg, g, direct_accum, indirect_accum,
            filtered_direct, filtered_indirect, reflection_rgb,
            refraction_rgb,
        )

    new_history = History(
        normal=g.shading_normal.reshape(h, w, 3),
        depth=g.depth.reshape(h, w),
        direct=direct_accum.reshape(h, w, 4),
        indirect=indirect_accum.reshape(h, w, 4),
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
    )


def debug_visualization(
    mode: int, cfg, g: GBuffers, direct_accum, indirect_accum,
    filtered_direct, filtered_indirect, reflection, refraction,
):
    """DebugPS.hlsl visualization modes (17 total)."""
    h, w = cfg.rt_height, cfg.rt_width

    def img(x, c=3):
        return x.reshape(h, w, -1)[..., :3] if x.ndim > 1 else jnp.repeat(
            x.reshape(h, w, 1), 3, axis=-1
        )

    if mode == 1:
        out = img(g.shading_position)
    elif mode == 2:
        out = img((g.shading_normal + 1.0) / 2.0)
    elif mode == 3:
        out = img(g.shading_specular)
    elif mode == 4:
        out = img(g.diffuse)
    elif mode == 5:
        seed = rnd.init_rand(
            jnp.maximum(g.instance_id, 0).astype(jnp.uint32), jnp.uint32(0)
        )
        seed, r = rnd.next_rand(seed)
        seed, gg = rnd.next_rand(seed)
        seed, b = rnd.next_rand(seed)
        out = img(
            jnp.where(
                (g.instance_id >= 0)[:, None],
                jnp.stack([r, gg, b], axis=-1),
                0.0,
            )
        )
    elif mode == 6:
        out = img(direct_accum[:, :3])
    elif mode == 7:
        out = img(filtered_direct)
    elif mode == 8:
        out = img(indirect_accum[:, :3])
    elif mode == 9:
        out = img(filtered_indirect)
    elif mode == 10:
        out = img(reflection)
    elif mode == 11:
        out = img(refraction)
    elif mode == 12:
        out = img(g.transparent)
    elif mode == 13:
        out = _flow_visualization(cfg, g.flow.reshape(h, w, 2))
    elif mode == 14:
        out = img(g.reactive_mask)
    elif mode == 15:
        out = img(g.lock_mask)
    elif mode == 16:
        out = img(g.depth)
    else:
        out = jnp.full((h, w, 3), 0.5)
    if out.shape[:2] != (cfg.display_height, cfg.display_width):
        out = filters.bilinear_resize(out, cfg.display_height, cfg.display_width)
    return out


def _flow_visualization(cfg, flow):
    """Motion-vector line drawing (DebugPS.hlsl:15-46): block centers
    draw a line toward their previous-frame position."""
    h, w = cfg.rt_height, cfg.rt_width
    block = 32.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    cx = jnp.floor(xx / block) * block + block * 0.5
    cy = jnp.floor(yy / block) * block + block * 0.5
    cxi = jnp.clip(cx.astype(jnp.int32), 0, w - 1)
    cyi = jnp.clip(cy.astype(jnp.int32), 0, h - 1)
    f = flow[jnp.broadcast_to(cyi, (h, w)), jnp.broadcast_to(cxi, (h, w))]
    px = cx + f[..., 0]
    py = cy + f[..., 1]
    # distance from (xx, yy) to segment (cx, cy) -> (px, py)
    dx = px - cx
    dy = py - cy
    l2 = dx * dx + dy * dy
    t = jnp.clip(((xx - cx) * dx + (yy - cy) * dy) / jnp.maximum(l2, 1e-12), 0.0, 1.0)
    qx = cx + t * dx
    qy = cy + t * dy
    dist = jnp.sqrt((xx - qx) ** 2 + (yy - qy) ** 2)
    dist = jnp.where(l2 > 0.0, dist, jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2))
    on = (dist < 1.0).astype(jnp.float32)
    return jnp.repeat(on[..., None], 3, axis=-1)
