"""Batched hit shading — the reference's any-hit work, wavefront style.

The DXR surface any-hit emitted at rt64_shader.cpp:444-592 interpolates
vertex data, samples textures with ray-differential gradients, runs the
color combiner, applies material mixes/alpha rules, perturbs normals,
and records flow. Here, the same math runs as ONE vectorized pass over
every collected hit of every ray: (N rays) x (K+1 hit slots). Invalid
slots (tri < 0) are masked; all gathers are XLA-native.

Mipmaps are disabled in the reference (rt64_device.cpp:758-762), so
SampleGrad == bilinear and ray differentials are not needed for
sampling; we keep the Igehy machinery out of the hot path entirely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rt64tpu.ops import texture as tex_ops
from rt64tpu.ops import random as rnd
from rt64tpu.ops.combiner import combiner_eval
from rt64tpu.pipeline import scene_buffers as sbuf


class WorldGeometry(NamedTuple):
    """Per-frame world-space vertex data (computed once, reused by all
    trace passes). The TLAS-refit product."""

    world_pos: jax.Array  # (V, 3)
    world_nrm: jax.Array  # (V, 3)


class HitShade(NamedTuple):
    color: jax.Array  # (..., 4) combiner result after material rules
    normal: jax.Array  # (..., 3) world shading normal (faces the ray)
    specular: jax.Array  # (..., 3) vertexSpecular (map or 1)
    flow: jax.Array  # (..., 3) world-space motion (cur - prev)
    instance: jax.Array  # (...,) int32, -1 for empty slots


def shade_hits(
    sb: sbuf.SceneBuffers,
    world: WorldGeometry,
    ray_dirs,  # (..., 3) (broadcastable over hit slots)
    tri,  # (...,) int32 triangle ids (-1 empty)
    bary_uv,  # (..., 2)
    noise_rand,  # (...,) per-pixel random in [0,1) for opt_noise
    shadow_variant: bool = False,
) -> HitShade:
    """Shade a batch of hits.

    shadow_variant selects the shadow any-hit rules
    (rt64_shader.cpp:594-674): shadowAlphaMultiplier instead of
    solidAlphaMultiplier, no diffuseColorMix, no normal/specular maps.
    """
    valid = tri >= 0
    tri_s = jnp.maximum(tri, 0)
    idx3 = sb.tri_idx[tri_s]  # (..., 3)
    inst = sb.tri_instance[tri_s]  # (...,)

    u = bary_uv[..., 0]
    v = bary_uv[..., 1]
    w0 = 1.0 - u - v
    bary = jnp.stack([w0, u, v], axis=-1)[..., None]  # (..., 3, 1)

    # --- vertex gathers -------------------------------------------------
    p_obj = (sb.pos[idx3] * bary).sum(-2)  # (..., 3) object-space position
    n_world3 = world.world_nrm[idx3]  # (..., 3, 3)
    n_interp = (n_world3 * bary).sum(-2)
    pw3 = world.world_pos[idx3]  # (..., 3, 3) world corners
    uv3 = sb.uv[idx3]  # (..., 3, 2)
    uv = (uv3 * bary).sum(-2)
    inputs3 = sb.inputs[idx3]  # (..., 3, 4, 4)
    inputs = (inputs3 * bary[..., None]).sum(-3)  # (..., 4, 4)

    # Geometric normal: -cross(p2-p0, p1-p0) = cross(e1, e2)
    # (rt64_shader.cpp:176), in world space.
    e1 = pw3[..., 1, :] - pw3[..., 0, :]
    e2 = pw3[..., 2, :] - pw3[..., 0, :]
    tri_nrm = jnp.cross(e1, e2)

    # Vertex normal with face-normal fallback (rt64_shader.cpp:177).
    interp_zero = jnp.all(n_interp == 0.0, axis=-1, keepdims=True)
    normal = jnp.where(interp_zero, tri_nrm, n_interp)
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    normal_preflip = normal

    # Face the ray (rt64_shader.cpp:519-520).
    normal_sign = jnp.where(jnp.sum(tri_nrm * ray_dirs, axis=-1) <= 0.0, 1.0, -1.0)
    normal = normal * normal_sign[..., None]

    # --- material / combiner gathers --------------------------------------
    mat_f = sb.mat_f[inst]
    mat_i = sb.mat_i[inst]
    params = sb.combiner[inst]
    filt = mat_i[..., sbuf.II_FILTER] == 1
    h_addr = mat_i[..., sbuf.II_H_ADDR]
    v_addr = mat_i[..., sbuf.II_V_ADDR]

    use_t0 = params[..., 13] != 0
    diffuse_tex = jnp.where(use_t0 & valid, mat_i[..., sbuf.II_DIFFUSE_TEX], -1)
    tex0 = tex_ops.sample(sb.tex_pool, sb.tex_records, diffuse_tex, uv, filt, h_addr, v_addr)
    mix = mat_f[..., sbuf.MAT_DIFFUSE_MIX_R : sbuf.MAT_DIFFUSE_MIX_R + 4]
    if not shadow_variant:
        # Negative mix applies before the combiner (rt64_shader.cpp:481).
        neg = jnp.maximum(-mix[..., 3:4], 0.0)
        tex0 = tex0.at[..., :3].set(
            tex0[..., :3] * (1.0 - neg) + mix[..., :3] * neg
        )
    tex1 = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 1.0, 1.0], tex0.dtype), tex0.shape
    )  # TEXEL1 stub (rt64_shader.cpp:484-487)

    color = combiner_eval(params, inputs, tex0, tex1)

    opt_texture_edge = params[..., 9] != 0
    opt_noise = params[..., 10] != 0

    if shadow_variant:
        # Shadow alpha rules (rt64_shader.cpp:611-662): opaque combiner
        # (no opt_alpha) forces full occlusion.
        opt_alpha = params[..., 8] != 0
        alpha = jnp.where(opt_alpha, color[..., 3], 1.0)
        alpha = jnp.clip(alpha * mat_f[..., sbuf.MAT_SHADOW_ALPHA_MULT], 0.0, 1.0)
        alpha = jnp.where(opt_alpha, alpha, 1.0)
        alpha = jnp.where(
            opt_texture_edge & opt_alpha,
            jnp.where(alpha > 0.3, 1.0, 0.0),
            alpha,
        )
        alpha = jnp.where(opt_noise & opt_alpha, alpha * jnp.round(noise_rand), alpha)
        color = jnp.concatenate([color[..., :3], alpha[..., None]], axis=-1)
        zeros3 = jnp.zeros_like(normal)
        return HitShade(
            color=jnp.where(valid[..., None], color, 0.0),
            normal=zeros3, specular=zeros3, flow=zeros3,
            instance=jnp.where(valid, inst, -1),
        )

    # Positive diffuse mix after the combiner (rt64_shader.cpp:497).
    pos_mix = jnp.maximum(mix[..., 3:4], 0.0)
    rgb = color[..., :3] * (1.0 - pos_mix) + mix[..., :3] * pos_mix
    alpha = jnp.clip(
        color[..., 3] * mat_f[..., sbuf.MAT_SOLID_ALPHA_MULT], 0.0, 1.0
    )
    # TEXTURE_EDGE: binarize at 0.3; below-threshold hits are ignored
    # (alpha 0 contributes nothing downstream) (rt64_shader.cpp:502-511).
    alpha = jnp.where(
        opt_texture_edge, jnp.where(alpha > 0.3, 1.0, 0.0), alpha
    )
    alpha = jnp.where(opt_noise, alpha * jnp.round(noise_rand), alpha)
    color = jnp.concatenate([rgb, alpha[..., None]], axis=-1)

    # --- normal mapping (rt64_shader.cpp:522-533) -------------------------
    normal_tex = mat_i[..., sbuf.II_NORMAL_TEX]
    do_nmap = (mat_i[..., sbuf.II_NORMAL_MAP] == 1) & (normal_tex >= 0) & valid
    uv_scale = mat_f[..., sbuf.MAT_UV_DETAIL_SCALE : sbuf.MAT_UV_DETAIL_SCALE + 1]
    tangent, binormal = tangent_binormal(pw3, uv3, normal_preflip)
    tangent = tangent * normal_sign[..., None]
    binormal = binormal * normal_sign[..., None]
    nmap = tex_ops.sample(
        sb.tex_pool, sb.tex_records, jnp.where(do_nmap, normal_tex, -1),
        uv * uv_scale, filt, h_addr, v_addr,
    )
    ncol = nmap[..., :3] * 2.0 - 1.0
    perturbed = (
        normal * ncol[..., 2:3] + tangent * ncol[..., 0:1] + binormal * ncol[..., 1:2]
    )
    perturbed = perturbed / jnp.maximum(
        jnp.linalg.norm(perturbed, axis=-1, keepdims=True), 1e-12
    )
    normal = jnp.where(do_nmap[..., None], perturbed, normal)

    # --- specular map (rt64_shader.cpp:539-545) ---------------------------
    spec_tex = mat_i[..., sbuf.II_SPECULAR_TEX]
    do_smap = (mat_i[..., sbuf.II_SPECULAR_MAP] == 1) & (spec_tex >= 0) & valid
    smap = tex_ops.sample(
        sb.tex_pool, sb.tex_records, jnp.where(do_smap, spec_tex, -1),
        uv * uv_scale, filt, h_addr, v_addr,
    )
    specular = jnp.where(do_smap[..., None], smap[..., :3], jnp.ones_like(smap[..., :3]))

    # --- motion flow (rt64_shader.cpp:535-537) -----------------------------
    cur_m = sb.transforms[inst]
    prev_m = sb.prev_transforms[inst]
    cur_w = jnp.einsum("...i,...ij->...j", p_obj, cur_m[..., :3, :3]) + cur_m[..., 3, :3]
    prev_w = jnp.einsum("...i,...ij->...j", p_obj, prev_m[..., :3, :3]) + prev_m[..., 3, :3]
    flow = cur_w - prev_w

    return HitShade(
        color=jnp.where(valid[..., None], color, 0.0),
        normal=jnp.where(valid[..., None], normal, 0.0),
        specular=jnp.where(valid[..., None], specular, 0.0),
        flow=jnp.where(valid[..., None], flow, 0.0),
        instance=jnp.where(valid, inst, -1),
    )


def _tangent_basis(pw3, uv3):
    """Per-triangle tangent (rt64_shader.cpp:201-217), in world space."""
    uv0, uv1, uv2 = uv3[..., 0, :], uv3[..., 1, :], uv3[..., 2, :]
    uva = uv1[..., 0] - uv0[..., 0]
    uvb = uv2[..., 0] - uv0[..., 0]
    uvc = uv1[..., 1] - uv0[..., 1]
    uvd = uv2[..., 1] - uv0[..., 1]
    uvk = uvb * uvc - uva * uvd
    dpos1 = pw3[..., 1, :] - pw3[..., 0, :]
    dpos2 = pw3[..., 2, :] - pw3[..., 0, :]

    def nrm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    t_main = nrm(uvc[..., None] * dpos2 - uvd[..., None] * dpos1)
    t_a = nrm(dpos1)
    t_b = nrm(dpos2)
    tangent = jnp.where(
        (uvk != 0.0)[..., None],
        t_main,
        jnp.where(
            (uva != 0.0)[..., None],
            t_a,
            jnp.where((uvb != 0.0)[..., None], t_b, jnp.zeros_like(t_a)),
        ),
    )
    return tangent


def tangent_binormal(pw3, uv3, vertex_normal):
    """Tangent + binormal (rt64_shader.cpp:201-225), world space.

    Binormal handedness from the UV winding (rt64_shader.cpp:218-224);
    the cross uses the interpolated vertex normal like the reference.
    """
    tangent = _tangent_basis(pw3, uv3)
    uv0, uv1, uv2 = uv3[..., 0, :], uv3[..., 1, :], uv3[..., 2, :]
    duv1 = uv1 - uv0
    duv2 = uv2 - uv1
    # cross(float3(duv1, 0), float3(duv2, 0)).z with both y negated.
    crz = duv1[..., 0] * (-duv2[..., 1]) - (-duv1[..., 1]) * duv2[..., 0]
    binormal_mult = jnp.where(crz < 0.0, -1.0, 1.0)
    binormal = jnp.cross(tangent, vertex_normal) * binormal_mult[..., None]
    return tangent, binormal
