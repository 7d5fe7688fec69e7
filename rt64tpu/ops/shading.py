"""Batched hit shading over gathered triangle rows — planar layout.

The DXR surface any-hit emitted at rt64_shader.cpp:444-592 interpolates
vertex data, samples textures, runs the color combiner, applies
material/alpha rules, perturbs normals, and records motion flow. Here
the same math runs as ONE pass over every collected hit: a single wide
row gather per hit (pipeline/rows.py) followed by pure planar vector
ops. The shadow variant implements the shadow any-hit rules
(rt64_shader.cpp:594-674).

Mipmaps are disabled in the reference (rt64_device.cpp:758-762), so
SampleGrad degenerates to bilinear and the Igehy ray differentials stay
out of the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rt64tpu.ops import texture as tex_ops
from rt64tpu.ops import vecmath as vm
from rt64tpu.ops.combiner import combiner_eval_planar
from rt64tpu.pipeline import rows as R


class HitShade(NamedTuple):
    color: jax.Array  # (4, M) combiner rgba after material rules
    normal: jax.Array  # (3, M) world shading normal (faces the ray)
    specular: jax.Array  # (3, M) vertexSpecular (map or 1)
    flow: jax.Array  # (3, M) world-space motion (cur - prev)
    instance: jax.Array  # (M,) int32, -1 for empty slots
    rows_t: jax.Array  # (TROW, M) the gathered rows (for extra columns)
    tri: jax.Array  # (M,) int32 triangle ids (-1 empty); set by callers


def interp3(gt, base, w0, u, v):
    """Barycentric interp of a 3-corner scalar triplet at row offsets
    base, base+step... for corner-major layouts see call sites."""
    return gt[base] * w0 + gt[base + 1] * u + gt[base + 2] * v


def shade_hits(
    sb,
    tri_rows,  # (T, TROW) packed triangle rows
    ray_dir,  # (3, M) ray directions (per hit point)
    tri,  # (M,) int32 triangle ids (-1 empty)
    bary_u,  # (M,)
    bary_v,  # (M,)
    noise_rand,  # (M,) per-pixel random for opt_noise
    shadow_variant: bool = False,
    mip_args=None,  # (t (M,), d_ddx (3, M), d_ddy (3, M)) camera-ray
    # differentials for ray-diff mip LOD on the diffuse fetch; only
    # consulted when the scene statically has mip-enabled instances
    # (ShadeFeatures.has_mips)
) -> HitShade:
    valid = tri >= 0
    tri_s = jnp.maximum(tri, 0)
    gt = tri_rows[tri_s].T  # (TROW, M) — THE gather

    u = bary_u
    v = bary_v
    w0 = 1.0 - u - v

    p0 = gt[R.T_P0 : R.T_P0 + 3]
    p1 = gt[R.T_P1 : R.T_P1 + 3]
    p2 = gt[R.T_P2 : R.T_P2 + 3]
    n0 = gt[R.T_N0 : R.T_N0 + 3]
    n1 = gt[R.T_N1 : R.T_N1 + 3]
    n2 = gt[R.T_N2 : R.T_N2 + 3]

    pos = p0 * w0 + p1 * u + p2 * v  # world hit position (interp)
    n_interp = n0 * w0 + n1 * u + n2 * v
    uv_u = gt[R.T_UV] * w0 + gt[R.T_UV + 2] * u + gt[R.T_UV + 4] * v
    uv_v = gt[R.T_UV + 1] * w0 + gt[R.T_UV + 3] * u + gt[R.T_UV + 5] * v

    def interp_rgba(base):
        return jnp.stack(
            [
                gt[base + c] * w0 + gt[base + 4 + c] * u + gt[base + 8 + c] * v
                for c in range(4)
            ],
            axis=0,
        )

    in1 = interp_rgba(R.T_IN1)
    in2 = interp_rgba(R.T_IN2)
    zero4 = jnp.stack([jnp.zeros_like(u)] * 3 + [jnp.ones_like(u)], 0)

    # Geometric normal -cross(p2-p0, p1-p0) = cross(e1, e2)
    # (rt64_shader.cpp:176), world space.
    e1 = p1 - p0
    e2 = p2 - p0
    tri_nrm = vm.cross(e1, e2)

    # Vertex normal with face-normal fallback (rt64_shader.cpp:177).
    interp_zero = jnp.all(n_interp == 0.0, axis=0)
    normal = jnp.where(interp_zero[None], tri_nrm, n_interp)
    normal = vm.normalize(normal)
    normal_preflip = normal
    normal_sign = jnp.where(vm.dot(tri_nrm, ray_dir) <= 0.0, 1.0, -1.0)
    normal = normal * normal_sign[None]

    # --- flags / sampler / combiner ---------------------------------------
    flags = gt[R.T_FLAGS].astype(jnp.int32)
    fl = lambda bit: (flags & bit) != 0
    sampler = gt[R.T_SAMPLER].astype(jnp.int32)
    filt = (sampler & 3) == 1
    h_addr = (sampler >> 2) & 3
    v_addr = (sampler >> 4) & 3
    cc_items = R.unpack_cc(gt[R.T_CC], jnp).T  # (8, M)
    mat = lambda off: gt[R.T_MAT + off]

    # Record fields ride the row (T_REC) — no per-pixel records gather.
    rec_cols = lambda j: (
        gt[R.T_REC + 3 * j], gt[R.T_REC + 3 * j + 1], gt[R.T_REC + 3 * j + 2]
    )
    use_t0 = fl(R.F_USE_T0)
    ok_t0 = use_t0 & valid & (gt[R.T_TEX_D] >= 0.0)
    d_off, d_w, d_h = rec_cols(0)
    feat = getattr(sb, "features", None)
    if (mip_args is not None and feat is not None and feat.has_mips
            and not shadow_variant):
        # Ray-diff mip LOD (opt-in; Ray.hlsli:37-94 + the SampleGrad
        # call the reference makes with its mips compiled out,
        # rt64_shader.cpp:474-480). Nearest-level selection keeps the
        # fetch at ONE pool gather; the quad entries already give the
        # in-level bilinear.
        from rt64tpu.ops import raydiff

        t_hit, d_ddx, d_ddy = mip_args
        uv0 = jnp.stack([gt[R.T_UV], gt[R.T_UV + 1]], 0)
        uv1 = jnp.stack([gt[R.T_UV + 2], gt[R.T_UV + 3]], 0)
        uv2 = jnp.stack([gt[R.T_UV + 4], gt[R.T_UV + 5]], 0)
        duv_dx, duv_dy = raydiff.uv_differentials(
            d_ddx, d_ddy, ray_dir, t_hit, e1, e2, tri_nrm, uv0, uv1, uv2
        )
        lod = raydiff.lod_from_duv(
            duv_dx, duv_dy,
            d_w.astype(jnp.float32), d_h.astype(jnp.float32),
            max_level=float(tex_ops.MAX_MIP_LEVELS - 1),
        )
        level = jnp.where(
            fl(R.F_MIP_LOD) & valid,
            jnp.round(lod).astype(jnp.int32), jnp.int32(0),
        )
        d_off, d_w, d_h = tex_ops.mip_select(
            d_off.astype(jnp.int32), d_w.astype(jnp.int32),
            d_h.astype(jnp.int32), level,
        )
    tex0 = tex_ops.sample_quad_cols(
        sb.quad_pool, d_off, d_w, d_h, ok_t0, uv_u, uv_v, filt, h_addr,
        v_addr,
    )
    mix_r = mat(R.M_DIFFUSE_MIX)
    mix_g = mat(R.M_DIFFUSE_MIX + 1)
    mix_b = mat(R.M_DIFFUSE_MIX + 2)
    mix_a = mat(R.M_DIFFUSE_MIX + 3)
    if not shadow_variant:
        # Negative mix applies before the combiner (rt64_shader.cpp:481).
        neg = jnp.maximum(-mix_a, 0.0)
        mix_rgb = jnp.stack([mix_r, mix_g, mix_b], 0)
        tex0 = jnp.concatenate(
            [tex0[:3] * (1.0 - neg)[None] + mix_rgb * neg[None], tex0[3:4]], 0
        )
    # TEXEL1: a real second texture binding (TPU extension) where the
    # reference stubs it to magenta (rt64_shader.cpp:484-487).
    # Instances without an alt texture keep the magenta parity value.
    # The fetch is compiled out when the scene binds no alt texture
    # (sb.features, static — a lax.cond skip would fence the schedule).
    magenta = jnp.stack(
        [jnp.ones_like(u), jnp.zeros_like(u), jnp.ones_like(u), jnp.ones_like(u)], 0
    )
    if feat is not None and not feat.has_texel1:
        tex1 = magenta
    else:
        use_t1 = fl(R.F_USE_T1)
        ok_t1 = use_t1 & valid & (gt[R.T_TEX_D2] >= 0.0)
        d2_off, d2_w, d2_h = rec_cols(1)
        samp = tex_ops.sample_quad_cols(
            sb.quad_pool, d2_off, d2_w, d2_h, ok_t1, uv_u, uv_v, filt,
            h_addr, v_addr,
        )
        tex1 = jnp.where(ok_t1[None], samp, magenta)

    color = combiner_eval_planar(
        cc_items, fl(R.F_OPT_ALPHA), fl(R.F_ALPHA_SAME),
        in1, in2, zero4, zero4, tex0, tex1,
    )

    opt_edge = fl(R.F_TEXTURE_EDGE)
    opt_noise = fl(R.F_NOISE)

    if shadow_variant:
        # Shadow any-hit rules (rt64_shader.cpp:611-662): only opt_alpha
        # combiners attenuate; everything else fully occludes.
        opt_alpha = fl(R.F_OPT_ALPHA)
        alpha = jnp.clip(color[3] * mat(R.M_SHADOW_ALPHA), 0.0, 1.0)
        alpha = jnp.where(
            opt_edge, jnp.where(alpha > 0.3, 1.0, 0.0), alpha
        )
        alpha = jnp.where(opt_noise, alpha * jnp.round(noise_rand), alpha)
        alpha = jnp.where(opt_alpha, alpha, 1.0)
        alpha = jnp.where(valid, alpha, 0.0)
        zeros3 = jnp.zeros_like(normal)
        return HitShade(
            color=jnp.concatenate([color[:3], alpha[None]], 0),
            normal=zeros3, specular=zeros3, flow=zeros3,
            instance=jnp.where(valid, gt[R.T_INST].astype(jnp.int32), -1),
            rows_t=gt,
            tri=tri,
        )

    # Positive diffuse mix after the combiner (rt64_shader.cpp:497).
    pos_mix = jnp.maximum(mix_a, 0.0)
    mix_rgb = jnp.stack([mix_r, mix_g, mix_b], 0)
    rgb = color[:3] * (1.0 - pos_mix)[None] + mix_rgb * pos_mix[None]
    alpha = jnp.clip(color[3] * mat(R.M_SOLID_ALPHA), 0.0, 1.0)
    # TEXTURE_EDGE binarizes at 0.3; rejected hits contribute alpha 0
    # (rt64_shader.cpp:502-511).
    alpha = jnp.where(opt_edge, jnp.where(alpha > 0.3, 1.0, 0.0), alpha)
    alpha = jnp.where(opt_noise, alpha * jnp.round(noise_rand), alpha)
    alpha = jnp.where(valid, alpha, 0.0)

    # --- normal mapping (rt64_shader.cpp:522-533) ---------------------------
    # Most N64 content binds no normal/specular maps: both fetches are
    # compiled out when the scene has none (sb.features, static — a
    # runtime lax.cond here fences the DMA schedule); when the scene
    # does, they run masked with no control flow.
    uv_scale = mat(R.M_UV_DETAIL)
    if feat is None or feat.has_normal_maps:
        do_nmap = fl(R.F_NORMAL_MAP) & (gt[R.T_TEX_N] >= 0.0) & valid
        tangent, binormal = tangent_binormal(gt, normal_preflip)
        tangent = tangent * normal_sign[None]
        binormal = binormal * normal_sign[None]
        n_off, n_w, n_h = rec_cols(2)
        nmap = tex_ops.sample_quad_cols(
            sb.quad_pool, n_off, n_w, n_h, do_nmap,
            uv_u * uv_scale, uv_v * uv_scale, filt, h_addr, v_addr,
        )
        ncol = nmap[:3] * 2.0 - 1.0
        perturbed = vm.normalize(
            normal * ncol[2][None] + tangent * ncol[0][None]
            + binormal * ncol[1][None]
        )
        normal = jnp.where(do_nmap[None], perturbed, normal)

    # --- specular map (rt64_shader.cpp:539-545) -----------------------------
    if feat is None or feat.has_specular_maps:
        do_smap = fl(R.F_SPECULAR_MAP) & (gt[R.T_TEX_S] >= 0.0) & valid
        s_off, s_w, s_h = rec_cols(3)
        smap = tex_ops.sample_quad_cols(
            sb.quad_pool, s_off, s_w, s_h, do_smap,
            uv_u * uv_scale, uv_v * uv_scale, filt, h_addr, v_addr,
        )
        specular = jnp.where(do_smap[None], smap[:3], jnp.ones((3, u.shape[0])))
    else:
        specular = jnp.ones((3, u.shape[0]))

    # --- motion flow (rt64_shader.cpp:535-537) -------------------------------
    pp0 = gt[R.T_PP0 : R.T_PP0 + 3]
    pp1 = gt[R.T_PP1 : R.T_PP1 + 3]
    pp2 = gt[R.T_PP2 : R.T_PP2 + 3]
    prev_pos = pp0 * w0 + pp1 * u + pp2 * v
    flow = pos - prev_pos

    vmask = valid[None]
    return HitShade(
        color=jnp.where(vmask, jnp.concatenate([rgb, alpha[None]], 0), 0.0),
        normal=jnp.where(vmask, normal, 0.0),
        specular=jnp.where(vmask, specular, 0.0),
        flow=jnp.where(vmask, flow, 0.0),
        instance=jnp.where(valid, gt[R.T_INST].astype(jnp.int32), -1),
        rows_t=gt,
        tri=tri,
    )


def compact_indices(mask, capacity: int):
    """Ray compaction: indices of True lanes, front-packed.

    Returns (idx (capacity,) int32 — source positions of the first
    `capacity` set lanes, padded with n; count — total set lanes).
    top_k over where(mask, i, n) — the k smallest keys are exactly the
    first `capacity` set lanes ascending, and the n padding falls out of
    the key itself. Measured 2.6x faster than the cumsum+scatter form at
    config-2 launch scale (benchmarks/compactbench.py: 0.86 vs 2.22 ms
    at n=368k, cap=11.5k on v5e); XLA's generic 1-D cumsum lowers to a
    log-depth scan with poor VPU utilization, while top_k is a tuned
    library op. Lanes beyond capacity are DROPPED (callers guard with
    count <= capacity)."""
    n = mask.shape[0]
    k = min(capacity, n)
    key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    idx = -jax.lax.top_k(-key, k)[0]
    if k < capacity:
        idx = jnp.concatenate([idx, jnp.full((capacity - k,), n, jnp.int32)])
    return idx, mask.sum()


def shade_hits_compacted(
    sb, tri_rows, ray_dir, tri, bary_u, bary_v, noise_rand,
    capacity: int, shadow_variant: bool = False,
):
    """shade_hits over ONLY the rays that hit, scattered back full-width.

    Alpha-slot batches are usually ~1-5% occupied (foliage fringes), so
    shading the full batch wastes ~20-100x the texture/combiner work —
    and feeding a full-width shade from in-program hit indices also
    trips an XLA scheduling pathology (measured 7x). This compacts the
    hit lanes (one cumsum+scatter), shades `capacity` lanes, and
    scatters the HitShade back.

    BRANCH-FREE on purpose: a lax.cond fallback was measured at ~9 ms
    PER CONDITIONAL on a 480p frame (TPU conditionals fence the DMA
    schedule and marshal their operands). Instead, hits beyond
    `capacity` are dropped and their count is RETURNED — callers
    surface it (FrameOutputs.alpha_dropped) and the view re-specializes
    with a larger capacity on the next frame, like every other capacity
    bucket in the engine (limits.py). Returns (HitShade, dropped int32).

    The reference pays its any-hit shader per actual intersection
    (rt64_shader.cpp:444-592) — this is the packet-framework analog.

    Divergence from shade_hits: miss lanes' rows_t columns are ZERO here
    (the full path leaves row 0's gather there); all consumers mask by
    hit validity, so this is unobservable.
    """
    n = tri.shape[0]
    mask = tri >= 0
    idx, count = compact_indices(mask, capacity)
    safe = jnp.minimum(idx, n - 1)
    live = idx < n

    # ONE packed gather in, ONE packed scatter out: TPU gathers and
    # scatters cost per-row, so the per-field takes/sets this used to do
    # (~12 each per call site) were the dominant cost, not the shading.
    bc_f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    bc_i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    packed_in = jnp.concatenate(
        [bc_f(tri)[None], bary_u[None], bary_v[None], noise_rand[None],
         ray_dir], 0,
    )  # (6, n)
    got = jnp.take(packed_in, safe, axis=1)  # (6, capacity) — THE gather
    tri_c = jnp.where(live, bc_i(got[0]), -1)
    sh_c = shade_hits(
        sb, tri_rows, got[4:7], tri_c, got[1], got[2], got[3],
        shadow_variant=shadow_variant,
    )
    dropped = jnp.maximum(count - capacity, 0)

    if shadow_variant:
        # Shadow rays only consume the occlusion alpha: scatter ONE row.
        alpha = jnp.zeros((n,)).at[idx].set(sh_c.color[3], mode="drop")
        z3 = jnp.zeros((3, n))
        sh = HitShade(
            color=jnp.concatenate([z3, alpha[None]], 0),
            normal=z3, specular=z3, flow=z3,
            instance=jnp.full((n,), -1, jnp.int32),
            rows_t=jnp.zeros((R.TROW, n)),
            tri=jnp.full((n,), -1, jnp.int32),
        )
        return sh, dropped

    payload = jnp.concatenate(
        [sh_c.color, sh_c.normal, sh_c.specular, sh_c.flow,
         bc_f(sh_c.instance)[None], bc_f(tri_c)[None], sh_c.rows_t], 0,
    )  # (15 + TROW, capacity)
    neg1 = jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
    fill = jnp.concatenate(
        [jnp.zeros((13, n)), jnp.full((2, n), neg1), jnp.zeros((R.TROW, n))],
        0,
    )
    # Pad lanes carry idx == n and are dropped by the scatter.
    out = fill.at[:, idx].set(payload, mode="drop")  # THE scatter
    sh = HitShade(
        color=out[0:4],
        normal=out[4:7],
        specular=out[7:10],
        flow=out[10:13],
        instance=bc_i(out[13]),
        rows_t=out[15 : 15 + R.TROW],
        tri=bc_i(out[14]),
    )
    return sh, dropped


def tangent_binormal(gt, vertex_normal):
    """Tangent + binormal (rt64_shader.cpp:201-225), world space, planar.

    UV-derived tangent with degenerate fallbacks; binormal handedness
    from UV winding (rt64_shader.cpp:218-224).
    """
    p0 = gt[R.T_P0 : R.T_P0 + 3]
    p1 = gt[R.T_P1 : R.T_P1 + 3]
    p2 = gt[R.T_P2 : R.T_P2 + 3]
    u0, v0 = gt[R.T_UV], gt[R.T_UV + 1]
    u1, v1 = gt[R.T_UV + 2], gt[R.T_UV + 3]
    u2, v2 = gt[R.T_UV + 4], gt[R.T_UV + 5]
    uva = u1 - u0
    uvb = u2 - u0
    uvc = v1 - v0
    uvd = v2 - v0
    uvk = uvb * uvc - uva * uvd
    dpos1 = p1 - p0
    dpos2 = p2 - p0
    t_main = vm.normalize(dpos2 * uvc[None] - dpos1 * uvd[None])
    t_a = vm.normalize(dpos1)
    t_b = vm.normalize(dpos2)
    tangent = jnp.where(
        (uvk != 0.0)[None],
        t_main,
        jnp.where(
            (uva != 0.0)[None], t_a,
            jnp.where((uvb != 0.0)[None], t_b, jnp.zeros_like(t_a)),
        ),
    )
    # cross(float3(duv1, 0), float3(duv2, 0)).z with both y negated.
    d1u, d1v = u1 - u0, -(v1 - v0)
    d2u, d2v = u2 - u1, -(v2 - v1)
    crz = d1u * d2v - d1v * d2u
    binormal_mult = jnp.where(crz < 0.0, -1.0, 1.0)
    binormal = vm.cross(tangent, vertex_normal) * binormal_mult[None]
    return tangent, binormal


def build_tri_rows(sb):
    """Per-frame world-space triangle rows — the TLAS-rebuild/BLAS-refit
    analog (driver builds at rt64_view.cpp:412-452, rt64_mesh.cpp:114-158).

    One fused program: gather vertex rows per corner + instance rows per
    triangle, transform to world space (row-vector convention), and lay
    out the TROW columns. Returns (tri_rows (T, TROW), rows_t (TROW, T)).
    """
    vr = [sb.vertex_rows[sb.tri_idx[:, k]].T for k in range(3)]  # (VROW, T) x3
    it = sb.instance_rows[sb.tri_instance].T  # (IROW, T)

    m3 = it[R.I_M3 : R.I_M3 + 9]
    tr = it[R.I_TR : R.I_TR + 3]
    nm3 = it[R.I_NM3 : R.I_NM3 + 9]
    pm3 = it[R.I_PM3 : R.I_PM3 + 9]
    ptr = it[R.I_PTR : R.I_PTR + 3]

    parts = []
    world = []
    for k in range(3):
        p = vr[k][R.V_POS : R.V_POS + 3]
        world.append(vm.mat3_apply(m3, p) + tr)
    parts += world
    for k in range(3):
        n = vr[k][R.V_NRM : R.V_NRM + 3]
        parts.append(vm.mat3_apply(nm3, n))
    # uv interleaved u0 v0 u1 v1 u2 v2
    parts.append(
        jnp.stack(
            [vr[0][R.V_UV], vr[0][R.V_UV + 1], vr[1][R.V_UV], vr[1][R.V_UV + 1],
             vr[2][R.V_UV], vr[2][R.V_UV + 1]], 0,
        )
    )
    for base in (R.V_IN1, R.V_IN2):
        parts.append(
            jnp.concatenate([vr[k][base : base + 4] for k in range(3)], 0)
        )
    for k in range(3):
        p = vr[k][R.V_POS : R.V_POS + 3]
        parts.append(vm.mat3_apply(pm3, p) + ptr)
    parts.append(sb.tri_instance.astype(jnp.float32)[None])
    parts.append(it[R.I_MAT : R.I_MAT + R.M_WIDTH])
    parts.append(it[R.I_CC][None])
    parts.append(it[R.I_FLAGS][None])
    parts.append(it[R.I_TEX_D][None])
    parts.append(it[R.I_TEX_N][None])
    parts.append(it[R.I_TEX_S][None])
    parts.append(it[R.I_SAMPLER][None])
    parts.append(it[R.I_ELIG : R.I_ELIG + R.MAX_ELIG_LIGHTS])
    parts.append(it[R.I_INPUT_COUNT][None])
    parts.append(it[R.I_TEX_D2][None])
    parts.append(it[R.I_REC : R.I_REC + 12])
    rows_t = jnp.concatenate(parts, axis=0)
    pad = R.TROW - rows_t.shape[0]
    assert pad >= 0, rows_t.shape
    if pad:
        rows_t = jnp.concatenate(
            [rows_t, jnp.zeros((pad, rows_t.shape[1]), rows_t.dtype)], 0
        )
    return rows_t.T, rows_t
