"""Direct lighting: light selection, area shadows — planar layout.

Vectorized equivalents of Lights.hlsli:
  * CalculateLightIntensitySimple (:56-67) over all (light, pixel)
    pairs at once, planar (L, N).
  * ComputeLightsRandom (:115-168): intensity-weighted selection
    without replacement, eligibility from host-precomputed per-instance
    light masks (exact uint32 semantics), probability compensation only
    when a single light is sampled.
  * ComputeLight (:70-113): blue-noise disk sampling of the light's
    point radius, diSamples shadow rays each.
  * TraceShadow (:27-53) built from the wavefront tracer + the shadow
    any-hit alpha rules (ops/shading.py shadow variant).

Light parameters are selected with L-way masked sums (L <= 16), never
gathers. The per-pixel inputs come straight from g-buffer planes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rt64tpu.ops import bluenoise
from rt64tpu.ops import shading as shade_ops
from rt64tpu.ops import tracer
from rt64tpu.ops import vecmath as vm
from rt64tpu.pipeline import rows as R

EPSILON = 1e-6  # Constants.hlsli
MAX_LIGHTS = 16  # Lights.hlsli:24


class LightingCtx(NamedTuple):
    """Per-point material inputs the lighting equations need — sliced
    from a triangle row or a g-buffer (instanceMaterials reads in
    Lights.hlsli / DirectRayGen)."""

    ignore_normal: jax.Array  # (N,)
    spec_exp: jax.Array  # (N,)
    shadow_ray_bias: jax.Array  # (N,)
    self_light: jax.Array  # (3, N)
    has_lighting: jax.Array  # (N,) bool
    eligibility: jax.Array  # (MAX_ELIG, N) 0/1


def ctx_from_rows(rows_t, valid):
    """Build a LightingCtx from gathered CONTEXT rows (R.CTXROW, N) —
    the compact column subset (rows.py CTX_*) the post-resolve
    full-width gathers carry (framegraph._row_of)."""
    flags = rows_t[R.CTX_FLAGS].astype(jnp.int32)
    return LightingCtx(
        ignore_normal=rows_t[R.CTX_IGNORE_NORMAL],
        spec_exp=rows_t[R.CTX_SPEC_EXP],
        shadow_ray_bias=rows_t[R.CTX_SHADOW_RAY_BIAS],
        self_light=rows_t[R.CTX_SELF_LIGHT : R.CTX_SELF_LIGHT + 3],
        has_lighting=((flags & R.F_HAS_LIGHTING) != 0) & valid,
        eligibility=rows_t[R.CTX_ELIG : R.CTX_ELIG + R.MAX_ELIG_LIGHTS]
        * valid[None].astype(rows_t.dtype),
    )


def trace_shadow_factor(
    sb, tri_rows, trace_scene, origins, dirs, t_min, t_max, noise_rand,
    k_alpha: int, opaque_fn=None, alpha_compact: int = 0,
    shade_boost: int = 1,
):
    """TraceShadow: 1 = lit, 0 = fully shadowed.

    Opaque-class hits block completely; alpha-class hits subtract their
    shadow alpha (payload.shadowHit accumulation is order-independent,
    rt64_shader.cpp:655-658, so a masked sum is exact). Returns
    (factor (N,), dropped int32 — alpha hits beyond shade capacity).

    When the scene statically has alpha geometry, the alpha side runs
    fully compacted: ONE slab cull + compaction, K-hit sweep + shadow
    shading in compacted space, and a single 1-row scatter of the
    summed shadow alpha (tracer.trace_alpha_to_compact) — the previous
    shape re-scattered (N, K) hit planes and re-compacted them per
    light sample."""
    n = origins.shape[1]
    if k_alpha > 0 and trace_scene.has_alpha is True:
        _, tri_op, _, t_opb = tracer.trace_opaque_only(
            origins, dirs, t_min, t_max, trace_scene,
            cull_backface=False, opaque_fn=opaque_fn,
        )
        blocked = tri_op >= 0
        # Blocked rays contribute nothing; the opaque-clamped alpha cull
        # (tracer.trace_alpha_to_compact) culls them outright, so the
        # live candidate set is small (measured ~2% on castle shadows).
        # Base 1/32 occupancy; the boost ladder grows QUADRATICALLY
        # here (clamped to the exact k*n bound), so the view's
        # re-specialization loop reaches full coverage in a few frames
        # even for pathological all-alpha shadow populations without
        # inflating the steady-state sweep width (the cap IS the sweep
        # cost; the merged tl+DI launch made n large).
        b = max(shade_boost, 1)
        cap = min(k_alpha * n, max(512, (k_alpha * n) // 32) * b * b)
        ac = tracer.trace_alpha_to_compact(
            origins, dirs, t_min, t_max, trace_scene, k_alpha,
            False, cap, noise_rand, t_opaque_biased=t_opb,
        )
        asum_c = jnp.zeros(ac.noise.shape)
        for s in range(k_alpha):
            hs = shade_ops.shade_hits(
                sb, tri_rows, ac.dirs, ac.tri[:, s], ac.uv[:, s, 0],
                ac.uv[:, s, 1], ac.noise, shadow_variant=True,
            )
            asum_c = asum_c + hs.color[3]
        alpha_sum = jnp.zeros((n,)).at[ac.idx].set(asum_c, mode="drop")
        factor = jnp.maximum(1.0 - alpha_sum, 0.0)
        return jnp.where(blocked, 0.0, factor), ac.dropped

    hits = tracer.trace_shadow(
        origins, dirs, t_min, t_max, trace_scene, k_alpha,
        opaque_fn=opaque_fn, alpha_compact=alpha_compact,
    )
    blocked = hits.tri_op >= 0
    dropped = hits.alpha_dropped
    if k_alpha > 0 and trace_scene.has_alpha is not False:
        tri_flat = hits.tri_a.T.reshape(-1)  # (K*N,)
        u_flat = hits.uv_a[..., 0].T.reshape(-1)
        v_flat = hits.uv_a[..., 1].T.reshape(-1)
        dirs_flat = jnp.tile(dirs, (1, k_alpha))
        # Alpha hits along shadow rays are ~1% of lanes: shade only the
        # hit lanes (compaction; overflow surfaced through `dropped`).
        # No lax.cond anywhere — conditionals fence the DMA schedule.
        # Capacity scales with the view's alpha_shade_boost so the
        # re-specialization loop (view.py:92-107) can actually converge
        # when shadow-ray alpha occupancy exceeds the 1/8 default.
        hs, sh_dropped = shade_ops.shade_hits_compacted(
            sb, tri_rows, dirs_flat, tri_flat, u_flat, v_flat,
            jnp.tile(noise_rand, k_alpha),
            max(512, (k_alpha * n) // 8) * max(shade_boost, 1),
            shadow_variant=True,
        )
        alpha_sum = hs.color[3].reshape(k_alpha, n).sum(0)
        dropped = dropped + sh_dropped
    else:
        alpha_sum = 0.0
    factor = jnp.maximum(1.0 - alpha_sum, 0.0)
    return jnp.where(blocked, 0.0, factor), dropped


def _light_col(sb, col):
    return sb.lights[:, col]  # (L,)


def _select_light(values, chosen):
    """values: (L,) per-light; chosen: (N,) light index -> (N,) via
    masked sum (no gather)."""
    L = values.shape[0]
    out = None
    for l in range(L):
        term = jnp.where(chosen == l, values[l], 0.0)
        out = term if out is None else out + term
    return out


def light_intensity_simple(sb, position, normal, ignore_normal):
    """CalculateLightIntensitySimple for all lights: (L, N)."""
    lp = sb.lights[:, 0:3]  # (L, 3)
    # position (3, N); build (L, N) quantities per component.
    dx = position[0][None, :] - lp[:, 0:1]
    dy = position[1][None, :] - lp[:, 1:2]
    dz = position[2][None, :] - lp[:, 2:3]
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv = 1.0 / jnp.maximum(dist, 1e-12)
    ndotl = -(normal[0][None] * dx + normal[1][None] * dy + normal[2][None] * dz) * inv
    inf = ignore_normal[None]
    surface_bias = jnp.maximum(ndotl + (1.0 - ndotl) * inf + 0.707106, 0.0)
    radius = sb.lights[:, 6:7]
    atten = sb.lights[:, 12:13]
    falloff = jnp.maximum(1.0 - dist / radius, 0.0)
    factor = jnp.power(falloff, atten) * surface_bias
    diffuse_sum = sb.lights[:, 3:6].sum(1, keepdims=True)
    return factor * diffuse_sum  # (L, N)


def _light_sample_terms(
    sb, pixel_xy, bn_table, frame_count,
    chosen,  # (N,) selected light index
    ray_dir,  # (3, N)
    position,  # (3, N)
    normal,  # (3, N)
    ctx: LightingCtx,
    di_samples: int,
    live,  # (N,) bool or None
):
    """ComputeLight (Lights.hlsli:70-113) WITHOUT the shadow trace: the
    cheap VPU half. Returns per-sample lambert/spec-dot terms plus the
    shadow ray batch (dirs (S, 3, N), t_max (S, N)) so the caller can
    trace ALL samples — across ALL selection rounds — in ONE kernel
    call. Splitting the trace out lets compute_lights_random batch
    every round x sample shadow ray into a single packet-tracer launch
    (one visit-list build, one alpha compaction, one shade site) where
    the fused form paid that fixed cost per round."""
    sel = lambda col: _select_light(sb.lights[:, col], chosen)
    lpos = jnp.stack([sel(0), sel(1), sel(2)], 0)
    ldiff = jnp.stack([sel(3), sel(4), sel(5)], 0)
    lrad = sel(6)
    lpoint = sel(7)
    lspec = jnp.stack([sel(8), sel(9), sel(10)], 0)
    loffset = sel(11)
    latten = sel(12)

    light_dir = vm.normalize(lpos - position)
    point_radius = lpoint if di_samples > 0 else jnp.zeros_like(lpoint)
    # perpX = cross(-lightDir, (0,1,0)); zero fallback sets x=1.
    perp_x = vm.cross(-light_dir, vm.splat((0.0, 1.0, 0.0), light_dir))
    all_zero = jnp.all(perp_x == 0.0, axis=0)
    perp_x = perp_x.at[0].set(jnp.where(all_zero, 1.0, perp_x[0]))
    perp_y = vm.cross(perp_x, -light_dir)

    max_samples = max(di_samples, 1)
    lamberts, specdots, dirs_s, tmax_s = [], [], [], []
    # Sample indices run max_samples..1 (the fold order the fused
    # implementation used — blue-noise frames must match exactly).
    for s in range(max_samples, 0, -1):
        bn = bluenoise.get_blue_noise(bn_table, pixel_xy,
                                      frame_count + jnp.int32(s))
        scx = bn[..., 0] * 2.0 - 1.0
        scy = bn[..., 1] * 2.0 - 1.0
        sc_len = jnp.sqrt(scx * scx + scy * scy)
        scale = jnp.clip(sc_len, 0.0, 1.0) / jnp.maximum(sc_len, 1e-12)
        scx = scx * scale
        scy = scy * scale
        sample_pos = (
            lpos + perp_x * (scx * point_radius)[None]
            + perp_y * (scy * point_radius)[None]
        )
        delta = sample_pos - position
        sample_dist = vm.length(delta)
        sample_dir = delta / jnp.maximum(sample_dist, 1e-12)[None]
        falloff = jnp.maximum(1.0 - sample_dist / lrad, 0.0)
        intensity = jnp.power(falloff, latten)
        reflected = vm.reflect(-sample_dir, normal)
        ndotl = jnp.maximum(vm.dot(normal, sample_dir), 0.0)
        s_lambert = (ndotl + (1.0 - ndotl) * ctx.ignore_normal) * intensity
        spec_dot = jnp.clip(vm.dot(reflected, -ray_dir) * intensity, 0.0, 1.0)
        s_tmax = sample_dist - loffset
        # A shadow ray whose diffuse AND specular terms are both
        # zero (out of light range, or backfacing with no glint)
        # multiplies the shadow factor into nothing — give it an
        # empty interval so whole ray blocks skip traversal in the
        # packet kernel and the alpha slab cull drops it. In the
        # castle scene most terrain pixels are beyond one of the
        # two light groups' radii, so this halves live shadow rays.
        contributes = (s_lambert > EPSILON) | (spec_dot > EPSILON)
        if live is not None:
            contributes = contributes & live
        s_tmax = jnp.where(contributes, s_tmax, -1.0)
        lamberts.append(s_lambert)
        specdots.append(spec_dot)
        dirs_s.append(sample_dir)
        tmax_s.append(s_tmax)
    return (ldiff, lspec, jnp.stack(lamberts), jnp.stack(specdots),
            jnp.stack(dirs_s), jnp.stack(tmax_s))


class LightPlan(NamedTuple):
    """Phase-1 output of the light loop (see plan_lights): the cheap
    selection/sampling terms plus this query's shadow-ray batch, so the
    CALLER can concatenate several queries' rays (DI + the transparent
    light + refraction's light...) into ONE packet-kernel launch."""

    rounds: tuple  # per-round (active, inv_prob, ldiff, lspec, lamb, sdot)
    origins: jax.Array  # (3, R*S*n) tiled ray origins
    dirs: jax.Array  # (3, R*S*n)
    t_min: jax.Array  # (R*S*n,)
    t_max: jax.Array  # (R*S*n,)
    noise: jax.Array  # (R*S*n,)
    specular: jax.Array  # (3, n)
    ctx: LightingCtx
    n: int
    max_samples: int
    max_light_count: int


def plan_lights(
    sb, pixel_xy, bn_table, frame_count, ray_dir, position, normal,
    specular, ctx: LightingCtx, max_light_count: int, di_samples: int,
    noise_rand,
):
    """Selection rounds + per-sample terms + the shadow-ray batch
    (ComputeLightsRandom phase 1, Lights.hlsli:115-168). No tracing."""
    L = sb.lights.shape[0]
    n = position.shape[1]

    in_range = (jnp.arange(L) < sb.light_count)[:, None]  # (L, 1)
    elig = ctx.eligibility[:L] > 0.0  # (L, N)
    intensities = light_intensity_simple(sb, position, normal, ctx.ignore_normal)
    candidate = in_range & elig & (intensities > EPSILON)
    # First-MAX_LIGHTS cap in light order (Lights.hlsli:127).
    ordinal = jnp.cumsum(candidate.astype(jnp.int32), axis=0) - 1
    candidate = candidate & (ordinal < MAX_LIGHTS)
    intens = jnp.where(candidate, intensities, 0.0)
    s_count = candidate.sum(axis=0)
    total = intens.sum(axis=0)
    sel_count = jnp.minimum(s_count, max_light_count)
    use_probability = sel_count == 1

    rounds = []
    dirs_all, tmax_all = [], []
    random_range, intens_work = total, intens
    for s in range(max_light_count):
        s = jnp.int32(s)
        active = (s < sel_count) & ctx.has_lighting
        r = bluenoise.get_blue_noise(bn_table, pixel_xy, frame_count + s)[..., 0]
        r = r * random_range
        csum = jnp.cumsum(intens_work, axis=0)
        over = (csum > r[None]) & (intens_work > 0.0)
        any_over = over.any(axis=0)
        first = jnp.argmax(over, axis=0)
        last = (L - 1) - jnp.argmax((intens_work > 0.0)[::-1], axis=0)
        chosen = jnp.where(any_over, first, last)
        onehot = jnp.arange(L)[:, None] == chosen[None]
        c_int = jnp.where(onehot, intens_work, 0.0).sum(0)
        inv_prob = jnp.where(
            use_probability, random_range / jnp.maximum(c_int, 1e-12), 1.0
        )
        ldiff, lspec, lamb, sdot, sdirs, stmax = _light_sample_terms(
            sb, pixel_xy, bn_table, frame_count, chosen, ray_dir,
            position, normal, ctx, di_samples,
            live=active,
        )
        rounds.append((active, inv_prob, ldiff, lspec, lamb, sdot))
        dirs_all.append(sdirs.transpose(1, 0, 2).reshape(3, -1))
        tmax_all.append(stmax.reshape(-1))
        random_range = random_range - jnp.where(active, c_int, 0.0)
        intens_work = jnp.where(onehot & active[None], 0.0, intens_work)

    max_samples = max(di_samples, 1)
    reps = max_light_count * max_samples
    # NOTE (measured): a pixel-major interleave of the (round, sample)
    # ray sets (so each packet block spans 1/reps the pixels) did NOT
    # pay: the repeat/transpose data-formatting ops cost ~2.8 ms/frame
    # at 480p while the kernel's visit count barely moved — set-major
    # concatenation keeps the ray planes layout-compatible with the
    # (3, N) sources (zero-copy concat).
    return LightPlan(
        rounds=tuple(rounds),
        origins=jnp.tile(position, (1, reps)),
        dirs=jnp.concatenate(dirs_all, axis=1),
        t_min=jnp.tile(tracer.RAY_MIN_DISTANCE + ctx.shadow_ray_bias, reps),
        t_max=jnp.concatenate(tmax_all),
        noise=jnp.tile(noise_rand, reps),
        specular=specular,
        ctx=ctx,
        n=n,
        max_samples=max_samples,
        max_light_count=max_light_count,
    )


def finish_lights(plan: LightPlan, factors):
    """Fold the traced shadow factors ((R*S*n,) flat, 1.0 when shadows
    are off) into the final light contribution (phase 3)."""
    n = plan.n
    factors = factors.reshape(plan.max_light_count, plan.max_samples, n)
    result = jnp.zeros((3, n))
    for i, (active, inv_prob, ldiff, lspec, lamb, sdot) in enumerate(
        plan.rounds
    ):
        lambert = lamb.sum(0) / plan.max_samples
        shadow_f = factors[i].sum(0) / plan.max_samples
        spec_f = (
            plan.specular[:, None, :]
            * jnp.power(sdot, plan.ctx.spec_exp[None])[None]
        ).sum(1) / plan.max_samples
        contrib = (ldiff * lambert[None] + lspec * spec_f) * shadow_f[None]
        result = result + jnp.where(
            active[None], contrib * inv_prob[None], 0.0
        )
    return jnp.where(plan.ctx.has_lighting[None], result, 0.0)


def trace_plans(plans, sb, tri_rows, trace_scene, shadow_k_alpha,
                opaque_fn=None, alpha_compact: int = 0,
                shade_boost: int = 1):
    """ONE batched shadow trace over several LightPlans' rays: one
    visit-list build, one occlusion launch, one alpha cull+compaction,
    one compacted shade — the fixed costs the per-query form paid per
    call site (the DI rounds, the transparent light, refraction's
    light). Returns per-plan factor arrays, plus the alpha-drop count.
    """
    widths = [p.dirs.shape[1] for p in plans]
    origins = jnp.concatenate([p.origins for p in plans], axis=1)
    dirs = jnp.concatenate([p.dirs for p in plans], axis=1)
    t_min = jnp.concatenate([p.t_min for p in plans])
    t_max = jnp.concatenate([p.t_max for p in plans])
    noise = jnp.concatenate([p.noise for p in plans])
    factors, dropped = trace_shadow_factor(
        sb, tri_rows, trace_scene, origins, dirs, t_min, t_max, noise,
        shadow_k_alpha, opaque_fn=opaque_fn, alpha_compact=alpha_compact,
        shade_boost=shade_boost,
    )
    outs = []
    off = 0
    for w in widths:
        outs.append(factors[off : off + w])
        off += w
    return outs, dropped


def compute_lights_random(
    sb, tri_rows, trace_scene, pixel_xy, bn_table, frame_count,
    ray_dir, position, normal, specular, ctx: LightingCtx,
    max_light_count: int, di_samples: int, check_shadows: bool,
    noise_rand, shadow_k_alpha: int = 1, opaque_fn=None,
    alpha_compact: int = 0, shade_boost: int = 1,
):
    """ComputeLightsRandom (Lights.hlsli:115-168), fully vectorized.

    Structure: the selection rounds run sequentially (cheap VPU math --
    selection without replacement), but every round's shadow rays are
    CONCATENATED and traced in ONE packet-kernel call: one visit-list
    build, one opaque occlusion launch, one alpha slab-cull+compaction,
    one compacted shade, one scatter -- where the per-round form paid
    each of those fixed costs max_light_count x di_samples times
    (profiled: the 2-light castle frame spent 8 ms across 3 shadow
    launches; batching merges their XLA pre/post passes too). Callers
    that have SEVERAL light queries in flight batch further with
    plan_lights / trace_plans / finish_lights."""
    plan = plan_lights(
        sb, pixel_xy, bn_table, frame_count, ray_dir, position, normal,
        specular, ctx, max_light_count, di_samples, noise_rand,
    )
    dropped = jnp.int32(0)
    if check_shadows:
        (factors,), dropped = trace_plans(
            [plan], sb, tri_rows, trace_scene, shadow_k_alpha,
            opaque_fn=opaque_fn,
            alpha_compact=alpha_compact * max_light_count
            * plan.max_samples,
            shade_boost=shade_boost,
        )
    else:
        factors = jnp.ones((plan.dirs.shape[1],))
    return finish_lights(plan, factors), dropped
