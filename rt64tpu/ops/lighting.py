"""Direct lighting: light selection, area shadows, eye light.

Vectorized equivalents of Lights.hlsli:
  * CalculateLightIntensitySimple (:56-67) over all (pixel, light)
    pairs at once.
  * ComputeLightsRandom (:115-168): intensity-weighted selection
    without replacement, capped at MAX_LIGHTS candidates, probability
    compensation only when a single light is sampled.
  * ComputeLight (:70-113): blue-noise disk sampling of the light's
    point radius, diSamples shadow rays each.
  * TraceShadow (:27-53) built from the wavefront tracer + the shadow
    any-hit alpha rules.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from rt64tpu.ops import bluenoise
from rt64tpu.ops import shading as shade_ops
from rt64tpu.ops import tracer
from rt64tpu.pipeline import scene_buffers as sbuf

EPSILON = 1e-6  # Constants.hlsli
MAX_LIGHTS = 16  # Lights.hlsli:24


def trace_shadow_factor(
    sb, world, trace_scene, origins, dirs, t_min, t_max, noise_rand, k_alpha: int
):
    """TraceShadow: 1 = lit, 0 = fully shadowed.

    Opaque-class hits block completely; alpha-class hits subtract their
    shadow alpha (payload.shadowHit accumulation is order-independent,
    rt64_shader.cpp:655-658, so a masked sum is exact).
    """
    hits = tracer.trace_shadow(origins, dirs, t_min, t_max, trace_scene, k_alpha)
    blocked = hits.tri_op >= 0
    if k_alpha > 0:
        hs = shade_ops.shade_hits(
            sb,
            world,
            dirs[..., None, :],
            hits.tri_a,
            hits.uv_a,
            noise_rand[..., None],
            shadow_variant=True,
        )
        alpha_sum = hs.color[..., 3].sum(-1)
    else:
        alpha_sum = 0.0
    factor = jnp.maximum(1.0 - alpha_sum, 0.0)
    return jnp.where(blocked, 0.0, factor)


def _light_cols(lights):
    return dict(
        position=lights[..., 0:3],
        diffuse=lights[..., 3:6],
        radius=lights[..., 6],
        point_radius=lights[..., 7],
        specular=lights[..., 8:11],
        shadow_offset=lights[..., 11],
        attenuation=lights[..., 12],
    )


def light_intensity_simple(sb, position, normal, ignore_normal_factor):
    """CalculateLightIntensitySimple for all lights: (N, L)."""
    lc = _light_cols(sb.lights)
    lp = lc["position"][None]  # (1, L, 3)
    delta = position[:, None, :] - lp
    dist = jnp.linalg.norm(delta, axis=-1)
    ldir = -delta / jnp.maximum(dist[..., None], 1e-12)
    ndotl = jnp.sum(normal[:, None, :] * ldir, axis=-1)
    inf = ignore_normal_factor[:, None]
    surface_bias = jnp.maximum(ndotl + (1.0 - ndotl) * inf + 0.707106, 0.0)
    falloff = jnp.maximum(1.0 - dist / lc["radius"][None], 0.0)
    factor = jnp.power(falloff, lc["attenuation"][None]) * surface_bias
    return factor * lc["diffuse"][None].sum(-1)


def compute_light(
    sb,
    world,
    trace_scene,
    pixel_xy,
    bn_table,
    frame_count,
    light_idx,  # (N,) selected light per pixel
    ray_dir,
    position,
    normal,
    specular,
    mat_f,  # per-pixel gathered material floats (N, MAT_WIDTH)
    di_samples: int,
    check_shadows: bool,
    noise_rand,
    shadow_k_alpha: int,
):
    """ComputeLight (Lights.hlsli:70-113) for one selected light/pixel."""
    li = sb.lights[light_idx]
    lc = _light_cols(li)
    ignore_nf = mat_f[..., sbuf.MAT_IGNORE_NORMAL]
    spec_exp = mat_f[..., sbuf.MAT_SPECULAR_EXP]
    shadow_ray_bias = mat_f[..., sbuf.MAT_SHADOW_RAY_BIAS]

    light_dir = lc["position"] - position
    light_dir = light_dir / jnp.maximum(
        jnp.linalg.norm(light_dir, axis=-1, keepdims=True), 1e-12
    )
    point_radius = jnp.where(di_samples > 0, lc["point_radius"], 0.0)
    perp_x = jnp.cross(-light_dir, jnp.asarray([0.0, 1.0, 0.0]))
    all_zero = jnp.all(perp_x == 0.0, axis=-1, keepdims=True)
    perp_x = jnp.where(
        all_zero, perp_x + jnp.asarray([1.0, 0.0, 0.0]), perp_x
    )
    perp_y = jnp.cross(perp_x, -light_dir)

    import jax

    max_samples = max(di_samples, 1)

    def sample_body(carry, s):
        lambert, spec_f, shadow_f = carry
        bn = bluenoise.get_blue_noise(bn_table, pixel_xy, frame_count + s)
        sc = bn[..., :2] * 2.0 - 1.0
        sc_len = jnp.linalg.norm(sc, axis=-1, keepdims=True)
        sc = sc / jnp.maximum(sc_len, 1e-12) * jnp.clip(sc_len, 0.0, 1.0)
        sample_pos = (
            lc["position"]
            + perp_x * (sc[..., 0] * point_radius)[..., None]
            + perp_y * (sc[..., 1] * point_radius)[..., None]
        )
        delta = sample_pos - position
        sample_dist = jnp.linalg.norm(delta, axis=-1)
        sample_dir = delta / jnp.maximum(sample_dist[..., None], 1e-12)
        falloff = jnp.maximum(1.0 - sample_dist / lc["radius"], 0.0)
        intensity = jnp.power(falloff, lc["attenuation"])
        reflected = _reflect(-sample_dir, normal)
        ndotl = jnp.maximum(jnp.sum(normal * sample_dir, axis=-1), 0.0)
        s_lambert = (ndotl + (1.0 - ndotl) * ignore_nf) * intensity
        if check_shadows:
            s_shadow = trace_shadow_factor(
                sb,
                world,
                trace_scene,
                position,
                sample_dir,
                tracer.RAY_MIN_DISTANCE + shadow_ray_bias,
                sample_dist - lc["shadow_offset"],
                noise_rand,
                shadow_k_alpha,
            )
        else:
            s_shadow = jnp.ones_like(s_lambert)
        spec_dot = jnp.clip(
            jnp.sum(reflected * (-ray_dir), axis=-1) * intensity, 0.0, 1.0
        )
        s_spec = specular * jnp.power(jnp.maximum(spec_dot, 0.0), spec_exp)[..., None]
        lambert = lambert + s_lambert / max_samples
        spec_f = spec_f + s_spec / max_samples
        shadow_f = shadow_f + s_shadow / max_samples
        return (lambert, spec_f, shadow_f), None

    init = (
        jnp.zeros(position.shape[:-1]),
        jnp.zeros_like(specular),
        jnp.zeros(position.shape[:-1]),
    )
    (lambert, spec_f, shadow_f), _ = jax.lax.scan(
        sample_body, init, jnp.arange(max_samples, 0, -1, dtype=jnp.int32)
    )
    return (
        lc["diffuse"] * lambert[..., None] + lc["specular"] * spec_f
    ) * shadow_f[..., None]


def _reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def compute_lights_random(
    sb,
    world,
    trace_scene,
    pixel_xy,
    bn_table,
    frame_count,
    ray_dir,
    instance,  # (N,) int32 instance ids
    position,
    normal,
    specular,
    max_light_count: int,
    di_samples: int,
    check_shadows: bool,
    noise_rand,
    shadow_k_alpha: int = 2,
):
    """ComputeLightsRandom (Lights.hlsli:115-168), fully vectorized."""
    n = position.shape[0]
    L = sb.lights.shape[0]
    inst_s = jnp.maximum(instance, 0)
    mat_f = sb.mat_f[inst_s]
    group_mask = sb.light_groups_inst[inst_s]
    has_lighting = (group_mask > 0) & (instance >= 0)

    in_range = jnp.arange(L)[None, :] < sb.light_count
    group_ok = (group_mask[:, None] & sb.light_groups[None, :]) > 0
    intensities = light_intensity_simple(
        sb, position, normal, mat_f[..., sbuf.MAT_IGNORE_NORMAL]
    )
    candidate = in_range & group_ok & (intensities > EPSILON)
    # First-MAX_LIGHTS cap in light order (Lights.hlsli:127).
    ordinal = jnp.cumsum(candidate.astype(jnp.int32), axis=1) - 1
    candidate = candidate & (ordinal < MAX_LIGHTS)
    intens = jnp.where(candidate, intensities, 0.0)
    s_count = candidate.sum(axis=1)
    total = intens.sum(axis=1)

    sel_count = jnp.minimum(s_count, max_light_count)
    use_probability = sel_count == 1

    import jax

    def body(carry, s):
        result, random_range, intens_work = carry
        active = (s < sel_count) & has_lighting
        r = bluenoise.get_blue_noise(bn_table, pixel_xy, frame_count + s)[..., 0]
        r = r * random_range
        csum = jnp.cumsum(intens_work, axis=1)
        over = (csum > r[:, None]) & (intens_work > 0.0)
        any_over = over.any(axis=1)
        first = jnp.argmax(over, axis=1)
        # Fallback: last remaining candidate (walk clamps at count-1).
        last = (L - 1) - jnp.argmax((intens_work > 0.0)[:, ::-1], axis=1)
        chosen = jnp.where(any_over, first, last)
        c_int = jnp.take_along_axis(intens_work, chosen[:, None], axis=1)[:, 0]
        inv_prob = jnp.where(
            use_probability, random_range / jnp.maximum(c_int, 1e-12), 1.0
        )
        contrib = compute_light(
            sb, world, trace_scene, pixel_xy, bn_table, frame_count,
            chosen, ray_dir, position, normal, specular, mat_f,
            di_samples, check_shadows, noise_rand, shadow_k_alpha,
        )
        result = result + jnp.where(
            active[..., None], contrib * inv_prob[..., None], 0.0
        )
        # Remove the chosen light (without replacement).
        onehot = jnp.arange(L)[None, :] == chosen[:, None]
        random_range = random_range - jnp.where(active, c_int, 0.0)
        intens_work = jnp.where(onehot & active[:, None], 0.0, intens_work)
        return (result, random_range, intens_work), None

    init = (jnp.zeros_like(position), total, intens)
    (result, _, _), _ = jax.lax.scan(
        body, init, jnp.arange(max_light_count, dtype=jnp.int32)
    )
    return jnp.where(has_lighting[..., None], result, 0.0)
