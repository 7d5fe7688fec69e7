"""TEA hash + LCG (Random.hlsli, from intro-to-dxr.cwyman.org).

Used for the combiner noise option (rt64_shader.cpp:513-516) and the
instance-id visualization colors (DebugPS.hlsl).
"""

from __future__ import annotations

import jax.numpy as jnp


def init_rand(val0, val1, backoff: int = 16):
    """initRand: TEA hash of two uint32 inputs."""
    v0 = jnp.asarray(val0, jnp.uint32)
    v1 = jnp.asarray(val1, jnp.uint32)
    s0 = jnp.uint32(0)
    for _ in range(backoff):
        s0 = s0 + jnp.uint32(0x9E3779B9)
        v0 = v0 + (
            ((v1 << 4) + jnp.uint32(0xA341316C))
            ^ (v1 + s0)
            ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << 4) + jnp.uint32(0xAD90777D))
            ^ (v0 + s0)
            ^ ((v0 >> 5) + jnp.uint32(0x7E95761E))
        )
    return v0


def next_rand(seed):
    """nextRand: LCG step; returns (new_seed, float in [0, 1))."""
    seed = jnp.uint32(1664525) * seed + jnp.uint32(1013904223)
    val = (seed & jnp.uint32(0x00FFFFFF)).astype(jnp.float32) / jnp.float32(0x01000000)
    return seed, val


def perpendicular_vector(u):
    """getPerpendicularVector (Random.hlsli:40-48)."""
    a = jnp.abs(u)
    xm = ((a[..., 0] - a[..., 1]) < 0) & ((a[..., 0] - a[..., 2]) < 0)
    ym = ((a[..., 1] - a[..., 2]) < 0) & ~xm
    zm = ~(xm | ym)
    basis = jnp.stack(
        [xm.astype(u.dtype), ym.astype(u.dtype), zm.astype(u.dtype)], axis=-1
    )
    return jnp.cross(u, basis)


def cos_hemisphere_sample(rand_xy, normal):
    """Cosine-weighted hemisphere direction around normal.

    Matches getCosHemisphereSampleBlueNoise (IndirectRayGen.hlsl:17-29):
    bitangent = perp(n), tangent = cross(bitangent, n).
    """
    bitangent = perpendicular_vector(normal)
    tangent = jnp.cross(bitangent, normal)
    r = jnp.sqrt(rand_xy[..., 0])
    phi = 2.0 * jnp.pi * rand_xy[..., 1]
    return (
        tangent * (r * jnp.cos(phi))[..., None]
        + bitangent * (r * jnp.sin(phi))[..., None]
        + normal * jnp.sqrt(jnp.maximum(0.0, 1.0 - rand_xy[..., 0]))[..., None]
    )
