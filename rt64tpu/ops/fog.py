"""N64 fog (Fog.hlsli).

Per-hit fog color/alpha computed from per-instance material fields
(fogColor, fogMul, fogOffset, fogEnabled) gathered in the shading pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from rt64tpu.ops import math3d


def fog_from_camera(position, view, projection, fog_color, fog_mul, fog_offset):
    """ComputeFogFromCamera (Fog.hlsli:5-19): N64 clip-space fog.

    position: (..., 3) world; view/projection: (4, 4) row-vector.
    Returns (..., 4) rgba fog.
    """
    vp = view @ projection
    clip = math3d.transform_points_h(position, vp)
    z = clip[..., 2] * 2.0 - clip[..., 3]
    winv = 1.0 / jnp.maximum(clip[..., 3], 0.001)
    a = jnp.clip((z * winv * fog_mul + fog_offset) / 255.0, 0.0, 1.0)
    return jnp.concatenate([fog_color, a[..., None]], axis=-1)


def fog_from_origin(position, origin, fog_color, fog_mul, fog_offset):
    """ComputeFogFromOrigin (Fog.hlsli:21-29): distance fog."""
    dist = jnp.linalg.norm(position - origin, axis=-1)
    a = jnp.clip(((dist + fog_offset) / fog_mul) * 0.5, 0.0, 1.0)
    return jnp.concatenate([fog_color, a[..., None]], axis=-1)
