"""N64 fog (Fog.hlsli) — planar layout.

Per-hit fog alpha computed from material columns of the gathered
triangle rows; the fog color rides the same rows.
"""

from __future__ import annotations

import jax.numpy as jnp


def fog_alpha_from_camera(position, view, projection, fog_mul, fog_offset):
    """ComputeFogFromCamera (Fog.hlsli:5-19): N64 clip-space fog alpha.

    position: (3, N) world; view/projection: (4, 4) row-vector.
    """
    vp = view @ projection
    # clip = [p, 1] @ VP, planar.
    cz = position[0] * vp[0, 2] + position[1] * vp[1, 2] + position[2] * vp[2, 2] + vp[3, 2]
    cw = position[0] * vp[0, 3] + position[1] * vp[1, 3] + position[2] * vp[2, 3] + vp[3, 3]
    z = cz * 2.0 - cw
    winv = 1.0 / jnp.maximum(cw, 0.001)
    return jnp.clip((z * winv * fog_mul + fog_offset) / 255.0, 0.0, 1.0)


def fog_alpha_from_origin(position, origin, fog_mul, fog_offset):
    """ComputeFogFromOrigin (Fog.hlsli:21-29): distance fog alpha.

    position/origin: (3, N).
    """
    d = position - origin
    dist = jnp.sqrt((d * d).sum(0))
    return jnp.clip(((dist + fog_offset) / fog_mul) * 0.5, 0.0, 1.0)
