"""Planar 3-vector math: components on axis 0, shape (3, ...).

Trailing-dim-3 vectors are hostile to TPU tiling (the minor dimension
pads to the 128-lane tile); stacking components on the LEADING axis
keeps every elementwise op a full-width VPU op. These helpers make the
planar form readable.
"""

from __future__ import annotations

import jax.numpy as jnp


def v3(x, y, z):
    return jnp.stack([x, y, z], axis=0)


def pvary(x):
    """Mark x varying over every manual (shard_map) axis currently
    bound; a no-op outside shard_map.

    scan/fori carries initialized from replicated constants but updated
    with device-varying data trip shard_map's varying-axis check
    (check_vma) because the carry's input and output VMA types differ.
    Wrapping the init with this helper states the intent explicitly —
    the carry is per-device data — instead of silencing the checker.
    """
    import jax
    from jax._src import core  # no public alias for get_axis_env yet

    names = tuple(core.get_axis_env().axis_names())
    if not names:
        return x
    return jax.tree.map(
        lambda a: jax.lax.pcast(a, names, to="varying"), x
    )


def splat(c, like):
    """Constant (3,) vector broadcast against `like` (3, ...)."""
    c = jnp.asarray(c, like.dtype)
    return c.reshape((3,) + (1,) * (like.ndim - 1))


def dot(a, b):
    return (a * b).sum(axis=0)


def cross(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        axis=0,
    )


def length(a, eps=0.0):
    n = jnp.sqrt(dot(a, a))
    return jnp.maximum(n, eps) if eps else n


def normalize(a, eps=1e-12):
    return a / jnp.maximum(length(a), eps)[None]


def reflect(d, n):
    return d - 2.0 * dot(d, n)[None] * n


def mat3_apply(rows9, v):
    """Row-vector 3x3 transform: out = v @ M.

    rows9: (9, ...) the 3x3 in row-major order (rows of M);
    v: (3, ...). out_j = sum_i v_i * M[i, j].
    """
    return jnp.stack(
        [
            v[0] * rows9[0] + v[1] * rows9[3] + v[2] * rows9[6],
            v[0] * rows9[1] + v[1] * rows9[4] + v[2] * rows9[7],
            v[0] * rows9[2] + v[1] * rows9[5] + v[2] * rows9[8],
        ],
        axis=0,
    )


def lerp(a, b, t):
    return a + (b - a) * t
