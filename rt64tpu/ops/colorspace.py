"""RGB <-> HSL conversions (Color.hlsli, sourced from shadertoy 4dKcWK)."""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-10


def hue_to_rgb(hue):
    """Hue [0..1] -> RGB [0..1]."""
    k = jnp.stack([hue * 6.0 - 3.0, hue * 6.0 - 2.0, hue * 6.0 - 4.0], axis=-1)
    rgb = jnp.abs(k) * jnp.asarray([1.0, -1.0, -1.0]) + jnp.asarray([-1.0, 2.0, 2.0])
    return jnp.clip(rgb, 0.0, 1.0)


def rgb_to_hcv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    cond = g < b
    px = jnp.where(cond, b, g)
    py = jnp.where(cond, g, b)
    pz = jnp.where(cond, -1.0, 0.0)
    pw = jnp.where(cond, 2.0 / 3.0, -1.0 / 3.0)
    cond2 = r < px
    qx = jnp.where(cond2, px, r)
    qy = py
    qz = jnp.where(cond2, pw, pz)
    qw = jnp.where(cond2, r, px)
    c = qx - jnp.minimum(qw, qy)
    h = jnp.abs((qw - qy) / (6.0 * c + _EPS) + qz)
    return jnp.stack([h, c, qx], axis=-1)


def hsl_to_rgb(hsl):
    rgb = hue_to_rgb(hsl[..., 0])
    c = (1.0 - jnp.abs(2.0 * hsl[..., 2] - 1.0)) * hsl[..., 1]
    return (rgb - 0.5) * c[..., None] + hsl[..., 2:3]


def rgb_to_hsl(rgb):
    hcv = rgb_to_hcv(rgb)
    z = hcv[..., 2] - hcv[..., 1] * 0.5
    s = hcv[..., 1] / (1.0 - jnp.abs(z * 2.0 - 1.0) + _EPS)
    return jnp.stack([hcv[..., 0], s, z], axis=-1)


def mod_rgb_with_hsl(rgb, hsl_mod):
    """ModRGBWithHSL (Color.hlsli:44-46)."""
    return jnp.clip(hsl_to_rgb(rgb_to_hsl(rgb) + hsl_mod), 0.0, 1.0)
