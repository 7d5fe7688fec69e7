"""Texture atlas sampling: point/bilinear, wrap/mirror/clamp.

Replaces the descriptor-heap texture table (gTextures[512],
Textures.hlsli; heap layout rt64_common.h:34-122) and the 18 static
samplers indexed by filter x hAddr x vAddr (rt64_shader.cpp:142-149).
All textures live in one flat RGBA8 texel pool; a per-texture record
holds (offset, width, height). Sampling is vectorized address math +
four gathers — the four bilinear corners double as the nearest-point
candidates, so point filtering costs nothing extra.

Mipmaps are intentionally absent: the reference ships a GenerateMips
compute pass but constructs it under ``#if 0`` (rt64_device.cpp:758-762)
and force-disables it on AMD, so SampleGrad degenerates to bilinear.
"""

from __future__ import annotations

import jax.numpy as jnp

ADDR_WRAP = 0
ADDR_MIRROR = 1
ADDR_CLAMP = 2


def _address(i, size, mode):
    """Apply addressing mode to integer texel indices (vectorized)."""
    wrapped = jnp.remainder(i, size)
    m = jnp.remainder(i, 2 * size)
    mirrored = jnp.where(m < size, m, 2 * size - 1 - m)
    clamped = jnp.clip(i, 0, size - 1)
    return jnp.where(
        mode == ADDR_WRAP, wrapped, jnp.where(mode == ADDR_MIRROR, mirrored, clamped)
    )


def sample(pool, records, tex_index, uv, filter_linear, h_addr, v_addr):
    """Sample textures.

    Args:
      pool: (P, 4) uint8 RGBA texel pool.
      records: (Tex, 3) int32 — offset, width, height per texture.
      tex_index: (...,) int32 texture ids; negative -> transparent black.
      uv: (..., 2) float texture coordinates.
      filter_linear: (...,) bool or scalar — bilinear when True.
      h_addr / v_addr: (...,) int32 or scalar addressing modes.

    Returns: (..., 4) float32 in [0, 1].
    """
    safe_idx = jnp.maximum(tex_index, 0)
    rec = records[safe_idx]  # (..., 3)
    offset = rec[..., 0]
    w = rec[..., 1]
    h = rec[..., 2]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    x = uv[..., 0] * wf - 0.5
    y = uv[..., 1] * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    xs = [_address(x0, w, h_addr), _address(x0 + 1, w, h_addr)]
    ys = [_address(y0, h, v_addr), _address(y0 + 1, h, v_addr)]

    def fetch(xi, yi):
        flat = offset + yi * w + xi
        flat = jnp.clip(flat, 0, pool.shape[0] - 1)
        return pool[flat].astype(jnp.float32) * (1.0 / 255.0)

    c00 = fetch(xs[0], ys[0])
    c10 = fetch(xs[1], ys[0])
    c01 = fetch(xs[0], ys[1])
    c11 = fetch(xs[1], ys[1])

    fxe = fx[..., None]
    fye = fy[..., None]
    bilinear = (
        c00 * (1 - fxe) * (1 - fye)
        + c10 * fxe * (1 - fye)
        + c01 * (1 - fxe) * fye
        + c11 * fxe * fye
    )
    # Nearest texel is always one of the four corners.
    px = (fx >= 0.5)[..., None]
    py = (fy >= 0.5)[..., None]
    point = jnp.where(
        py, jnp.where(px, c11, c01), jnp.where(px, c10, c00)
    )
    lin = jnp.asarray(filter_linear)
    if lin.ndim < bilinear.ndim - 1:
        lin = jnp.broadcast_to(lin, bilinear.shape[:-1])
    out = jnp.where(lin[..., None], bilinear, point)
    return jnp.where((tex_index >= 0)[..., None], out, jnp.zeros_like(out))


def sample_env(pool, records, tex_index, uv):
    """Background/sky sampler s0 analog: bilinear + wrap."""
    return sample(
        pool, records, tex_index, uv,
        filter_linear=jnp.bool_(True),
        h_addr=jnp.int32(ADDR_WRAP),
        v_addr=jnp.int32(ADDR_WRAP),
    )
