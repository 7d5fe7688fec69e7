"""N64 sky plane / background environment sampling (BgSky.hlsli) — planar.

The background plane is the raster-composited image the raytraced world
falls back to; the sky plane is the N64 skybox recreated from the
decompilation's 320x240-based math (BgSky.hlsli:8-11). Sky textures
sample through the quad pool's wrap/wrap records.
"""

from __future__ import annotations

import jax.numpy as jnp

from rt64tpu.ops import texture as tex_ops
from rt64tpu.ops.colorspace import mod_rgb_with_hsl

M_PI = 3.14159265
M_TWO_PI = M_PI * 2.0
SCREEN_WIDTH = 320
SCREEN_HEIGHT = 240
SKYBOX_WIDTH = 4 * SCREEN_WIDTH
SKYBOX_HEIGHT = 4 * SCREEN_HEIGHT


def fake_env_map_uv(ray_dir, yaw_offset):
    """FakeEnvMapUV (BgSky.hlsli:14-18). ray_dir: (3, N) -> (u, v)."""
    yaw = jnp.mod(
        yaw_offset + jnp.arctan2(ray_dir[0], -ray_dir[2]) + M_PI, M_TWO_PI
    )
    pitch = jnp.mod(
        jnp.arctan2(-ray_dir[1], jnp.sqrt(ray_dir[0] ** 2 + ray_dir[2] ** 2))
        + M_PI,
        M_TWO_PI,
    )
    return yaw / M_TWO_PI, pitch / M_TWO_PI


def compute_sky_plane_uv(su, sv, view_i, viewport_wh, yaw_offset):
    """ComputeSkyPlaneUV (BgSky.hlsli:20-52). su/sv: (N,) screen uv."""
    view_dir = view_i[2, :3]
    view_dir = view_dir / jnp.linalg.norm(view_dir)
    sky_yaw = jnp.mod(
        yaw_offset + jnp.arctan2(view_dir[0], -view_dir[2]) + M_PI, M_TWO_PI
    )
    base_x = SCREEN_WIDTH * 360.0 * (sky_yaw - M_PI) / (90.0 * M_PI * 2.0)
    sky_pitch = jnp.arctan2(
        -view_dir[1], jnp.sqrt(view_dir[0] ** 2 + view_dir[2] ** 2)
    )
    pitch_deg = sky_pitch * 360.0 / (M_PI * 2.0)
    base_y = 360.0 * pitch_deg / 90.0 + 5.0 * (SCREEN_HEIGHT / 2.0)
    base_y = jnp.clip(base_y, SCREEN_HEIGHT, SKYBOX_HEIGHT)
    aspect = viewport_wh[0] / viewport_wh[1]
    base_x = base_x + SCREEN_WIDTH / 2.0 - (SCREEN_HEIGHT * aspect) / 2.0
    base_x = base_x / SKYBOX_WIDTH
    base_y = (SKYBOX_HEIGHT - base_y) / SKYBOX_HEIGHT
    ratio_division = aspect / (4.0 / 3.0)
    return base_x + su * 0.25 * ratio_division, base_y + sv * 0.25


def _finish_sky(color, sky_diffuse_multiplier, sky_hsl_modifier):
    """color: (4, N). Applies multiplier + optional HSL mod."""
    rgb = color[:3] * jnp.asarray(sky_diffuse_multiplier).reshape(3, 1)
    any_hsl = jnp.any(jnp.asarray(sky_hsl_modifier) != 0.0)
    moded = mod_rgb_with_hsl(rgb.T, jnp.asarray(sky_hsl_modifier)).T
    rgb = jnp.where(any_hsl, moded, rgb)
    return jnp.concatenate([rgb, color[3:4]], axis=0)


def _sample_env_scalar_rec(pool, records, sky_rec, u, v):
    """sample_env with a per-frame SCALAR record id: the record row is
    fetched with one O(1) dynamic slice instead of a per-pixel gather
    (which costs per-row at frame scale). sky_rec may be () or (N,) —
    only lane 0 is used, matching the broadcast callers."""
    rec = jnp.asarray(sky_rec, jnp.int32).reshape(-1)[0]
    off, w, h = tex_ops.scalar_record(records, rec)
    n = u.shape
    return tex_ops.sample_quad_cols(
        pool, off, w, h, rec >= 0, u, v,
        jnp.broadcast_to(jnp.bool_(True), n),
        jnp.broadcast_to(jnp.int32(tex_ops.ADDR_WRAP), n),
        jnp.broadcast_to(jnp.int32(tex_ops.ADDR_WRAP), n),
    )


def sample_sky_2d(
    pool, records, sky_rec, su, sv, view_i, viewport_wh,
    yaw_offset, sky_diffuse_multiplier, sky_hsl_modifier,
):
    """SampleSky2D (BgSky.hlsli:54-70): (4, N); rec < 0 -> transparent."""
    u, v = compute_sky_plane_uv(su, sv, view_i, viewport_wh, yaw_offset)
    u = jnp.broadcast_to(u, su.shape)
    color = _sample_env_scalar_rec(pool, records, sky_rec, u, v)
    return _finish_sky(color, sky_diffuse_multiplier, sky_hsl_modifier)


def sample_sky_plane(
    pool, records, sky_rec, ray_dir, yaw_offset,
    sky_diffuse_multiplier, sky_hsl_modifier,
):
    """SampleSkyPlane (BgSky.hlsli:72-84): (4, N)."""
    u, v = fake_env_map_uv(ray_dir, yaw_offset)
    color = _sample_env_scalar_rec(pool, records, sky_rec, u, v)
    return _finish_sky(color, sky_diffuse_multiplier, sky_hsl_modifier)


def sample_background_2d(bg_planes, su, sv):
    """SampleBackground2D: bilinear sample of the raster background.

    bg_planes: (3, H, W) planar image; su/sv: (N,). Returns (3, N).

    Quad-packs the image (self/+x/+y/+xy neighbor planes, cheap
    elementwise shifts) so the bilinear fetch is ONE 12-row planar
    gather instead of four — TPU gathers cost per-row, and identical
    packs at multiple call sites CSE into one.
    """
    from rt64tpu.ops import filters

    packed = filters.quad_pack_planar(bg_planes)
    return filters.bilinear_quad(
        packed, 3, bg_planes.shape[1], bg_planes.shape[2], su, sv
    )


def sample_background_env(bg_planes, ray_dir):
    """SampleBackgroundAsEnvMap (BgSky.hlsli:94-96)."""
    u, v = fake_env_map_uv(ray_dir, 0.0)
    return sample_background_2d(bg_planes, u, v)
