"""N64 sky plane / background environment sampling (BgSky.hlsli).

The background plane is a raster-composited texture the raytraced world
falls back to; the sky plane is the N64 skybox recreated from the
decompilation's 320x240-based math (BgSky.hlsli:8-11).
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
    """FakeEnvMapUV (BgSky.hlsli:14-18)."""
    yaw = jnp.mod(
        yaw_offset + jnp.arctan2(ray_dir[..., 0], -ray_dir[..., 2]) + M_PI, M_TWO_PI
    )
    pitch = jnp.mod(
        jnp.arctan2(
            -ray_dir[..., 1],
            jnp.sqrt(ray_dir[..., 0] ** 2 + ray_dir[..., 2] ** 2),
        )
        + M_PI,
        M_TWO_PI,
    )
    return jnp.stack([yaw / M_TWO_PI, pitch / M_TWO_PI], axis=-1)


def compute_sky_plane_uv(uv, view_i, viewport_wh, yaw_offset):
    """ComputeSkyPlaneUV (BgSky.hlsli:20-52).

    uv: (..., 2) screen uv; view_i: (4, 4) row-vector inverse view.
    """
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
    out_x = base_x + uv[..., 0] * 0.25 * ratio_division
    out_y = base_y + uv[..., 1] * 0.25
    return jnp.stack([jnp.broadcast_to(out_x, uv[..., 0].shape), out_y], axis=-1)


def _finish_sky(color, sky_diffuse_multiplier, sky_hsl_modifier):
    rgb = color[..., :3] * sky_diffuse_multiplier
    any_hsl = jnp.any(jnp.asarray(sky_hsl_modifier) != 0.0)
    rgb = jnp.where(any_hsl, mod_rgb_with_hsl(rgb, sky_hsl_modifier), rgb)
    return jnp.concatenate([rgb, color[..., 3:4]], axis=-1)


def sample_sky_2d(
    pool, records, sky_tex_index, screen_uv, view_i, viewport_wh,
    yaw_offset, sky_diffuse_multiplier, sky_hsl_modifier,
):
    """SampleSky2D (BgSky.hlsli:54-70). sky_tex_index < 0 -> transparent."""
    uv = compute_sky_plane_uv(screen_uv, view_i, viewport_wh, yaw_offset)
    idx = jnp.broadcast_to(jnp.asarray(sky_tex_index, jnp.int32), uv.shape[:-1])
    color = tex_ops.sample_env(pool, records, idx, uv)
    return _finish_sky(color, sky_diffuse_multiplier, sky_hsl_modifier)


def sample_sky_plane(
    pool, records, sky_tex_index, ray_dir, yaw_offset,
    sky_diffuse_multiplier, sky_hsl_modifier,
):
    """SampleSkyPlane (BgSky.hlsli:72-84)."""
    uv = fake_env_map_uv(ray_dir, yaw_offset)
    idx = jnp.broadcast_to(jnp.asarray(sky_tex_index, jnp.int32), uv.shape[:-1])
    color = tex_ops.sample_env(pool, records, idx, uv)
    return _finish_sky(color, sky_diffuse_multiplier, sky_hsl_modifier)


def sample_background_2d(bg_image, screen_uv):
    """SampleBackground2D: bilinear sample of the raster background
    plane (H, W, 3/4)."""
    h, w = bg_image.shape[0], bg_image.shape[1]
    x = jnp.clip(screen_uv[..., 0] * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(screen_uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    c00 = bg_image[y0, x0]
    c10 = bg_image[y0, x1]
    c01 = bg_image[y1, x0]
    c11 = bg_image[y1, x1]
    out = (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
    return out[..., :3]


def sample_background_env(bg_image, ray_dir):
    """SampleBackgroundAsEnvMap (BgSky.hlsli:94-96)."""
    return sample_background_2d(bg_image, fake_env_map_uv(ray_dir, 0.0))
