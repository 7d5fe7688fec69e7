"""N64 sky plane / background environment sampling (BgSky.hlsli) — planar.

The background plane is the raster-composited image the raytraced world
falls back to; the sky plane is the N64 skybox recreated from the
decompilation's 320x240-based math (BgSky.hlsli:8-11). Sky textures
sample through the quad pool's wrap/wrap records.
"""

from __future__ import annotations

import jax
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


def _wrap_band(n_out: int, n_in: int, off, step):
    """(n_out, n_in) bilinear weight matrix for the uniform coordinate
    grid x_i = off + i*step (continuous texel coords, TRACED scalars)
    under WRAP addressing — exactly sample_quad_cols' _remap(wrap) +
    floor/frac with the baked mod-(n_in) +1 neighbor
    (scene_buffers.build_quad_entries). Built elementwise so the sample
    itself is one banded matmul on the MXU instead of a per-pixel
    quad-pool gather (gathers cost per-row at frame scale)."""
    x = off + step * jnp.arange(n_out, dtype=jnp.float32)
    x = jnp.mod(x, jnp.float32(n_in))
    x0f = jnp.floor(x)
    f = x - x0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, n_in - 1)
    x1 = jnp.mod(x0 + 1, n_in)
    j = jnp.arange(n_in, dtype=jnp.int32)[None, :]
    return (
        (j == x0[:, None]) * (1.0 - f)[:, None]
        + (j == x1[:, None]) * f[:, None]
    ).astype(jnp.float32)


def sample_sky_2d_grid(
    sky_plane, sky_rec, jitter, view_i, viewport_wh, yaw_offset,
    sky_diffuse_multiplier, sky_hsl_modifier,
    w: int, h: int, grid_height: int, row_offset=0,
):
    """SampleSky2D on the REGULAR pixel grid as a separable resample.

    ComputeSkyPlaneUV (BgSky.hlsli:20-52) is AFFINE in screen uv:
    u = base_x + su*0.25*ratio, v = base_y + sv*0.25 — so sampling it
    per pixel is a fixed-grid rectangle blit of the sky texture, which
    two banded wrap-bilinear matmuls do on the MXU with no gather at
    all (the per-pixel quad-pool gather profiled ~2 ms/frame at 480p).
    sky_plane: (4, Ht, Wt) f32 dense texture (SceneBuffers.sky_plane);
    su/sv follow render_frame's grid: su=(px+jx)/w, sv=(py+jy)/grid_height
    with py global (row_offset..row_offset+h-1). Returns (4, h*w)."""
    c, ht, wt = sky_plane.shape
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

    # u = base_x + (px + jx)/w * 0.25*rd  ->  texel x = u*Wt - 0.5
    step_x = 0.25 * ratio_division / w * wt
    off_x = (base_x + jitter[0] / w * 0.25 * ratio_division) * wt - 0.5
    step_y = 0.25 / grid_height * ht
    off_y = (
        base_y + (jitter[1] + row_offset) / grid_height * 0.25
    ) * ht - 0.5
    cm = _wrap_band(w, wt, off_x, step_x)  # (w, Wt)
    rm = _wrap_band(h, ht, off_y, step_y)  # (h, Ht)
    t = jnp.einsum("oh,chw->cow", rm, sky_plane,
                   precision=jax.lax.Precision.HIGHEST)
    img = jnp.einsum("cow,pw->cop", t, cm,
                     precision=jax.lax.Precision.HIGHEST)
    color = img.reshape(c, h * w)
    # Runtime no-sky gate (rec < 0 -> transparent), matching
    # _sample_env_scalar_rec's valid mask.
    color = color * (jnp.asarray(sky_rec, jnp.int32) >= 0)
    return _finish_sky(color, sky_diffuse_multiplier, sky_hsl_modifier)


def sample_background_grid(bg_planes, jx, jy):
    """SampleBackground2D on the regular pixel grid: a uniform
    (jx-0.5, jy-0.5) texel shift of the plane itself, done as an
    edge-padded dynamic window + 4-tap scalar-weight blend — pure
    elementwise, no gather (bilinear_quad on this grid profiled
    ~0.9 ms/frame at 480p). Matches bilinear_quad's clip/floor math:
    both taps collapse onto the edge texel outside the image.
    bg_planes: (3, H, W); returns (3, H*W)."""
    c, h, w = bg_planes.shape
    dx = jx - 0.5
    dy = jy - 0.5
    x0 = jnp.clip(jnp.floor(dx), -1.0, 0.0)
    y0 = jnp.clip(jnp.floor(dy), -1.0, 0.0)
    fx = dx - x0
    fy = dy - y0
    pad = jnp.pad(bg_planes, ((0, 0), (1, 1), (1, 1)), mode="edge")
    win = jax.lax.dynamic_slice(
        pad,
        (0, (1 + y0).astype(jnp.int32), (1 + x0).astype(jnp.int32)),
        (c, h + 1, w + 1),
    )
    out = (
        win[:, :h, :w] * ((1 - fx) * (1 - fy))
        + win[:, :h, 1:] * (fx * (1 - fy))
        + win[:, 1:, :w] * ((1 - fx) * fy)
        + win[:, 1:, 1:] * (fx * fy)
    )
    return out.reshape(c, h * w)


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
