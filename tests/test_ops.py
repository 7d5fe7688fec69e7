"""Unit tests for the smaller shading ops vs NumPy references."""

import numpy as np
import jax.numpy as jnp

from rt64tpu.ops import colorspace, fog, sky, mipmaps
from rt64tpu.ops import random as rnd


def test_rgb_hsl_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((64, 3)).astype(np.float32))
    back = colorspace.hsl_to_rgb(colorspace.rgb_to_hsl(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-3)


def test_hsl_mod_identity_when_zero():
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.random((32, 3)).astype(np.float32))
    out = colorspace.mod_rgb_with_hsl(rgb, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=2e-3)


def test_fog_from_camera_range():
    from rt64tpu.ops import math3d

    view = math3d.look_at_rh((0, 0, 10), (0, 0, 0), (0, 1, 0))
    proj = math3d.perspective_fov_rh(0.8, 1.0, 0.1, 100.0)
    # Points receding from the camera gain fog alpha monotonically.
    zs = np.linspace(0, -60, 8)
    pos = jnp.asarray(np.stack([np.zeros(8), np.zeros(8), zs], 0), jnp.float32)
    a = fog.fog_alpha_from_camera(
        pos, jnp.asarray(view), jnp.asarray(proj),
        jnp.full(8, 120.0), jnp.full(8, 30.0),
    )
    a = np.asarray(a)
    assert np.all(np.diff(a) >= -1e-5)
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_fog_from_origin_formula():
    pos = jnp.asarray([[3.0], [0.0], [0.0]])
    origin = jnp.asarray([[0.0], [0.0], [0.0]])
    a = fog.fog_alpha_from_origin(pos, origin, jnp.asarray([10.0]), jnp.asarray([2.0]))
    np.testing.assert_allclose(np.asarray(a), [(3 + 2) / 10 * 0.5], rtol=1e-6)


def test_fake_env_map_uv_ranges():
    rng = np.random.default_rng(2)
    d = rng.normal(0, 1, (3, 256)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    u, v = sky.fake_env_map_uv(jnp.asarray(d), 0.3)
    u, v = np.asarray(u), np.asarray(v)
    assert u.min() >= 0 and u.max() <= 1
    assert v.min() >= 0 and v.max() <= 1
    # Yaw offset rotates u.
    u2, _ = sky.fake_env_map_uv(jnp.asarray(d), 0.3 + np.pi)
    du = np.abs((np.asarray(u2) - u + 0.5) % 1.0 - 0.5)
    np.testing.assert_allclose(du, 0.5, atol=1e-4)


def test_tea_hash_matches_reference_constants():
    # initRand with the documented TEA schedule must be deterministic
    # and avalanche: different inputs give unrelated outputs.
    a = int(np.asarray(rnd.init_rand(jnp.uint32(1), jnp.uint32(2))))
    b = int(np.asarray(rnd.init_rand(jnp.uint32(1), jnp.uint32(3))))
    c = int(np.asarray(rnd.init_rand(jnp.uint32(1), jnp.uint32(2))))
    assert a == c and a != b
    seed, val = rnd.next_rand(jnp.uint32(a))
    assert 0.0 <= float(val) < 1.0


def test_cos_hemisphere_distribution():
    rng = np.random.default_rng(3)
    n = 4096
    r = jnp.asarray(rng.random((2, n)).astype(np.float32))
    normal = jnp.broadcast_to(jnp.asarray([[0.0], [1.0], [0.0]]), (3, n))
    d = rnd.cos_hemisphere_sample(
        jnp.stack([r[0], r[1]], -1), normal.T.reshape(n, 3)
    )
    d = np.asarray(d)
    assert (d[:, 1] >= -1e-5).all()  # upper hemisphere
    # cosine-weighted: mean of cos(theta) = 2/3
    assert abs(d[:, 1].mean() - 2 / 3) < 0.02


def test_mipmap_chain():
    img = np.zeros((16, 8, 4), np.uint8)
    img[:8] = 255
    levels = mipmaps.generate_mips(img)
    assert levels[1].shape == (8, 4, 4)
    assert levels[-1].shape[:2] == (1, 1)
    # Full-chain average preserved.
    np.testing.assert_allclose(levels[-1][0, 0], img.reshape(-1, 4).mean(0), atol=1.0)


def test_dds_bc1_decode():
    import struct
    from rt64tpu.utils.assets import decode_dds

    # One BC1 block: c0=red(565), c1=blue, all indices 0 -> red texels.
    c0 = 0xF800
    c1 = 0x001F
    buf = bytearray(128)
    struct.pack_into("<4s", buf, 0, b"DDS ")
    struct.pack_into("<I", buf, 4, 124)  # header size
    struct.pack_into("<3I", buf, 8, 0x1007, 4, 4)  # flags, height, width
    struct.pack_into("<I", buf, 76, 32)  # pixelformat size
    struct.pack_into("<I", buf, 80, 0x4)  # DDPF_FOURCC
    struct.pack_into("<4s", buf, 84, b"DXT1")
    payload = struct.pack("<2H4B", c0, c1, 0, 0, 0, 0)
    out = decode_dds(bytes(buf) + payload)
    assert out.shape == (4, 4, 4)
    assert out[0, 0, 0] == 255 and out[0, 0, 2] == 0


def test_sky_grid_matches_gather():
    """sample_sky_2d_grid (banded-matmul resample) == sample_sky_2d
    (quad-pool gather) on the regular pixel grid."""
    from rt64tpu.pipeline.scene_buffers import build_quad_entries
    from rt64tpu import descriptors as d

    rng = np.random.default_rng(3)
    ht, wt = 32, 48
    rgba = rng.integers(0, 256, (ht, wt, 4), dtype=np.uint8)
    pool = jnp.asarray(build_quad_entries(
        rgba, d.SHADER_ADDRESSING_WRAP, d.SHADER_ADDRESSING_WRAP))
    records = jnp.asarray(np.array([[0, wt, ht]], np.int32))
    sky_plane = jnp.asarray(
        rgba.astype(np.float32).transpose(2, 0, 1) / 255.0)

    h, w = 24, 40
    jitter = jnp.asarray([0.31, -0.27], jnp.float32)
    # A camera looking mostly forward with some yaw/pitch.
    fwd = np.array([0.3, -0.2, -0.93])
    fwd /= np.linalg.norm(fwd)
    view_i = jnp.asarray(np.block([
        [np.eye(3), np.zeros((3, 1))],
        [np.zeros((1, 4))],
    ]).astype(np.float32)).at[2, :3].set(jnp.asarray(fwd, jnp.float32))
    viewport = jnp.asarray([float(w), float(h)], jnp.float32)
    yaw = jnp.float32(0.7)
    mult = jnp.asarray([1.1, 0.9, 1.0], jnp.float32)
    hsl = jnp.asarray([0.1, -0.05, 0.02], jnp.float32)

    px = np.tile(np.arange(w), h).astype(np.float32)
    py = np.repeat(np.arange(h), w).astype(np.float32)
    su = jnp.asarray((px + 0.31) / w)
    sv = jnp.asarray((py - 0.27) / h)
    ref = sky.sample_sky_2d(
        pool, records, jnp.zeros((h * w,), jnp.int32), su, sv, view_i,
        viewport, yaw, mult, hsl)
    got = sky.sample_sky_2d_grid(
        sky_plane, jnp.int32(0), jitter, view_i, viewport, yaw, mult, hsl,
        w, h, h, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=0)
    # rec < 0 -> transparent, like the gather path's valid mask.
    off = sky.sample_sky_2d_grid(
        sky_plane, jnp.int32(-1), jitter, view_i, viewport, yaw, mult, hsl,
        w, h, h, 0)
    assert float(jnp.abs(off[3]).max()) == 0.0


def test_background_grid_matches_gather():
    rng = np.random.default_rng(5)
    h, w = 20, 36
    img = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
    for jx, jy in [(0.0, 0.0), (0.31, -0.27), (-0.49, 0.49)]:
        px = np.tile(np.arange(w), h).astype(np.float32)
        py = np.repeat(np.arange(h), w).astype(np.float32)
        su = jnp.asarray((px + jx) / w)
        sv = jnp.asarray((py + jy) / h)
        ref = sky.sample_background_2d(img, su, sv)
        got = sky.sample_background_grid(img, jnp.float32(jx),
                                         jnp.float32(jy))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=0)
