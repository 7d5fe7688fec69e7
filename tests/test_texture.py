"""Quad-pool sampling vs NumPy reference (D3D filtering/addressing)."""

import numpy as np
import jax.numpy as jnp

from rt64tpu.ops import texture as tex_ops
from rt64tpu.pipeline.scene_buffers import build_quad_entries


def _np_address(i, size, mode):
    if mode == tex_ops.ADDR_WRAP:
        return np.mod(i, size)
    if mode == tex_ops.ADDR_MIRROR:
        m = np.mod(i, 2 * size)
        return np.where(m < size, m, 2 * size - 1 - m)
    return np.clip(i, 0, size - 1)


def _np_sample(img, u, v, linear, h_mode, v_mode):
    h, w = img.shape[:2]
    x = u * w - 0.5
    y = v * h - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0
    if not linear:
        xi = int(_np_address(np.array(x0 + round(fx)), w, h_mode))
        yi = int(_np_address(np.array(y0 + round(fy)), h, v_mode))
        return img[yi, xi].astype(np.float64) / 255.0
    acc = np.zeros(4)
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            xi = int(_np_address(np.array(x0 + dx), w, h_mode))
            yi = int(_np_address(np.array(y0 + dy), h, v_mode))
            acc += wy * wx * img[yi, xi].astype(np.float64) / 255.0
    return acc


def test_quad_sampling_matches_reference():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 12, 4), dtype=np.uint8)
    cases = []
    for _ in range(120):
        u, v = rng.uniform(-1.5, 2.5, 2)
        linear = bool(rng.integers(0, 2))
        hm = int(rng.integers(0, 3))
        vm = int(rng.integers(0, 3))
        cases.append((u, v, linear, hm, vm))

    # One pool entry set per addressing combo (the packer's job).
    for hm_fixed in range(3):
        for vm_fixed in range(3):
            sub = [c for c in cases if c[3] == hm_fixed and c[4] == vm_fixed]
            if not sub:
                continue
            pool = np.zeros((256, 4), np.uint32)
            pool[: 8 * 12] = build_quad_entries(img, hm_fixed, vm_fixed)
            records = np.zeros((2, 3), np.int32)
            records[0] = (0, 12, 8)
            n = len(sub)
            out = tex_ops.sample_quad(
                jnp.asarray(pool), jnp.asarray(records),
                jnp.zeros(n, jnp.int32),
                jnp.asarray(np.array([c[0] for c in sub], np.float32)),
                jnp.asarray(np.array([c[1] for c in sub], np.float32)),
                jnp.asarray(np.array([c[2] for c in sub])),
                jnp.full(n, hm_fixed, jnp.int32),
                jnp.full(n, vm_fixed, jnp.int32),
            )
            got = np.asarray(out).T  # (n, 4)
            for i, (u, v, linear, hm, vm) in enumerate(sub):
                want = _np_sample(img, u, v, linear, hm, vm)
                np.testing.assert_allclose(
                    got[i], want, atol=2.5e-3,
                    err_msg=f"uv=({u},{v}) lin={linear} h={hm} v={vm}",
                )


def test_negative_record_transparent():
    pool = jnp.zeros((16, 4), jnp.uint32)
    records = jnp.zeros((1, 3), jnp.int32)
    out = tex_ops.sample_quad(
        pool, records, jnp.asarray([-1]), jnp.asarray([0.5]), jnp.asarray([0.5]),
        jnp.asarray([True]), jnp.asarray([0]), jnp.asarray([0]),
    )
    assert np.all(np.asarray(out) == 0.0)
