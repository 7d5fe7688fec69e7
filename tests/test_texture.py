"""Atlas sampling vs NumPy reference (D3D filtering/addressing rules)."""

import numpy as np
import jax.numpy as jnp

from rt64tpu.ops import texture as tex_ops


def _np_address(i, size, mode):
    if mode == tex_ops.ADDR_WRAP:
        return np.mod(i, size)
    if mode == tex_ops.ADDR_MIRROR:
        m = np.mod(i, 2 * size)
        return np.where(m < size, m, 2 * size - 1 - m)
    return np.clip(i, 0, size - 1)


def _np_sample(img, uv, linear, h_mode, v_mode):
    h, w = img.shape[:2]
    x = uv[0] * w - 0.5
    y = uv[1] * h - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0
    if not linear:
        xi = _np_address(np.array(x0 + round(fx)), w, h_mode)
        yi = _np_address(np.array(y0 + round(fy)), h, v_mode)
        return img[int(yi), int(xi)].astype(np.float64) / 255.0
    acc = np.zeros(4)
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            xi = int(_np_address(np.array(x0 + dx), w, h_mode))
            yi = int(_np_address(np.array(y0 + dy), h, v_mode))
            acc += wy * wx * img[yi, xi].astype(np.float64) / 255.0
    return acc


def test_sampling_matches_reference():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 12, 4), np.uint8)
    pool = np.zeros((256, 4), np.uint8)
    pool[: 8 * 12] = img.reshape(-1, 4)
    records = np.zeros((2, 3), np.int32)
    records[0] = (0, 12, 8)

    cases = []
    for _ in range(100):
        uv = rng.uniform(-1.5, 2.5, 2)
        linear = bool(rng.integers(0, 2))
        hm = int(rng.integers(0, 3))
        vm = int(rng.integers(0, 3))
        cases.append((uv, linear, hm, vm))

    uvs = jnp.asarray(np.array([c[0] for c in cases], np.float32))
    lins = jnp.asarray(np.array([c[1] for c in cases]))
    hms = jnp.asarray(np.array([c[2] for c in cases], np.int32))
    vms = jnp.asarray(np.array([c[3] for c in cases], np.int32))
    idx = jnp.zeros(len(cases), jnp.int32)
    got = np.asarray(
        tex_ops.sample(jnp.asarray(pool), jnp.asarray(records), idx, uvs, lins, hms, vms)
    )
    for i, (uv, linear, hm, vm) in enumerate(cases):
        want = _np_sample(img, uv, linear, hm, vm)
        np.testing.assert_allclose(got[i], want, atol=2e-3, err_msg=str(cases[i]))


def test_negative_index_transparent():
    pool = jnp.zeros((16, 4), jnp.uint8)
    records = jnp.zeros((1, 3), jnp.int32)
    out = tex_ops.sample(
        pool, records, jnp.asarray([-1]), jnp.asarray([[0.5, 0.5]]),
        jnp.asarray([True]), jnp.asarray([0]), jnp.asarray([0]),
    )
    assert np.all(np.asarray(out) == 0.0)
