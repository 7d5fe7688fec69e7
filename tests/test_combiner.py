"""Combiner interpreter vs an independent emulation of the reference's
emitted HLSL (rt64_shader.cpp:228-310, 489-494)."""

import numpy as np
import pytest

from rt64tpu.ops.combiner import (
    PARAMS_WIDTH,
    SHADER_0,
    SHADER_TEXEL0,
    SHADER_TEXEL0A,
    SHADER_TEXEL1,
    combiner_eval_np,
    decode_combiner,
)


def _color_input(item, with_alpha, inputs_have_alpha, hint_single, env):
    """colorInput (rt64_shader.cpp:228-258) evaluated numerically."""
    inputs, tex0, tex1 = env
    if item == SHADER_0:
        return np.array([0, 0, 0, 0 if with_alpha else 1], np.float32)
    if 1 <= item <= 4:
        v = inputs[item - 1].copy()
        if with_alpha or not inputs_have_alpha:
            return v
        return np.array([v[0], v[1], v[2], 1.0], np.float32)
    if item == SHADER_TEXEL0:
        return tex0 if with_alpha else np.array([*tex0[:3], 1.0], np.float32)
    if item == SHADER_TEXEL0A:
        a = tex0[3]
        if hint_single or with_alpha:
            return np.array([a, a, a, a], np.float32)
        return np.array([a, a, a, 1.0], np.float32)
    if item == SHADER_TEXEL1:
        return tex1 if with_alpha else np.array([*tex1[:3], 1.0], np.float32)
    raise AssertionError(item)


def _color_formula(c, do_single, do_multiply, do_mix, with_alpha, opt_alpha, env):
    ci = lambda item, hint=False: _color_input(item, with_alpha, opt_alpha, hint, env)
    if do_single:
        return ci(c[3])
    if do_multiply:
        return ci(c[0]) * ci(c[2], hint=True)
    if do_mix:
        a, b, m = ci(c[0]), ci(c[1]), ci(c[2], hint=True)
        return b + (a - b) * m
    return (ci(c[0]) - ci(c[1])) * ci(c[2], hint=True)[0] + ci(c[3])


def _alpha_input(item, env):
    inputs, tex0, tex1 = env
    if item == SHADER_0:
        return 0.0
    if 1 <= item <= 4:
        return inputs[item - 1][3]
    if item in (SHADER_TEXEL0, SHADER_TEXEL0A):
        return tex0[3]
    if item == SHADER_TEXEL1:
        return tex1[3]
    raise AssertionError(item)


def _alpha_formula(c, do_single, do_multiply, do_mix, env):
    ai = lambda item: _alpha_input(item, env)
    if do_single:
        return ai(c[3])
    if do_multiply:
        return ai(c[0]) * ai(c[2])
    if do_mix:
        a, b, m = ai(c[0]), ai(c[1]), ai(c[2])
        return b + (a - b) * m
    return (ai(c[0]) - ai(c[1])) * ai(c[2]) + ai(c[3])


def emulate(shader_id, inputs, tex0, tex1):
    """The emitted shader body (rt64_shader.cpp:489-494), numerically."""
    cc = decode_combiner(shader_id)
    env = (inputs, tex0, tex1)
    c0, c1 = cc.c
    ds = [c0[2] == 0, c1[2] == 0]
    dm = [c0[1] == 0 and c0[3] == 0, c1[1] == 0 and c1[3] == 0]
    dx = [c0[1] == c0[3], c1[1] == c1[3]]
    if not cc.color_alpha_same and cc.opt_alpha:
        rgb = _color_formula(c0, ds[0], dm[0], dx[0], False, True, env)[:3]
        a = _alpha_formula(c1, ds[1], dm[1], dx[1], env)
        return np.array([*rgb, a], np.float32)
    return _color_formula(
        c0, ds[0], dm[0], dx[0], cc.opt_alpha, cc.opt_alpha, env
    )


def test_combiner_matches_reference_emulation():
    import jax.numpy as jnp
    from rt64tpu.ops.combiner import combiner_eval

    rng = np.random.default_rng(0)
    cases = 2000
    sids, params, inputs_all, tex0_all, tex1_all, want = [], [], [], [], [], []
    for _ in range(cases):
        sid = int(rng.integers(0, 1 << 24)) | (int(rng.integers(0, 2)) << 24)
        cc = decode_combiner(sid)
        inputs = rng.random((4, 4)).astype(np.float32)
        if not cc.opt_alpha:
            # float3 inputs extend with alpha=1 (rt64_shader.cpp:198).
            inputs[:, 3] = 1.0
        tex0 = rng.random(4).astype(np.float32)
        tex1 = rng.random(4).astype(np.float32)
        sids.append(sid)
        params.append(cc.packed())
        inputs_all.append(inputs)
        tex0_all.append(tex0)
        tex1_all.append(tex1)
        want.append(emulate(sid, inputs, tex0, tex1))
    got = np.asarray(
        combiner_eval(
            jnp.asarray(np.stack(params)),
            jnp.asarray(np.stack(inputs_all)),
            jnp.asarray(np.stack(tex0_all)),
            jnp.asarray(np.stack(tex1_all)),
        )
    )
    want = np.stack(want)
    bad = np.where(~np.isclose(got, want, rtol=1e-5, atol=1e-5).all(axis=1))[0]
    assert bad.size == 0, (
        f"{bad.size} mismatches; first shaderId={sids[bad[0]]:#x} "
        f"got={got[bad[0]]} want={want[bad[0]]}"
    )


def test_sample_app_sphere_shader_decodes():
    # main.cpp:216 uses 0x01200a00 with normal+specular maps.
    cc = decode_combiner(0x01200A00)
    assert cc.use_textures[0]
    assert cc.input_count >= 1
