"""N64 color-combiner: decode + vectorized interpreter.

The reference decodes a 28-bit shaderId into a 2-cycle combiner and
*generates HLSL source per shader* compiled at runtime with dxc
(rt64_shader.cpp:17-78, 260-310, 444-592). On TPU that per-shader
specialization would explode jit caches and force per-material
dispatch, so this module instead evaluates the combiner as data: the
decoded parameters ride per-instance arrays and a single vectorized
interpreter shades every hit in one fused XLA program. The interpreter
reproduces the emitted formulas exactly, including the single /
multiply / mix fast paths and the ``(a-b)*c.r+d`` general path
(rt64_shader.cpp:260-310), the with/without-alpha operand variants
(rt64_shader.cpp:228-258), and the TEXEL0A single-element hint.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

# Combiner input slots (rt64_shader.cpp:17-26).
SHADER_0 = 0
SHADER_INPUT_1 = 1
SHADER_INPUT_2 = 2
SHADER_INPUT_3 = 3
SHADER_INPUT_4 = 4
SHADER_TEXEL0 = 5
SHADER_TEXEL0A = 6
SHADER_TEXEL1 = 7

# Option flags (rt64_shader.cpp:28-30).
SHADER_OPT_ALPHA = 1 << 24
SHADER_OPT_TEXTURE_EDGE = 1 << 26
SHADER_OPT_NOISE = 1 << 27

# Packed parameter vector layout (ints), one row per instance:
#   [0:4]  color cycle items  c[0][0..3]
#   [4:8]  alpha cycle items  c[1][0..3]
#   [8]    opt_alpha
#   [9]    opt_texture_edge
#   [10]   opt_noise
#   [11]   color_alpha_same
#   [12]   input_count
#   [13]   use_texture_0
#   [14]   use_texture_1
PARAMS_WIDTH = 15


@dataclass(frozen=True)
class CombinerParams:
    """Decoded ColorCombinerParams (rt64_shader.cpp:44-78)."""

    c: tuple  # ((4 ints color), (4 ints alpha))
    input_count: int
    use_textures: tuple  # (bool, bool)
    opt_alpha: bool
    opt_texture_edge: bool
    opt_noise: bool
    color_alpha_same: bool

    def packed(self) -> np.ndarray:
        out = np.zeros(PARAMS_WIDTH, np.int32)
        out[0:4] = self.c[0]
        out[4:8] = self.c[1]
        out[8] = int(self.opt_alpha)
        out[9] = int(self.opt_texture_edge)
        out[10] = int(self.opt_noise)
        out[11] = int(self.color_alpha_same)
        out[12] = self.input_count
        out[13] = int(self.use_textures[0])
        out[14] = int(self.use_textures[1])
        return out


def decode_combiner(shader_id: int) -> CombinerParams:
    """Decode a shaderId (rt64_shader.cpp:44-77)."""
    c = [[0] * 4, [0] * 4]
    for i in range(4):
        c[0][i] = (shader_id >> (i * 3)) & 7
        c[1][i] = (shader_id >> (12 + i * 3)) & 7
    input_count = 0
    use_tex = [False, False]
    for i in range(2):
        for j in range(4):
            if SHADER_INPUT_1 <= c[i][j] <= SHADER_INPUT_4:
                input_count = max(input_count, c[i][j])
            if c[i][j] in (SHADER_TEXEL0, SHADER_TEXEL0A):
                use_tex[0] = True
            if c[i][j] == SHADER_TEXEL1:
                use_tex[1] = True
    return CombinerParams(
        c=(tuple(c[0]), tuple(c[1])),
        input_count=input_count,
        use_textures=(use_tex[0], use_tex[1]),
        opt_alpha=bool(shader_id & SHADER_OPT_ALPHA),
        opt_texture_edge=bool(shader_id & SHADER_OPT_TEXTURE_EDGE),
        opt_noise=bool(shader_id & SHADER_OPT_NOISE),
        color_alpha_same=(shader_id & 0xFFF) == ((shader_id >> 12) & 0xFFF),
    )


def combiner_eval(params, inputs, tex0, tex1):
    """Batch-of-vectors wrapper over combiner_eval_planar (for tests and
    AoS callers). params: (..., PARAMS_WIDTH) int32; inputs (..., 4, 4);
    tex0/tex1 (..., 4). Returns (..., 4)."""
    shape = tex0.shape[:-1]
    flat = lambda a: a.reshape((-1,) + a.shape[len(shape):])
    p = flat(params)
    cc_items = jnp.concatenate([p[:, 0:4], p[:, 4:8]], axis=1).T  # (8, N)
    iv = flat(inputs)
    out = combiner_eval_planar(
        cc_items,
        p[:, 8] != 0,
        p[:, 11] != 0,
        iv[:, 0].T, iv[:, 1].T, iv[:, 2].T, iv[:, 3].T,
        flat(tex0).T, flat(tex1).T,
    )
    return out.T.reshape(shape + (4,))


def combiner_eval_np(params_row: np.ndarray, inputs, tex0, tex1):
    """NumPy scalar reference for tests: one shading point."""
    out = combiner_eval(
        jnp.asarray(params_row)[None],
        jnp.asarray(inputs, jnp.float32)[None],
        jnp.asarray(tex0, jnp.float32)[None],
        jnp.asarray(tex1, jnp.float32)[None],
    )
    return np.asarray(out)[0]


def _select8(ids, planes):
    """8-way masked select: Σ_k (ids == k) * planes[k].

    planes: list of 8 arrays broadcastable to ids' shape. Replaces a
    gather with vector compares — the TPU-friendly form for the
    combiner's 3-bit operand slots.
    """
    out = None
    for k in range(8):
        term = jnp.where(ids == k, planes[k], 0.0)
        out = term if out is None else out + term
    return out


def combiner_eval_planar(cc_items, opt_alpha, color_alpha_same,
                         in1, in2, in3, in4, tex0, tex1):
    """Planar combiner interpreter: all arrays are channel-planes.

    cc_items: (8, N) int32 — color cycle items then alpha cycle items
      (rows.unpack_cc output transposed).
    opt_alpha / color_alpha_same: (N,) bool.
    in1..in4, tex0, tex1: (4, N) rgba planes (missing vertex inputs are
      zeros with alpha 1, matching the float3->float4 extension).

    Returns (4, N). Same math as combiner_eval (rt64_shader.cpp:260-310,
    489-494) in the TPU-friendly layout.
    """
    zero = jnp.zeros_like(tex0[0])
    one = jnp.ones_like(zero)
    t0a = tex0[3]

    rgb_planes = [
        [zero, in1[c], in2[c], in3[c], in4[c], tex0[c], t0a, tex1[c]]
        for c in range(3)
    ]
    # with_alpha=True alpha table (== alphaInput, rt64_shader.cpp:275-295).
    a_full = [zero, in1[3], in2[3], in3[3], in4[3], tex0[3], t0a, tex1[3]]
    # c-operand with_alpha=False table: 1 except TEXEL0A (hint path).
    a_copq = [one, one, one, one, one, one, t0a, one]

    i0, i1, i2, i3 = cc_items[0], cc_items[1], cc_items[2], cc_items[3]
    do_single = i2 == SHADER_0
    do_multiply = (i1 == SHADER_0) & (i3 == SHADER_0)
    do_mix = i1 == i3
    comp_c = do_multiply | do_mix

    def pick_rgb(ids):
        return jnp.stack([_select8(ids, rgb_planes[c]) for c in range(3)], 0)

    a_rgb = pick_rgb(i0)
    b_rgb = pick_rgb(i1)
    c_rgb = pick_rgb(i2)
    d_rgb = pick_rgb(i3)
    c_r = c_rgb[0]
    ccm = jnp.where(
        do_single[None], 0.0, jnp.where(comp_c[None], c_rgb, c_r[None])
    )
    rgb = (a_rgb - b_rgb) * ccm + jnp.where(do_multiply[None], 0.0, d_rgb)

    def scalar_formula(j0, j1, j2, j3, gen_mul):
        s_single = j2 == SHADER_0
        s_mult = (j1 == SHADER_0) & (j3 == SHADER_0)
        s_mix = j1 == j3
        a = _select8(j0, a_full)
        b = _select8(j1, a_full)
        cc = _select8(j2, a_full)
        dd = _select8(j3, a_full)
        general = (a - b) * gen_mul + dd
        return jnp.where(
            s_single, dd,
            jnp.where(s_mult, a * cc, jnp.where(s_mix, b + (a - b) * cc, general)),
        )

    # Alpha of the vector formula (with_alpha=True): general path uses
    # the color c-operand's red channel.
    alpha_wa = scalar_formula(i0, i1, i2, i3, c_r)
    # Alpha of colorFormula(with_alpha=False): 1 except multiply by a
    # TEXEL0A c-operand.
    mult_mask = (i1 == SHADER_0) & (i3 == SHADER_0) & (i2 != SHADER_0)
    alpha_noa = jnp.where(mult_mask, _select8(i2, a_copq), one)
    # Dedicated alphaFormula over the alpha cycle.
    j0, j1, j2, j3 = cc_items[4], cc_items[5], cc_items[6], cc_items[7]
    alpha_cycle = scalar_formula(j0, j1, j2, j3, _select8(j2, a_full))

    alpha = jnp.where(
        opt_alpha & ~color_alpha_same,
        alpha_cycle,
        jnp.where(opt_alpha, alpha_wa, alpha_noa),
    )
    return jnp.concatenate([rgb, alpha[None]], axis=0)
