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


def _take(table, idx):
    """Gather rows: table (..., 8, C), idx (...,) -> (..., C)."""
    return jnp.take_along_axis(
        table, idx[..., None, None].astype(jnp.int32), axis=-2
    ).squeeze(-2)


def _take1(table, idx):
    """Gather scalars: table (..., 8), idx (...,) -> (...,)."""
    return jnp.take_along_axis(table, idx[..., None].astype(jnp.int32), axis=-1).squeeze(-1)


def combiner_eval(params, inputs, tex0, tex1):
    """Evaluate the combiner for a batch of shading points.

    Args:
      params: (..., PARAMS_WIDTH) int32 packed combiner parameters.
      inputs: (..., 4, 4) per-vertex input colors 1..4, rgba. When the
        shader has !opt_alpha the loader must supply alpha=1 (matching
        the float3->float4 extension at rt64_shader.cpp:198).
      tex0: (..., 4) sampled diffuse texel.
      tex1: (..., 4) sampled second texel (reference stubs it to
        magenta, rt64_shader.cpp:484-487).

    Returns:
      (..., 4) result color, pre solid-alpha-multiplier.
    """
    c = params[..., 0:8]
    opt_alpha = params[..., 8] != 0
    color_alpha_same = params[..., 11] != 0

    zero = jnp.zeros_like(tex0[..., 0])
    one = jnp.ones_like(zero)

    # RGB candidate table, identical for all operand variants
    # (rgb of colorInput never depends on with_alpha, rt64_shader.cpp:228-258).
    t0a_rgb = jnp.broadcast_to(tex0[..., 3:4], tex0[..., :3].shape)
    rgb_table = jnp.stack(
        [
            jnp.zeros_like(tex0[..., :3]),
            inputs[..., 0, :3],
            inputs[..., 1, :3],
            inputs[..., 2, :3],
            inputs[..., 3, :3],
            tex0[..., :3],
            t0a_rgb,
            tex1[..., :3],
        ],
        axis=-2,
    )
    # Alpha candidate table with with_alpha=True (== alphaInput,
    # rt64_shader.cpp:275-295, except slot 0 which alphaInput also maps to 0).
    a_full = jnp.stack(
        [
            zero,
            inputs[..., 0, 3],
            inputs[..., 1, 3],
            inputs[..., 2, 3],
            inputs[..., 3, 3],
            tex0[..., 3],
            tex0[..., 3],
            tex1[..., 3],
        ],
        axis=-1,
    )
    # c-operand alpha table with with_alpha=False: forced 1 except
    # TEXEL0A which keeps tex alpha (hint_single_element path).
    a_copq = jnp.stack(
        [one, one, one, one, one, one, tex0[..., 3], one], axis=-1
    )

    def cycle(items):
        i0, i1, i2, i3 = (items[..., k] for k in range(4))
        do_single = i2 == SHADER_0
        do_multiply = (i1 == SHADER_0) & (i3 == SHADER_0)
        do_mix = i1 == i3
        a_rgb = _take(rgb_table, i0)
        b_rgb = _take(rgb_table, i1)
        c_rgb = _take(rgb_table, i2)
        d_rgb = _take(rgb_table, i3)
        c_r = c_rgb[..., 0:1]
        # Unified rgb: fast paths use componentwise c, general uses c.r
        # (rt64_shader.cpp:260-273). do_mix implies d == b.
        ccm = jnp.where(
            do_single[..., None],
            jnp.zeros_like(c_rgb),
            jnp.where((do_multiply | do_mix)[..., None], c_rgb, c_r),
        )
        rgb = (a_rgb - b_rgb) * ccm + jnp.where(
            do_multiply[..., None], jnp.zeros_like(d_rgb), d_rgb
        )
        return rgb, (do_single, do_multiply, do_mix, c_r[..., 0])

    def scalar_formula(items, table_a, table_c, gen_mul):
        """alphaFormula / alpha channel of colorFormula (scalar ops)."""
        i0, i1, i2, i3 = (items[..., k] for k in range(4))
        do_single = i2 == SHADER_0
        do_multiply = (i1 == SHADER_0) & (i3 == SHADER_0)
        do_mix = i1 == i3
        a = _take1(table_a, i0)
        b = _take1(table_a, i1)
        cc = _take1(table_c, i2)
        d = _take1(table_a, i3)
        general = (a - b) * gen_mul(items) + d
        return jnp.where(
            do_single,
            d,
            jnp.where(do_multiply, a * cc, jnp.where(do_mix, b + (a - b) * cc, general)),
        )

    color_items = c[..., 0:4]
    alpha_items = c[..., 4:8]

    rgb, (_, _, _, c_red) = cycle(color_items)

    # c.r of the color cycle's c operand feeds the general path's alpha
    # when the vector formula is used (with_alpha=True composition).
    def color_gen_mul(items):
        return c_red

    # Alpha via the full-alpha table (with_alpha=True vector semantics).
    alpha_wa = scalar_formula(color_items, a_full, a_full, color_gen_mul)
    # Alpha of colorFormula(with_alpha=False): 1 except multiply by a
    # TEXEL0A c-operand (all other paths collapse to 1).
    i1c, i2c, i3c = color_items[..., 1], color_items[..., 2], color_items[..., 3]
    mult_mask = (i1c == SHADER_0) & (i3c == SHADER_0) & (i2c != SHADER_0)
    alpha_noa = jnp.where(mult_mask, _take1(a_copq, i2c), one)
    # Dedicated alphaFormula over the alpha cycle (rt64_shader.cpp:297-310):
    # scalar all the way; general multiplier is the c alpha itself.
    alpha_cycle = scalar_formula(
        alpha_items, a_full, a_full, lambda items: _take1(a_full, items[..., 2])
    )

    # Composition (rt64_shader.cpp:489-494).
    alpha = jnp.where(
        opt_alpha & ~color_alpha_same,
        alpha_cycle,
        jnp.where(opt_alpha, alpha_wa, alpha_noa),
    )
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def combiner_eval_np(params_row: np.ndarray, inputs, tex0, tex1):
    """NumPy scalar reference for tests: one shading point."""
    out = combiner_eval(
        jnp.asarray(params_row)[None],
        jnp.asarray(inputs, jnp.float32)[None],
        jnp.asarray(tex0, jnp.float32)[None],
        jnp.asarray(tex1, jnp.float32)[None],
    )
    return np.asarray(out)[0]
