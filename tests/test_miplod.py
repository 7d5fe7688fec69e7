"""Ray-differential mip LOD (opt-in TPU extension).

The reference carries the Igehy differentials (Ray.hlsli:37-94) into a
SampleGrad whose mip chain is never built (rt64_device.cpp:758-762), so
its shipped minification aliases. SHADER_MIP_LOD_ENABLED turns the same
math into a live mip selection; these tests pin (a) the arithmetic
offset derivation against the baked chain layout, and (b) that a
minification scene actually dealiases with the flag on while staying
color-faithful.
"""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# mip_select arithmetic vs the layout pack_quad_pool bakes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("w,h", [(64, 64), (48, 16), (33, 7), (1, 8), (2, 2)])
def test_mip_select_matches_chain_layout(w, h):
    import jax.numpy as jnp

    from rt64tpu.ops.mipmaps import generate_mips
    from rt64tpu.ops.texture import MAX_MIP_LEVELS, mip_select

    rgba = np.random.default_rng(0).integers(
        0, 255, (h, w, 4), dtype=np.uint8
    )
    levels = generate_mips(rgba, max_levels=MAX_MIP_LEVELS)
    base = 1000  # arbitrary pool offset
    offs, dims = [], []
    o = base
    for lv in levels:
        offs.append(o)
        dims.append((lv.shape[1], lv.shape[0]))
        o += lv.shape[0] * lv.shape[1]

    # Every baked level resolves to its exact offset/dims; levels past
    # the chain clamp to the last baked one.
    for lquery in range(MAX_MIP_LEVELS + 2):
        li = min(lquery, len(levels) - 1)
        sel_o, sel_w, sel_h = mip_select(
            jnp.int32(base), jnp.int32(w), jnp.int32(h),
            jnp.full((3,), lquery, jnp.int32),
        )
        assert int(sel_o[0]) == offs[li], (lquery, li)
        assert (int(sel_w[0]), int(sel_h[0])) == dims[li]


# ---------------------------------------------------------------------------
# end-to-end: minification scene dealiased with the flag on
# ---------------------------------------------------------------------------

def _render_floor(mip_enabled, width=128, height=96):
    import rt64tpu
    from rt64tpu import descriptors as d
    from rt64tpu.limits import SceneLimits
    from rt64tpu.utils.testscenes import (
        SID_TEXTURE, checker_texture, interleave,
    )

    limits = SceneLimits(
        max_vertices=64, max_triangles=16, max_instances=2,
        max_textures=4, texel_pool=1 << 16,
    )
    device = rt64tpu.Device(limits)
    scene = rt64tpu.Scene(device)
    view = rt64tpu.View(scene, width=width, height=height)

    checker = checker_texture(device, size=64, cell=1)  # 1-texel checker
    flags = d.SHADER_RAYTRACE_ENABLED
    if mip_enabled:
        flags |= d.SHADER_MIP_LOD_ENABLED
    shader = rt64tpu.Shader(
        device, SID_TEXTURE, filter=d.SHADER_FILTER_LINEAR,
        h_addr=d.SHADER_ADDRESSING_WRAP, v_addr=d.SHADER_ADDRESSING_WRAP,
        flags=flags,
    )

    # A floor stretching toward the horizon, UVs tiled 64x: the far
    # rows cover hundreds of texels per pixel.
    fv = [
        ((-40, 0, -400), (0, 1, 0), (0, 0)),
        ((40, 0, -400), (0, 1, 0), (64, 0)),
        ((40, 0, 0), (0, 1, 0), (64, 64)),
        ((-40, 0, 0), (0, 1, 0), (0, 64)),
    ]
    fidx = np.array([0, 2, 1, 0, 3, 2], np.uint32)
    mesh = rt64tpu.Mesh(device, d.MESH_RAYTRACE_ENABLED)
    fdata = interleave(fv, with_uv=True)
    mesh.set_mesh(fdata, 4, fdata.shape[1] * 4, fidx)
    inst = rt64tpu.Instance(scene)
    inst.set_description(d.InstanceDesc(
        mesh=mesh, transform=np.eye(4, dtype=np.float32),
        diffuse_texture=checker, shader=shader, material=d.Material(),
    ))

    sd = scene.desc
    sd.ambient_base_color = (1.0, 1.0, 1.0)  # unlit-ish: pure texture
    scene.set_description(sd)

    # Camera 1.5 up, looking slightly down along -z toward the horizon.
    from rt64tpu.ops import math3d

    vm = math3d.look_at_rh((0.0, 1.5, 4.0), (0.0, 0.6, -20.0), (0.0, 1.0, 0.0))
    view.set_perspective(vm, 0.9, 0.1, 1000.0)
    device.draw()
    return np.asarray(view.framebuffer()[..., :3], np.float64) / 255.0


def test_miplod_reduces_minification_aliasing():
    base = _render_floor(mip_enabled=False)
    mip = _render_floor(mip_enabled=True)

    # The floor band (64x-tiled 1-texel checker, hundreds of texels per
    # pixel) flickers between the two checker colors unfiltered and
    # converges to their average mip-filtered. Measured: base std
    # ~0.04-0.16 per row, mip std ~0.007 (>10x reduction).
    h = base.shape[0]
    band = slice(int(h * 0.52), int(h * 0.78))
    std_base = float(base[band].std())
    std_mip = float(mip[band].std())
    assert std_base > 0.03, f"scene not aliasing; bad framing ({std_base})"
    assert std_mip < 0.35 * std_base, (std_mip, std_base)

    # And it stays color-faithful: the band means agree (the average of
    # the checker colors), so the chain isn't just darkening the image.
    assert abs(float(mip[band].mean()) - float(base[band].mean())) < 0.02
