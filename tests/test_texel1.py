"""TEXEL1 second-texture binding (TPU extension).

The reference stubs TEXEL1 samples to magenta (rt64_shader.cpp:484-487)
because RT64_INSTANCE_DESC has no second diffuse slot. The TPU build
adds a real binding (InstanceDesc.alt_texture / RT64_SetInstanceAltTexture):
these tests check a two-texture combiner samples BOTH textures, and that
an unbound TEXEL1 keeps the reference's magenta parity behavior.
"""

import numpy as np

import rt64tpu
from rt64tpu import descriptors as d
from rt64tpu.utils.testscenes import build_sample_scene, shader_id


def _solid_texture(device, rgb, size=8):
    img = np.zeros((size, size, 4), np.uint8)
    img[..., :3] = rgb
    img[..., 3] = 255
    return rt64tpu.Texture(
        device,
        d.TextureDesc(bytes=img.tobytes(), format=d.TEXTURE_FORMAT_RGBA8,
                      width=size, height=size),
    )


def _center_diffuse(view):
    view.visualization_mode = d.VISUALIZATION_MODE_DIFFUSE
    view.scene.device.draw()
    fb = view.framebuffer().astype(np.float32)
    return fb[24, 32, :3] / 255.0  # sphere center


def test_texel1_real_binding_and_magenta_fallback():
    dev, scene, view = build_sample_scene(width=64, height=48, gi_samples=0)
    sphere = scene.instances[0]

    # color = TEXEL0 * TEXEL1 (multiply fast path). yellow * cyan = green:
    # proof both textures are sampled, not just one.
    sid = shader_id((d.MATERIAL_CC_SHADER_TEXEL0, 0,
                     d.MATERIAL_CC_SHADER_TEXEL1, 0))
    sh = rt64tpu.Shader(dev, sid, flags=d.SHADER_RAYTRACE_ENABLED)
    yellow = _solid_texture(dev, (255, 255, 0))
    cyan = _solid_texture(dev, (0, 255, 255))
    desc = sphere.desc
    desc.shader = sh
    desc.diffuse_texture = yellow
    sphere.set_alt_texture(cyan)
    sphere.set_description(desc)

    rgb = _center_diffuse(view)
    assert rgb[1] > 0.5, rgb  # green survives the product
    assert rgb[0] < 0.1 and rgb[2] < 0.1, rgb

    # TEXEL1 as the single output samples the alt texture directly.
    sid1 = shader_id((0, 0, 0, d.MATERIAL_CC_SHADER_TEXEL1))
    desc.shader = rt64tpu.Shader(dev, sid1, flags=d.SHADER_RAYTRACE_ENABLED)
    sphere.set_description(desc)
    rgb = _center_diffuse(view)
    assert rgb[1] > 0.5 and rgb[2] > 0.5 and rgb[0] < 0.1, rgb  # cyan

    # Unbound -> the reference's magenta stub (parity behavior).
    sphere.set_alt_texture(None)
    desc.alt_texture = None
    sphere.set_description(desc)
    rgb = _center_diffuse(view)
    assert rgb[0] > 0.5 and rgb[2] > 0.5 and rgb[1] < 0.1, rgb  # magenta


def test_alt_texture_sticky_across_descriptions():
    dev, scene, view = build_sample_scene(width=64, height=48, gi_samples=0)
    sphere = scene.instances[0]
    cyan = _solid_texture(dev, (0, 255, 255))
    sphere.set_alt_texture(cyan)
    # A host-style re-push without alt_texture keeps the binding.
    desc = sphere.desc
    desc.alt_texture = None
    desc.shader = rt64tpu.Shader(
        dev, shader_id((0, 0, 0, d.MATERIAL_CC_SHADER_TEXEL1)),
        flags=d.SHADER_RAYTRACE_ENABLED,
    )
    sphere.set_description(desc)
    rgb = _center_diffuse(view)
    assert rgb[1] > 0.5 and rgb[2] > 0.5 and rgb[0] < 0.1, rgb
