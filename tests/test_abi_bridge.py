"""ABI bridge tests: ctypes struct marshalling round-trips (the Python
half of the C ABI, without needing the compiled .so)."""

import ctypes

import numpy as np

from rt64tpu.abi import bridge
from rt64tpu import descriptors as d


def test_material_struct_roundtrip():
    cm = bridge.CMaterial()
    cm.diffuseTexIndex = -1
    cm.reflectionFactor = 0.25
    cm.specularColor = bridge.Vec3(0.1, 0.2, 0.3)
    cm.diffuseColorMix = bridge.Vec4(0.5, 0.6, 0.7, -0.5)
    cm.lightGroupMaskBits = 0xFFFFFFFF
    cm.solidAlphaMultiplier = 0.75
    cm.enabledAttributes = d.ATTRIBUTE_REFLECTION_FACTOR
    mat = bridge._at(bridge.CMaterial, ctypes.addressof(cm)).to_py()
    assert mat.reflection_factor == np.float32(0.25)
    assert mat.specular_color == (
        np.float32(0.1), np.float32(0.2), np.float32(0.3))
    assert mat.light_group_mask_bits == 0xFFFFFFFF
    assert mat.enabled_attributes == d.ATTRIBUTE_REFLECTION_FACTOR


def test_matrix_roundtrip():
    m = bridge.Matrix4()
    src = np.arange(16, dtype=np.float32).reshape(4, 4)
    for i in range(4):
        for j in range(4):
            m.m[i][j] = src[i, j]
    np.testing.assert_array_equal(m.np(), src)


def test_device_scene_lifecycle_through_bridge():
    h_dev = bridge.create_device(0)
    h_scene = bridge.create_scene(h_dev)
    h_view = bridge.create_view(h_scene)

    sd = bridge.CSceneDesc()
    sd.ambientBaseColor = bridge.Vec3(0.2, 0.2, 0.2)
    sd.giDiffuseStrength = 0.7
    bridge.set_scene_description(h_scene, ctypes.addressof(sd))
    scene = bridge._get(h_scene)
    assert scene.desc.gi_diffuse_strength == np.float32(0.7)

    lights = (bridge.CLight * 2)()
    lights[0].position = bridge.Vec3(1, 2, 3)
    lights[0].diffuseColor = bridge.Vec3(1, 1, 1)
    lights[0].attenuationRadius = 100.0
    lights[0].groupBits = 1
    lights[1].position = bridge.Vec3(-1, 5, 0)
    lights[1].diffuseColor = bridge.Vec3(1, 0, 0)
    lights[1].attenuationRadius = 50.0
    lights[1].groupBits = 2
    bridge.set_scene_lights(h_scene, ctypes.addressof(lights), 2)
    assert len(scene.lights) == 2
    assert scene.lights[1].group_bits == 2

    vd = bridge.CViewDesc()
    vd.resolutionScale = 1.0
    vd.diSamples = 1
    vd.giSamples = 0
    vd.maxLights = 2
    bridge.set_view_description(h_view, ctypes.addressof(vd))
    view = bridge._get(h_view)
    assert view.desc.gi_samples == 0

    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    bridge.get_view_frame_size(h_view, ctypes.addressof(w), ctypes.addressof(h))
    assert w.value == view.width and h.value == view.height

    bridge.destroy_view(h_view)
    bridge.destroy_scene(h_scene)
    bridge.destroy_device(h_dev)
    assert bridge._get(h_dev) is None


def test_mesh_upload_through_bridge():
    h_dev = bridge.create_device(0)
    verts = np.zeros((3, 10), np.float32)
    verts[:, 3] = 1.0
    idx = np.array([0, 1, 2], np.uint32)
    h_mesh = bridge.create_mesh(h_dev, 1)
    bridge.set_mesh(
        h_mesh,
        verts.ctypes.data, 3, verts.strides[0],
        idx.ctypes.data, 3,
    )
    mesh = bridge._get(h_mesh)
    assert mesh.vertex_count == 3
    assert mesh.indices.shape == (1, 3)
    bridge.destroy_mesh(h_mesh)
    bridge.destroy_device(h_dev)
