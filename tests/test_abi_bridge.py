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


def test_inspector_command_writes_through_to_host_material():
    """The ImGui-material-panel analog: a 'set material.*' command must
    mutate the HOST's RT64_MATERIAL struct in place
    (rt64_inspector.cpp:226-309 semantics)."""
    h_dev = bridge.create_device(0)
    h_ins = bridge.create_inspector(h_dev)

    cm = bridge.CMaterial()
    cm.solidAlphaMultiplier = 1.0
    cm.specularColor = bridge.Vec3(0.1, 0.2, 0.3)
    name = b"test_mat"
    bridge.set_material_inspector(
        h_ins, ctypes.addressof(cm), ctypes.cast(name, ctypes.c_void_p).value
    )

    def cmd(s):
        buf = ctypes.create_string_buffer(bridge.RT64TPU_INSPECTOR_REPLY_SIZE)
        handled = bridge.handle_message_inspector(
            h_ins, bridge.RT64TPU_MESSAGE_COMMAND,
            ctypes.cast(ctypes.create_string_buffer(s.encode()),
                        ctypes.c_void_p).value,
            ctypes.addressof(buf),
        )
        assert handled == 1
        return buf.value.decode()

    assert cmd("get material.solid_alpha_multiplier") == "1"
    assert cmd("set material.solid_alpha_multiplier 0.25") == "OK"
    assert abs(cm.solidAlphaMultiplier - 0.25) < 1e-6  # host memory changed
    assert cmd("set material.specular_color 0.9 0.8 0.7") == "OK"
    assert abs(cm.specularColor.x - 0.9) < 1e-6
    assert cmd("get material.specular_color").startswith("0.9")
    assert "solid_alpha_multiplier" in cmd("list material")
    assert cmd("get material.bogus_field").startswith("ERR")

    # Unknown messages are not handled (parity with WndProc forwarding).
    assert bridge.handle_message_inspector(h_ins, 0x111, 0, 0) == 0

    # Lights: edits land in the host's RT64_LIGHT array.
    lights = (bridge.CLight * 1)()
    lights[0].diffuseColor = bridge.Vec3(1, 1, 1)
    count = ctypes.c_int(1)
    bridge.set_lights_inspector(
        h_ins, ctypes.addressof(lights), ctypes.addressof(count), 8
    )
    assert cmd("set light.0.diffuse_color 0 1 0") == "OK"
    assert lights[0].diffuseColor.y == 1.0 and lights[0].diffuseColor.x == 0.0

    bridge.destroy_inspector(h_ins)
    bridge.destroy_device(h_dev)
