"""Independent full-frame fidelity gate.

Renders the same scene twice — once through the full rt64tpu engine
(public API), once with the brute-force NumPy oracle written directly
from the reference HLSL semantics (tests/np_reference.py) — and
requires SSIM >= 0.98. Unlike the golden-frame regression test (which
compares the engine to its own past output), this catches the engine
being consistently wrong.
"""

import numpy as np

import rt64tpu
from rt64tpu import descriptors as d
from rt64tpu.limits import SceneLimits
from rt64tpu.ops import math3d
from rt64tpu.utils.ssim import ssim

from tests import np_reference as ref

W, H = 96, 72

LIGHT = dict(
    pos=np.array([6.0, 10.0, 4.0]),
    diffuse=np.array([0.9, 0.85, 0.75]),
    attenuation_radius=100.0,
    attenuation_exponent=1.0,
    shadow_offset=0.0,
)
AMBIENT = (0.25, 0.25, 0.3)


def _checker(size=8, c0=(230, 230, 230), c1=(40, 40, 48)):
    img = np.zeros((size, size, 4), np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    m = ((xx + yy) % 2).astype(bool)
    img[~m, :3] = c0
    img[m, :3] = c1
    img[..., 3] = 255
    return img


def _pyramid():
    """4 side faces, outward winding, flat normals. No base: it would
    be coplanar with the floor (z-fighting resolves differently between
    the engine's masked-min reduce and the oracle's list order)."""
    apex = np.array([0.0, 2.5, 0.0])
    b = [np.array([-1.5, 0.0, -1.5]), np.array([1.5, 0.0, -1.5]),
         np.array([1.5, 0.0, 1.5]), np.array([-1.5, 0.0, 1.5])]
    tris = []
    for i in range(4):
        p0, p1 = b[i], b[(i + 1) % 4]
        n = np.cross(p1 - p0, apex - p0)
        n = n / np.linalg.norm(n)
        tris.append((p0, p1, apex, n))
    return tris


def _scene_data():
    vmat = math3d.look_at_rh((0.0, 4.0, 10.0), (0.0, 1.0, 0.0),
                             (0.0, 1.0, 0.0)).astype(np.float64)
    proj = math3d.perspective_fov_rh(
        45.0 * np.pi / 180.0, W / H, 0.1, 1000.0).astype(np.float64)
    checker = _checker()
    floor_v = [np.array([-8.0, 0.0, -8.0]), np.array([8.0, 0.0, -8.0]),
               np.array([8.0, 0.0, 8.0]), np.array([-8.0, 0.0, 8.0])]
    floor_uv = [np.array([0.0, 0.0]), np.array([4.0, 0.0]),
                np.array([4.0, 4.0]), np.array([0.0, 4.0])]
    up = np.array([0.0, 1.0, 0.0])
    tris = [
        dict(v=(floor_v[0], floor_v[2], floor_v[1]), n=(up, up, up),
             uv=(floor_uv[0], floor_uv[2], floor_uv[1]),
             texture=checker[..., :3].astype(np.float64) / 255.0, lit=True),
        dict(v=(floor_v[0], floor_v[3], floor_v[2]), n=(up, up, up),
             uv=(floor_uv[0], floor_uv[3], floor_uv[2]),
             texture=checker[..., :3].astype(np.float64) / 255.0, lit=True),
    ]
    for p0, p1, p2, n in _pyramid():
        tris.append(dict(v=(p0, p1, p2), n=(n, n, n), uv=None,
                         color=np.array([0.85, 0.3, 0.25]), lit=True))
    return dict(
        view_i=np.linalg.inv(vmat),
        proj_i=np.linalg.inv(proj),
        view=vmat,
        proj=proj,
        tris=tris,
        light=LIGHT,
        ambient=np.array(AMBIENT),
        material=dict(ignore_normal=0.0, shadow_ray_bias=0.0),
        checker=checker,
    )


def _render_engine(data):
    limits = SceneLimits(
        max_vertices=256, max_triangles=256, max_instances=4,
        max_textures=4, texel_pool=1 << 10,
    )
    device = rt64tpu.Device(limits)
    scene = rt64tpu.Scene(device)
    view = rt64tpu.View(scene, width=W, height=H)

    checker_tex = rt64tpu.Texture(device, d.TextureDesc(
        bytes=data["checker"].tobytes(), format=d.TEXTURE_FORMAT_RGBA8,
        width=8, height=8,
    ))
    # color = TEXEL0 (single-input combiner), point filter, wrap/wrap.
    sid_tex = d.MATERIAL_CC_SHADER_TEXEL0 << 9
    tex_shader = rt64tpu.Shader(
        device, sid_tex, filter=d.SHADER_FILTER_POINT,
        h_addr=d.SHADER_ADDRESSING_WRAP, v_addr=d.SHADER_ADDRESSING_WRAP,
    )
    # color = INPUT_1.
    sid_col = d.MATERIAL_CC_SHADER_INPUT_1 << 9
    col_shader = rt64tpu.Shader(device, sid_col)

    # Floor: pos4 + nrm3 + uv2 interleaved.
    fv, fuv = [], []
    floor_rows = []
    corners = [(-8, 0, -8, 0, 0), (8, 0, -8, 4, 0), (8, 0, 8, 4, 4),
               (-8, 0, 8, 0, 4)]
    for x, y, z, u, v in corners:
        floor_rows.append([x, y, z, 1.0, 0, 1, 0, u, v])
    fdata = np.array(floor_rows, np.float32)
    fidx = np.array([0, 2, 1, 0, 3, 2], np.uint32)
    floor_mesh = rt64tpu.Mesh(device, d.MESH_RAYTRACE_ENABLED)
    floor_mesh.set_mesh(fdata, 4, fdata.shape[1] * 4, fidx)
    floor = rt64tpu.Instance(scene)
    floor.set_description(d.InstanceDesc(
        mesh=floor_mesh, transform=np.eye(4, dtype=np.float32),
        diffuse_texture=checker_tex, shader=tex_shader,
        material=d.Material(),
    ))

    # Pyramid: pos4 + nrm3 + input1 rgb (no uv, no alpha).
    rows, idx = [], []
    for i, (p0, p1, p2, n) in enumerate(_pyramid()):
        for p in (p0, p1, p2):
            rows.append(list(p) + [1.0] + list(n) + [0.85, 0.3, 0.25])
        idx += [3 * i, 3 * i + 1, 3 * i + 2]
    pdata = np.array(rows, np.float32)
    pmesh = rt64tpu.Mesh(device, d.MESH_RAYTRACE_ENABLED)
    pmesh.set_mesh(pdata, len(rows), pdata.shape[1] * 4,
                   np.array(idx, np.uint32))
    pyr = rt64tpu.Instance(scene)
    pyr.set_description(d.InstanceDesc(
        mesh=pmesh, transform=np.eye(4, dtype=np.float32),
        shader=col_shader, material=d.Material(),
    ))

    scene.set_lights([d.Light(
        position=tuple(LIGHT["pos"]), diffuse_color=tuple(LIGHT["diffuse"]),
        attenuation_radius=LIGHT["attenuation_radius"], point_radius=0.0,
        specular_color=(0.0, 0.0, 0.0),
        attenuation_exponent=LIGHT["attenuation_exponent"],
        shadow_offset=LIGHT["shadow_offset"],
    )])
    scene.set_description(d.SceneDesc(ambient_base_color=AMBIENT))
    view.set_perspective(data["view"].astype(np.float32),
                         45.0 * np.pi / 180.0, 0.1, 1000.0)
    view.set_description(d.ViewDesc(di_samples=1, gi_samples=0))
    device.draw()
    return view.framebuffer()[..., :3].astype(np.float64) / 255.0


def test_engine_matches_numpy_oracle():
    data = _scene_data()
    eng = _render_engine(data)
    oracle = np.clip(ref.render(data, W, H), 0.0, 1.0)
    score = ssim(eng, oracle, data_range=1.0)
    # Useful diagnostics on failure.
    diff = np.abs(eng - oracle)
    assert score >= 0.98, (
        f"SSIM {score:.4f} < 0.98 vs independent oracle; "
        f"mean|diff|={diff.mean():.4f} max={diff.max():.4f}"
    )
    # The shadow must actually be there in both (not trivially matching
    # a flat image): the pyramid shades part of the floor.
    assert oracle.std() > 0.05
