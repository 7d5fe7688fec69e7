"""Independent full-frame fidelity gate, parametrized over feature scenes.

Renders the same scene twice — once through the full rt64tpu engine
(public API), once with the brute-force NumPy oracle written directly
from the reference HLSL semantics (tests/np_reference.py) — and
requires SSIM >= 0.98. Unlike the golden-frame regression test (which
compares the engine to its own past output), this catches the engine
being consistently wrong.

Feature scenes (each isolates one hard-to-get-right reference path):
  base        primary + 1 light + hard shadow + compose
  alpha       ordered front-to-back alpha resolve (PrimaryRayGen:86-177)
  fog         N64 clip-space fog fold-in (Fog.hlsli:5-19)
  sky         sky-plane sampling (BgSky.hlsli:20-70)
  reflection  one fresnel bounce + shine (ReflectionRayGen.hlsl)
  refraction  refraction bounce (RefractionRayGen.hlsl)
"""

import numpy as np
import pytest

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


def _sky_gradient(size=32):
    """Smooth sky texture: vertical gradient + a horizontal tint band."""
    img = np.zeros((size, size, 4), np.uint8)
    yy = np.linspace(0.0, 1.0, size)[:, None]
    xx = np.linspace(0.0, 1.0, size)[None, :]
    img[..., 0] = (80 + 120 * yy + 20 * np.sin(xx * 6.0)).astype(np.uint8)
    img[..., 1] = (120 + 90 * yy).astype(np.uint8)
    img[..., 2] = (200 - 60 * yy).astype(np.uint8)
    img[..., 3] = 255
    return img


def _pyramid(apex_y=2.5, half=1.5, cx=0.0, cz=0.0):
    """4 side faces, outward winding, flat normals. No base: it would
    be coplanar with the floor (z-fighting resolves differently between
    the engine's masked-min reduce and the oracle's list order)."""
    apex = np.array([cx, apex_y, cz])
    b = [np.array([cx - half, 0.0, cz - half]),
         np.array([cx + half, 0.0, cz - half]),
         np.array([cx + half, 0.0, cz + half]),
         np.array([cx - half, 0.0, cz + half])]
    tris = []
    for i in range(4):
        p0, p1 = b[i], b[(i + 1) % 4]
        n = np.cross(p1 - p0, apex - p0)
        n = n / np.linalg.norm(n)
        tris.append((p0, p1, apex, n))
    return tris


def _quad(x0, y0, x1, y1, z):
    """Camera-facing quad (normal +z; camera looks down -z).
    Returns (verts[4], idx[6], normal)."""
    verts = [np.array([x0, y0, z]), np.array([x1, y0, z]),
             np.array([x1, y1, z]), np.array([x0, y1, z])]
    return verts, [0, 1, 2, 0, 2, 3], np.array([0.0, 0.0, 1.0])


# --- shared scene scaffolding -------------------------------------------

def _camera():
    vmat = math3d.look_at_rh((0.0, 4.0, 10.0), (0.0, 1.0, 0.0),
                             (0.0, 1.0, 0.0)).astype(np.float64)
    proj = math3d.perspective_fov_rh(
        45.0 * np.pi / 180.0, W / H, 0.1, 1000.0).astype(np.float64)
    return vmat, proj


FLOOR_COLOR = (0.8, 0.78, 0.72)


def _floor_tris(fog=None):
    up = np.array([0.0, 1.0, 0.0])
    c = [np.array([-8.0, 0.0, -8.0]), np.array([8.0, 0.0, -8.0]),
         np.array([8.0, 0.0, 8.0]), np.array([-8.0, 0.0, 8.0])]
    color = np.array(FLOOR_COLOR)
    t = [
        dict(v=(c[0], c[2], c[1]), n=(up, up, up), uv=None, color=color,
             lit=True),
        dict(v=(c[0], c[3], c[2]), n=(up, up, up), uv=None, color=color,
             lit=True),
    ]
    if fog is not None:
        for tri in t:
            tri["fog"] = fog
    return t


def _pyramid_tris(color=(0.85, 0.3, 0.25), fog=None, **kw):
    t = []
    for p0, p1, p2, n in _pyramid(**kw):
        tri = dict(v=(p0, p1, p2), n=(n, n, n), uv=None,
                   color=np.array(color), lit=True)
        if fog is not None:
            tri["fog"] = fog
        t.append(tri)
    return t


# --- engine-side builders ------------------------------------------------

class EngineScene:
    def __init__(self, max_reflections=0, sky_tex=None, sky_yaw=0.0):
        self.limits = SceneLimits(
            max_vertices=512, max_triangles=512, max_instances=8,
            max_textures=4, texel_pool=1 << 12, alpha_triangles=64,
        )
        self.device = rt64tpu.Device(self.limits)
        self.scene = rt64tpu.Scene(self.device)
        self.view = rt64tpu.View(self.scene, width=W, height=H)
        self.view.max_reflections = max_reflections
        vmat, _ = _camera()
        if sky_tex is not None:
            tex = rt64tpu.Texture(self.device, d.TextureDesc(
                bytes=sky_tex.tobytes(), format=d.TEXTURE_FORMAT_RGBA8,
                width=sky_tex.shape[1], height=sky_tex.shape[0],
            ))
            self.view.set_sky_plane(tex)
        self.scene.set_lights([d.Light(
            position=tuple(LIGHT["pos"]),
            diffuse_color=tuple(LIGHT["diffuse"]),
            attenuation_radius=LIGHT["attenuation_radius"], point_radius=0.0,
            specular_color=(0.0, 0.0, 0.0),
            attenuation_exponent=LIGHT["attenuation_exponent"],
            shadow_offset=LIGHT["shadow_offset"],
        )])
        self.scene.set_description(d.SceneDesc(
            ambient_base_color=AMBIENT, sky_yaw_offset=sky_yaw,
        ))
        self.view.set_perspective(vmat.astype(np.float32),
                                  45.0 * np.pi / 180.0, 0.1, 1000.0)
        self.view.set_description(d.ViewDesc(di_samples=1, gi_samples=0))
        self._color_shader = None
        self._alpha_shader = None

    def color_shader(self):
        if self._color_shader is None:
            sid = d.MATERIAL_CC_SHADER_INPUT_1 << 9
            self._color_shader = rt64tpu.Shader(self.device, sid)
        return self._color_shader

    def alpha_shader(self):
        if self._alpha_shader is None:
            # color = INPUT_1 with opt_alpha: alpha = input alpha.
            sid = (d.MATERIAL_CC_SHADER_INPUT_1 << 9) \
                | (d.MATERIAL_CC_SHADER_INPUT_1 << 21) | (1 << 24)
            self._alpha_shader = rt64tpu.Shader(self.device, sid)
        return self._alpha_shader

    def add_mesh(self, rows, idx, shader, material, flags=0, texture=None):
        data = np.asarray(rows, np.float32)
        mesh = rt64tpu.Mesh(self.device, d.MESH_RAYTRACE_ENABLED)
        mesh.set_mesh(data, data.shape[0], data.shape[1] * 4,
                      np.asarray(idx, np.uint32))
        inst = rt64tpu.Instance(self.scene)
        inst.set_description(d.InstanceDesc(
            mesh=mesh, transform=np.eye(4, dtype=np.float32),
            shader=shader, material=material, flags=flags,
            diffuse_texture=texture,
        ))
        return inst

    def add_color_tris(self, tris, material=None, alpha=None):
        """tris: oracle-format list (INPUT_1 rgb or rgba vertex color)."""
        rows, idx = [], []
        shader = self.color_shader() if alpha is None else self.alpha_shader()
        for t in tris:
            base = len(rows)
            col = list(t["color"]) + ([alpha] if alpha is not None else [])
            for p, n in zip(t["v"], t["n"]):
                rows.append(list(p) + [1.0] + list(n) + col)
            idx += [base, base + 1, base + 2]
        return self.add_mesh(rows, idx, shader, material or d.Material())

    def render(self):
        """Draw until the alpha-shade capacity auto-grow converges
        (view.py:92-107): an overflow frame renders with alpha layers
        missing and doubles the boost for the next frame. The contract
        is convergence after at most a few doublings (boost caps at 8);
        assert it so capacity oscillation would fail loudly."""
        for _ in range(5):
            self.device.draw()
            if int(np.asarray(self.view._renderer._last.alpha_dropped)) == 0:
                break
        dropped = int(np.asarray(self.view._renderer._last.alpha_dropped))
        assert dropped == 0, f"alpha capacity never converged: {dropped}"
        return (self.view.framebuffer()[..., :3].astype(np.float64)
                / 255.0)


# --- the feature scenes ---------------------------------------------------

def _scene_base():
    """Checker-textured floor (point filter) + vertex-color pyramid —
    the original config-1-class oracle scene."""
    checker = _checker()
    ftex = checker[..., :3].astype(np.float64) / 255.0
    fc = [np.array([-8.0, 0.0, -8.0]), np.array([8.0, 0.0, -8.0]),
          np.array([8.0, 0.0, 8.0]), np.array([-8.0, 0.0, 8.0])]
    fuv = [np.array([0.0, 0.0]), np.array([4.0, 0.0]),
           np.array([4.0, 4.0]), np.array([0.0, 4.0])]
    up = np.array([0.0, 1.0, 0.0])
    tris = [
        dict(v=(fc[0], fc[2], fc[1]), n=(up, up, up),
             uv=(fuv[0], fuv[2], fuv[1]), texture=ftex, lit=True),
        dict(v=(fc[0], fc[3], fc[2]), n=(up, up, up),
             uv=(fuv[0], fuv[3], fuv[2]), texture=ftex, lit=True),
    ] + _pyramid_tris()

    eng = EngineScene()
    tex = rt64tpu.Texture(eng.device, d.TextureDesc(
        bytes=checker.tobytes(), format=d.TEXTURE_FORMAT_RGBA8,
        width=8, height=8,
    ))
    sid_tex = d.MATERIAL_CC_SHADER_TEXEL0 << 9
    tex_shader = rt64tpu.Shader(
        eng.device, sid_tex, filter=d.SHADER_FILTER_POINT,
        h_addr=d.SHADER_ADDRESSING_WRAP, v_addr=d.SHADER_ADDRESSING_WRAP,
    )
    rows = []
    corners = [(-8, 0, -8, 0, 0), (8, 0, -8, 4, 0), (8, 0, 8, 4, 4),
               (-8, 0, 8, 0, 4)]
    for x, y, z, u, v in corners:
        rows.append([x, y, z, 1.0, 0, 1, 0, u, v])
    eng.add_mesh(rows, [0, 2, 1, 0, 3, 2], tex_shader, d.Material(),
                 texture=tex)
    eng.add_color_tris(_pyramid_tris())
    return tris, eng, {}


def _scene_alpha():
    """Two overlapping unlit alpha quads over a lit floor + pyramid:
    exercises ordered front-to-back resolve + alpha shadow rules."""
    tris = _floor_tris() + _pyramid_tris(cx=0.0, cz=-2.0)
    quads = []
    for (x0, y0, x1, y1, z), color, alpha in (
        ((-3.0, 0.3, 1.0, 3.3, 2.0), (0.9, 0.2, 0.2), 0.4),
        ((-1.0, 0.6, 3.0, 3.0, 4.0), (0.2, 0.3, 0.9), 0.6),
    ):
        verts, idx, nrm = _quad(x0, y0, x1, y1, z)
        for a, b, c in np.asarray(idx).reshape(-1, 3):
            quads.append(dict(
                v=(verts[a], verts[b], verts[c]), n=(nrm, nrm, nrm),
                uv=None, color=np.array(color), alpha=alpha, lit=False,
            ))
    eng = EngineScene()
    eng.add_color_tris(_floor_tris())
    eng.add_color_tris(_pyramid_tris(cx=0.0, cz=-2.0))
    unlit = d.Material(light_group_mask_bits=0)
    for q2 in (quads[:2], quads[2:]):
        eng.add_color_tris(
            [dict(q, color=q["color"]) for q in q2],
            material=unlit, alpha=q2[0]["alpha"],
        )
    return tris + quads, eng, {}


def _scene_fog():
    fog = dict(color=(0.6, 0.7, 0.9), mul=120.0, offset=20.0)
    tris = _floor_tris(fog=fog) + _pyramid_tris(fog=fog)
    mat = d.Material(fog_enabled=1, fog_color=fog["color"],
                     fog_mul=fog["mul"], fog_offset=fog["offset"])
    eng = EngineScene()
    eng.add_color_tris(_floor_tris(), material=mat)
    eng.add_color_tris(_pyramid_tris(), material=mat)
    return tris, eng, {}


def _scene_sky():
    sky_tex = _sky_gradient()
    yaw = 0.3
    tris = _floor_tris() + _pyramid_tris()
    eng = EngineScene(sky_tex=sky_tex, sky_yaw=yaw)
    eng.add_color_tris(_floor_tris())
    eng.add_color_tris(_pyramid_tris())
    sky = dict(
        texture=sky_tex.astype(np.float64) / 255.0,
        viewport=(float(W), float(H)), yaw_offset=yaw,
        diffuse_mult=(1.0, 1.0, 1.0),
    )
    return tris, eng, dict(sky=sky)


def _scene_reflection():
    refl = dict(factor=0.5, fresnel=0.3, shine=0.4)
    floor = _floor_tris()
    for t in floor:
        t["reflection"] = refl
    tris = floor + _pyramid_tris()
    mat = d.Material(reflection_factor=refl["factor"],
                     reflection_fresnel_factor=refl["fresnel"],
                     reflection_shine_factor=refl["shine"])
    eng = EngineScene(max_reflections=1)
    eng.add_color_tris(_floor_tris(), material=mat)
    eng.add_color_tris(_pyramid_tris())
    return tris, eng, {}


def _scene_refraction():
    """An unlit refractive alpha pane in front of the pyramid."""
    eta = 0.8
    verts, idx, nrm = _quad(-2.5, 0.2, 2.5, 3.2, 3.0)
    pane = []
    for a, b, c in np.asarray(idx).reshape(-1, 3):
        pane.append(dict(
            v=(verts[a], verts[b], verts[c]), n=(nrm, nrm, nrm), uv=None,
            color=np.array((0.7, 0.85, 0.95)), alpha=0.4, lit=False,
            refraction=eta,
        ))
    tris = _floor_tris() + _pyramid_tris(cz=-2.0) + pane
    mat = d.Material(light_group_mask_bits=0, refraction_factor=eta)
    eng = EngineScene()
    eng.add_color_tris(_floor_tris())
    eng.add_color_tris(_pyramid_tris(cz=-2.0))
    eng.add_color_tris(pane, material=mat, alpha=0.4)
    return tris, eng, {}


SCENES = {
    "base": _scene_base,
    "alpha": _scene_alpha,
    "fog": _scene_fog,
    "sky": _scene_sky,
    "reflection": _scene_reflection,
    "refraction": _scene_refraction,
}


@pytest.mark.parametrize("name", sorted(SCENES))
def test_engine_matches_numpy_oracle(name):
    vmat, proj = _camera()
    tris, eng, extra = SCENES[name]()
    scene = dict(
        view_i=np.linalg.inv(vmat), proj_i=np.linalg.inv(proj),
        view=vmat, proj=proj, tris=tris, light=LIGHT,
        ambient=np.array(AMBIENT),
        material=dict(ignore_normal=0.0, shadow_ray_bias=0.0),
        **extra,
    )
    eng_img = eng.render()
    oracle = np.clip(ref.render(scene, W, H), 0.0, 1.0)
    score = ssim(eng_img, oracle, data_range=1.0)
    diff = np.abs(eng_img - oracle)
    assert score >= 0.98, (
        f"[{name}] SSIM {score:.4f} < 0.98 vs independent oracle; "
        f"mean|diff|={diff.mean():.4f} max={diff.max():.4f}"
    )
    # Not trivially matching a flat image.
    assert oracle.std() > 0.02, f"[{name}] oracle image nearly flat"
