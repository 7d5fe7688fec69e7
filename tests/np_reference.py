"""Independent brute-force NumPy frame renderer — the fidelity oracle.

Written directly from the reference's HLSL semantics (PrimaryRayGen.hlsl
camera setup, Lights.hlsli ComputeLight/TraceShadow, ComposePS.hlsl),
NOT from the JAX engine: it shares no code with rt64tpu's hot path, so
an SSIM match against it is evidence the engine implements the spec,
not merely itself (the round-1 golden test only compared the engine to
its own output).

Scope (BASELINE config-1 class): primary rays, closest opaque hit,
point/vertex-color shading, one point light with hard shadows,
ambient-as-indirect, ComposePS. No alpha traversal, GI, reflection,
refraction, fog, or sky — the test scene is constructed to keep those
paths inert in the engine too.
"""

from __future__ import annotations

import numpy as np

RAY_MIN = 0.1  # Ray.hlsli:8
RAY_MAX = 100000.0


def primary_ray(px, py, w, h, proj_i, view_i):
    """PrimaryRayGen.hlsl:33-40 (zero jitter)."""
    dx = ((px + 0.5) / w) * 2.0 - 1.0
    dy = ((py + 0.5) / h) * 2.0 - 1.0
    target = np.array([dx, -dy, 1.0, 1.0]) @ proj_i
    d = np.array([target[0], target[1], target[2], 0.0]) @ view_i
    origin = view_i[3, :3]
    return origin, d[:3]


def closest_hit(origin, d, tris, t_min=RAY_MIN, t_max=RAY_MAX,
                cull_backface=True):
    """Brute-force Moller-Trumbore. tris: list of dicts with v0/v1/v2.
    Front face: det > 0 (triangleNormal = cross(e1, e2) convention)."""
    best_t, best_i, best_uv = None, -1, (0.0, 0.0)
    for i, tri in enumerate(tris):
        v0, v1, v2 = tri["v"]
        e1 = v1 - v0
        e2 = v2 - v0
        pvec = np.cross(d, e2)
        det = float(e1 @ pvec)
        if cull_backface:
            if det <= 1e-9:
                continue
        elif abs(det) <= 1e-9:
            continue
        inv = 1.0 / det
        tvec = origin - v0
        u = float(tvec @ pvec) * inv
        if u < 0.0 or u > 1.0:
            continue
        qvec = np.cross(tvec, e1)
        v = float(d @ qvec) * inv
        if v < 0.0 or u + v > 1.0:
            continue
        t = float(e2 @ qvec) * inv
        if t < t_min or t > t_max:
            continue
        if best_t is None or t < best_t:
            best_t, best_i, best_uv = t, i, (u, v)
    return best_t, best_i, best_uv


def point_sample(texture, u, v):
    """Quad-pool point filter: nearest of the 4 bilinear corners under
    wrap addressing (texture.py point path; D3D point sampler)."""
    h, w = texture.shape[:2]
    x = np.mod(u * w - 0.5, w)
    y = np.mod(v * h - 0.5, h)
    x0 = int(np.floor(x))
    y0 = int(np.floor(y))
    fx = x - x0
    fy = y - y0
    xi = (x0 + (1 if fx >= 0.5 else 0)) % w
    yi = (y0 + (1 if fy >= 0.5 else 0)) % h
    return texture[yi, xi]


def render(scene, w, h):
    """scene: dict with keys
      view_i, proj_i: 4x4 row-vector matrices
      tris: list of {v: (v0,v1,v2), n: (n0,n1,n2), uv: (uv0,uv1,uv2),
                     color: rgb or None, texture: (H,W,3) or None,
                     lit: bool}
      light: {pos, diffuse, attenuation_radius, attenuation_exponent,
              shadow_offset}
      ambient: rgb
      material: {ignore_normal, shadow_ray_bias}
    Returns (h, w, 3) float image in [0, 1]-ish linear space.
    """
    img = np.zeros((h, w, 3), np.float64)
    li = scene["light"]
    mat = scene["material"]
    amb = np.asarray(scene["ambient"], np.float64)
    for py in range(h):
        for px in range(w):
            origin, d = primary_ray(px, py, w, h, scene["proj_i"],
                                    scene["view_i"])
            t, i, (u, v) = closest_hit(origin, d, scene["tris"])
            if i < 0:
                continue  # background black
            tri = scene["tris"][i]
            w0 = 1.0 - u - v
            pos = origin + d * t
            n0, n1, n2 = tri["n"]
            n = n0 * w0 + n1 * u + n2 * v
            nl = np.linalg.norm(n)
            v0, v1, v2 = tri["v"]
            gn = np.cross(v1 - v0, v2 - v0)
            n = n / nl if nl > 0 else gn / np.linalg.norm(gn)
            if gn @ d > 0.0:
                n = -n
            # Combiner: single-input color (TEXEL0 or INPUT_1), alpha 1.
            if tri.get("texture") is not None:
                uv0, uv1, uv2 = tri["uv"]
                uu = uv0[0] * w0 + uv1[0] * u + uv2[0] * v
                vv = uv0[1] * w0 + uv1[1] * u + uv2[1] * v
                rgb = point_sample(tri["texture"], uu, vv)
            else:
                rgb = np.asarray(tri["color"], np.float64)

            if not tri.get("lit", True):
                img[py, px] = rgb * amb  # transparent path: color*(ambient)
                continue

            # CalculateLightIntensitySimple gate (Lights.hlsli:56-67).
            lvec = np.asarray(li["pos"], np.float64) - pos
            dist = np.linalg.norm(lvec)
            ndotl_s = float(n @ lvec) / max(dist, 1e-12)
            surf = max(ndotl_s + (1.0 - ndotl_s) * mat["ignore_normal"]
                       + 0.707106, 0.0)
            fall = max(1.0 - dist / li["attenuation_radius"], 0.0)
            sample_int = (fall ** li["attenuation_exponent"]) * surf \
                * float(np.sum(li["diffuse"]))
            direct = np.zeros(3)
            if sample_int > 1e-6:
                ldir = lvec / dist
                intensity = fall ** li["attenuation_exponent"]
                ndotl = max(float(n @ ldir), 0.0)
                lambert = (ndotl + (1.0 - ndotl) * mat["ignore_normal"]) \
                    * intensity
                s_t, s_i, _ = closest_hit(
                    pos, ldir, scene["tris"],
                    t_min=RAY_MIN + mat["shadow_ray_bias"],
                    t_max=dist - li["shadow_offset"], cull_backface=False)
                shadow = 0.0 if s_i >= 0 else 1.0
                direct = np.asarray(li["diffuse"], np.float64) * lambert \
                    * shadow
            # ComposePS: diffuse*(direct+indirect) at alpha 1; indirect
            # = ambient (gi_samples = 0 path).
            img[py, px] = rgb * (direct + amb)
    return img
