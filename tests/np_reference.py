"""Independent brute-force NumPy frame renderer — the fidelity oracle.

Written directly from the reference's HLSL semantics (PrimaryRayGen.hlsl
front-to-back alpha resolve, Fog.hlsli ComputeFogFromCamera,
BgSky.hlsli ComputeSkyPlaneUV/FakeEnvMapUV, ReflectionRayGen.hlsl,
RefractionRayGen.hlsl, Lights.hlsli ComputeLight/TraceShadow,
ComposePS.hlsl), NOT from the JAX engine: it shares no code with
rt64tpu's hot path, so an SSIM match against it is evidence the engine
implements the spec, not merely itself (the golden test only compares
the engine to its own past output).

Coverage (one feature scene each in test_fidelity.py):
  * primary rays + closest opaque hit + 1 point light + hard shadows
  * ordered front-to-back alpha resolve (PrimaryRayGen.hlsl:86-177)
  * N64 clip-space fog fold-in (Fog.hlsli:5-19, PrimaryRayGen:107-111)
  * sky-plane sampling (BgSky.hlsli:20-70)
  * one reflection bounce with fresnel + shine (ReflectionRayGen.hlsl)
  * refraction (RefractionRayGen.hlsl)
"""

from __future__ import annotations

import numpy as np

RAY_MIN = 0.1  # Ray.hlsli:8
RAY_MAX = 100000.0
EPSILON = 0.000001  # Constants.hlsli
APPLY_LIGHTS_MINIMUM_ALPHA = 0.5

M_PI = 3.14159265
M_TWO_PI = M_PI * 2.0
SCREEN_WIDTH = 320  # BgSky.hlsli:8-11
SCREEN_HEIGHT = 240
SKYBOX_WIDTH = 4 * SCREEN_WIDTH
SKYBOX_HEIGHT = 4 * SCREEN_HEIGHT


def primary_ray(px, py, w, h, proj_i, view_i):
    """PrimaryRayGen.hlsl:33-40 (zero jitter)."""
    dx = ((px + 0.5) / w) * 2.0 - 1.0
    dy = ((py + 0.5) / h) * 2.0 - 1.0
    target = np.array([dx, -dy, 1.0, 1.0]) @ proj_i
    d = np.array([target[0], target[1], target[2], 0.0]) @ view_i
    origin = view_i[3, :3]
    return origin, d[:3]


def _intersect(origin, d, tri, t_min, t_max, cull_backface):
    v0, v1, v2 = tri["v"]
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = np.cross(d, e2)
    det = float(e1 @ pvec)
    front_only = cull_backface and not tri.get("no_cull", False)
    if front_only:
        if det <= 1e-9:
            return None
    elif abs(det) <= 1e-9:
        return None
    inv = 1.0 / det
    tvec = origin - v0
    u = float(tvec @ pvec) * inv
    if u < 0.0 or u > 1.0:
        return None
    qvec = np.cross(tvec, e1)
    v = float(d @ qvec) * inv
    if v < 0.0 or u + v > 1.0:
        return None
    t = float(e2 @ qvec) * inv
    if t < t_min or t > t_max:
        return None
    return t, u, v


def closest_hit(origin, d, tris, t_min=RAY_MIN, t_max=RAY_MAX,
                cull_backface=True):
    """Brute-force Moller-Trumbore closest hit (opaque view of tris)."""
    best_t, best_i, best_uv = None, -1, (0.0, 0.0)
    for i, tri in enumerate(tris):
        hit = _intersect(origin, d, tri, t_min, t_max, cull_backface)
        if hit is None:
            continue
        t, u, v = hit
        if best_t is None or t < best_t:
            best_t, best_i, best_uv = t, i, (u, v)
    return best_t, best_i, best_uv


def all_hits(origin, d, tris, t_min=RAY_MIN, t_max=RAY_MAX,
             cull_backface=True):
    """All hits sorted front-to-back — the ordered any-hit insertion
    (rt64_shader.cpp:547-581) with zero depth bias."""
    hits = []
    for i, tri in enumerate(tris):
        h = _intersect(origin, d, tri, t_min, t_max, cull_backface)
        if h is not None:
            hits.append((h[0], i, h[1], h[2]))
    hits.sort(key=lambda h: h[0])
    return hits


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


def bilinear_sample(texture, u, v):
    """Bilinear wrap sampling (linear sampler, wrap/wrap)."""
    h, w = texture.shape[:2]
    x = np.mod(u * w - 0.5, w)
    y = np.mod(v * h - 0.5, h)
    x0 = int(np.floor(x)) % w
    y0 = int(np.floor(y)) % h
    x1 = (x0 + 1) % w
    y1 = (y0 + 1) % h
    fx = (u * w - 0.5) - np.floor(u * w - 0.5)
    fy = (v * h - 0.5) - np.floor(v * h - 0.5)
    a = texture[y0, x0] * (1 - fx) + texture[y0, x1] * fx
    b = texture[y1, x0] * (1 - fx) + texture[y1, x1] * fx
    return a * (1 - fy) + b * fy


def hit_color(tri, u, v):
    """Combiner output rgba for a hit: single-input color (TEXEL0 or
    INPUT_1), constant or per-tri alpha, solidAlphaMultiplier = 1."""
    if tri.get("texture") is not None:
        w0 = 1.0 - u - v
        uv0, uv1, uv2 = tri["uv"]
        uu = uv0[0] * w0 + uv1[0] * u + uv2[0] * v
        vv = uv0[1] * w0 + uv1[1] * u + uv2[1] * v
        if tri.get("filter") == "bilinear":
            rgb = bilinear_sample(tri["texture"], uu, vv)
        else:
            rgb = point_sample(tri["texture"], uu, vv)
    else:
        rgb = np.asarray(tri["color"], np.float64)
    return np.concatenate([rgb, [float(tri.get("alpha", 1.0))]])


def hit_normal(tri, d, u, v):
    """Interpolated normal, flipped against the geometric normal's
    facing (any-hit normalSign, rt64_shader.cpp:519-521)."""
    w0 = 1.0 - u - v
    n0, n1, n2 = tri["n"]
    n = n0 * w0 + n1 * u + n2 * v
    nl = np.linalg.norm(n)
    v0, v1, v2 = tri["v"]
    gn = np.cross(v1 - v0, v2 - v0)
    n = n / nl if nl > 0 else gn / np.linalg.norm(gn)
    if gn @ d > 0.0:
        n = -n
    return n


def fog_from_camera(scene, pos, fog):
    """ComputeFogFromCamera (Fog.hlsli:5-19)."""
    vp = scene["view"] @ scene["proj"]
    clip = np.array([pos[0], pos[1], pos[2], 1.0]) @ vp
    z = clip[2] * 2.0 - clip[3]
    winv = 1.0 / max(clip[3], 0.001)
    a = np.clip((z * winv * fog["mul"] + fog["offset"]) / 255.0, 0.0, 1.0)
    return np.asarray(fog["color"], np.float64), float(a)


def fog_from_origin(pos, origin, fog):
    """ComputeFogFromOrigin (Fog.hlsli:21-29)."""
    dist = float(np.linalg.norm(pos - origin))
    a = np.clip(((dist + fog["offset"]) / fog["mul"]) * 0.5, 0.0, 1.0)
    return np.asarray(fog["color"], np.float64), float(a)


def fresnel_reflect_amount(normal, incident, reflectivity, fresnel_mult):
    """FresnelReflectAmount (PrimaryRayGen.hlsl:25-29)."""
    ret = np.clip(1.0 + float(normal @ incident), EPSILON, 1.0) ** 5.0
    return reflectivity + (1.0 - reflectivity) * ret * fresnel_mult


def compute_sky_plane_uv(su, sv, view_i, viewport, yaw_offset):
    """ComputeSkyPlaneUV (BgSky.hlsli:20-52)."""
    vdir = view_i[2, :3]
    vdir = vdir / np.linalg.norm(vdir)
    sky_yaw = np.mod(
        yaw_offset + np.arctan2(vdir[0], -vdir[2]) + M_PI, M_TWO_PI
    )
    base_x = SCREEN_WIDTH * 360.0 * (sky_yaw - M_PI) / (90.0 * M_PI * 2.0)
    sky_pitch = np.arctan2(-vdir[1], np.sqrt(vdir[0] ** 2 + vdir[2] ** 2))
    pitch_deg = sky_pitch * 360.0 / (M_PI * 2.0)
    base_y = 360.0 * pitch_deg / 90.0 + 5.0 * (SCREEN_HEIGHT / 2.0)
    base_y = np.clip(base_y, SCREEN_HEIGHT, SKYBOX_HEIGHT)
    aspect = viewport[0] / viewport[1]
    base_x = base_x + SCREEN_WIDTH / 2.0 - (SCREEN_HEIGHT * aspect) / 2.0
    base_x = base_x / SKYBOX_WIDTH
    base_y = (SKYBOX_HEIGHT - base_y) / SKYBOX_HEIGHT
    ratio_division = aspect / (4.0 / 3.0)
    return base_x + su * 0.25 * ratio_division, base_y + sv * 0.25


def fake_env_map_uv(d, yaw_offset):
    """FakeEnvMapUV (BgSky.hlsli:14-18)."""
    yaw = np.mod(yaw_offset + np.arctan2(d[0], -d[2]) + M_PI, M_TWO_PI)
    pitch = np.mod(
        np.arctan2(-d[1], np.sqrt(d[0] ** 2 + d[2] ** 2)) + M_PI, M_TWO_PI
    )
    return yaw / M_TWO_PI, pitch / M_TWO_PI


def sample_sky_2d(scene, su, sv):
    """SampleSky2D (BgSky.hlsli:54-70): rgba; a=0 without a sky."""
    sky = scene.get("sky")
    if sky is None:
        return np.zeros(4)
    u, v = compute_sky_plane_uv(
        su, sv, scene["view_i"], sky["viewport"], sky.get("yaw_offset", 0.0)
    )
    c = bilinear_sample(sky["texture"], u, v).astype(np.float64).copy()
    c[:3] *= np.asarray(sky.get("diffuse_mult", (1.0, 1.0, 1.0)))
    return c


def sample_sky_plane(scene, d):
    """SampleSkyPlane (BgSky.hlsli:72-84)."""
    sky = scene.get("sky")
    if sky is None:
        return np.zeros(4)
    u, v = fake_env_map_uv(d, sky.get("yaw_offset", 0.0))
    c = bilinear_sample(sky["texture"], u, v).astype(np.float64).copy()
    c[:3] *= np.asarray(sky.get("diffuse_mult", (1.0, 1.0, 1.0)))
    return c


def compute_light(scene, pos, n, check_shadows):
    """ComputeLight for the single scene light, point radius 0
    (deterministic: no disk sampling), no specular (Lights.hlsli:70-113).
    Returns diffuse*lambert*shadow."""
    li = scene["light"]
    mat = scene["material"]
    lvec = np.asarray(li["pos"], np.float64) - pos
    dist = np.linalg.norm(lvec)
    ndotl_s = float(n @ lvec) / max(dist, 1e-12)
    surf = max(ndotl_s + (1.0 - ndotl_s) * mat["ignore_normal"]
               + 0.707106, 0.0)
    fall = max(1.0 - dist / li["attenuation_radius"], 0.0)
    sample_int = (fall ** li["attenuation_exponent"]) * surf \
        * float(np.sum(li["diffuse"]))
    if sample_int <= EPSILON:
        return np.zeros(3)
    ldir = lvec / dist
    intensity = fall ** li["attenuation_exponent"]
    ndotl = max(float(n @ ldir), 0.0)
    lambert = (ndotl + (1.0 - ndotl) * mat["ignore_normal"]) * intensity
    shadow = 1.0
    if check_shadows:
        shadow = shadow_factor(
            scene, pos, ldir,
            t_min=RAY_MIN + mat["shadow_ray_bias"],
            t_max=dist - li["shadow_offset"])
    return np.asarray(li["diffuse"], np.float64) * lambert * shadow


def shadow_factor(scene, pos, ldir, t_min, t_max):
    """TraceShadow via the shadow any-hit rules (rt64_shader.cpp:611-662):
    opt_alpha combiners subtract clamp(alpha * shadowAlphaMultiplier)
    from the payload (order-independent); everything else fully blocks.
    A tri is alpha-class iff it carries an explicit "alpha" key."""
    f = 1.0
    for t, i, u, v in all_hits(pos, ldir, scene["tris"], t_min=t_min,
                               t_max=t_max, cull_backface=False):
        tri = scene["tris"][i]
        if "alpha" in tri:
            a = np.clip(hit_color(tri, u, v)[3], 0.0, 1.0)
            f = max(f - a, 0.0)
            if f <= 0.0:
                return 0.0
        else:
            return 0.0
    return f


def _resolve_alpha_hits(scene, origin, d, hits, amb, primary):
    """The shared front-to-back alpha resolve loop
    (PrimaryRayGen.hlsl:86-177; Reflection/RefractionRayGen variants).
    Returns a dict of the resolved state."""
    res_color = np.zeros(3)
    res_a = 1.0
    transparent = np.zeros(3)
    refl_alpha = 0.0
    refr_alpha = 0.0
    stored = None  # (pos, normal, tri_index)
    last = None  # last processed hit (reflection-pass lighting source)
    for t, i, u, v in hits:
        tri = scene["tris"][i]
        hc = hit_color(tri, u, v)
        alpha_contrib = res_a * hc[3]
        if alpha_contrib >= EPSILON:
            uses_lighting = tri.get("lit", True)
            apply_lighting = uses_lighting and hc[3] > APPLY_LIGHTS_MINIMUM_ALPHA
            pos = origin + d * t
            n = hit_normal(tri, d, u, v)
            store_hit = False

            fog = tri.get("fog")
            if fog is not None:
                if primary:
                    frgb, fa = fog_from_camera(scene, pos, fog)
                else:
                    frgb, fa = fog_from_origin(pos, origin, fog)
                transparent += frgb * fa * alpha_contrib
                alpha_contrib *= (1.0 - fa)

            refl = tri.get("reflection")
            if refl is not None and refl["factor"] > EPSILON:
                fres = fresnel_reflect_amount(
                    n, d, refl["factor"], refl.get("fresnel", 0.0))
                refl_alpha = fres * alpha_contrib  # assignment, not +=
                alpha_contrib *= (1.0 - fres)
                store_hit = True

            color_add = hc[:3] * alpha_contrib
            self_light = np.asarray(tri.get("self_light", (0.0, 0.0, 0.0)))
            if apply_lighting:
                store_hit = True
                res_color += color_add
            else:
                # Cheap transparent path (usesLighting false; the lit
                # transparent branch is out of oracle scope).
                transparent += color_add * (amb + self_light)

            res_a *= (1.0 - hc[3])

            if tri.get("refraction", 0.0) > EPSILON:
                store_hit = True
                refr_alpha = res_a
                res_a = 0.0

            if store_hit and stored is None:
                stored = (pos, n, i)
            last = (pos, n, i)
        if res_a <= EPSILON:
            break
    return dict(
        color=res_color, a=res_a, transparent=transparent,
        refl_alpha=refl_alpha, refr_alpha=refr_alpha, stored=stored,
        last=last,
    )


def _reflection_pass(scene, stored, d_primary, refl_alpha, amb):
    """ReflectionRayGen.hlsl:25-143, one bounce. The fresnel factor of
    secondary hits reads the PRIMARY instance's material — the
    reference bug at ReflectionRayGen.hlsl:92 (instanceId, not
    hitInstanceId) — replicated faithfully."""
    pos, n, prim_i = stored
    prim_tri = scene["tris"][prim_i]
    d = d_primary - 2.0 * float(d_primary @ n) * n  # reflect()
    new_refl_alpha = 0.0

    bg = np.zeros(3)
    skyc = sample_sky_plane(scene, d)
    bg = bg * (1.0 - skyc[3]) + skyc[:3] * skyc[3]

    hits = all_hits(pos, d, scene["tris"])
    res_color = np.zeros(3)
    res_a = 1.0
    transparent = np.zeros(3)
    last = None
    prim_fres = (prim_tri.get("reflection") or {}).get("fresnel", 0.0)
    for t, i, u, v in hits:
        tri = scene["tris"][i]
        hc = hit_color(tri, u, v)
        alpha_contrib = res_a * hc[3]
        if alpha_contrib >= EPSILON:
            hp = pos + d * t
            hn = hit_normal(tri, d, u, v)
            fog = tri.get("fog")
            if fog is not None:
                frgb, fa = fog_from_origin(hp, pos, fog)
                transparent += frgb * fa * alpha_contrib
                alpha_contrib *= (1.0 - fa)
            refl = tri.get("reflection")
            if refl is not None and refl["factor"] > EPSILON:
                fres = fresnel_reflect_amount(
                    hn, d, refl["factor"], prim_fres)
                # ReflectionRayGen.hlsl:93: += fres*alphaContrib*reflAlpha
                new_refl_alpha += fres * alpha_contrib * refl_alpha
            self_light = np.asarray(tri.get("self_light", (0.0, 0.0, 0.0)))
            if tri.get("lit", True):
                res_color += hc[:3] * alpha_contrib
            else:
                transparent += hc[:3] * alpha_contrib * (amb + self_light)
            last = (hp, hn, i)
            res_a *= (1.0 - hc[3])
        if res_a <= EPSILON:
            break

    if last is not None:
        hp, hn, i = last
        self_light = np.asarray(
            scene["tris"][i].get("self_light", (0.0, 0.0, 0.0)))
        direct = compute_light(scene, hp, hn, check_shadows=False) + self_light
        res_color = res_color * (amb + direct)
    res_color = res_color + bg * res_a + transparent

    # Artificial shine (ReflectionRayGen.hlsl:128-136).
    shine = (prim_tri.get("reflection") or {}).get("shine", 0.0)
    highlight = np.array([1.0, 1.05, 1.2])
    shadow_c = np.array([0.1, 0.05, 0.0])
    hl = (max(d[1], 0.0) * shine) ** 3.0
    sh = (max(-d[1], 0.0) * shine) ** 3.0
    res_color = res_color * (1 - hl) + highlight * hl
    res_color = res_color * (1 - sh) + shadow_c * sh

    return res_color * refl_alpha * np.clip(1.0 - new_refl_alpha, 0.0, 1.0)


def _refraction_pass(scene, stored, d_primary, refr_alpha, amb, bg_color):
    """RefractionRayGen.hlsl:19-117, single bounce."""
    pos, n, prim_i = stored
    eta = scene["tris"][prim_i].get("refraction", 0.0)
    # HLSL refract(I, N, eta) with the primary's NON-normalized I.
    ndi = float(n @ d_primary)
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    if k < 0.0:
        d = np.zeros(3)
    else:
        d = eta * d_primary - (eta * ndi + np.sqrt(k)) * n

    hits = all_hits(pos, d, scene["tris"]) if np.any(d != 0.0) else []
    res_color = np.zeros(3)
    res_a = 1.0
    transparent = np.zeros(3)
    stored2 = None
    for t, i, u, v in hits:
        tri = scene["tris"][i]
        hc = hit_color(tri, u, v)
        alpha_contrib = res_a * hc[3]
        if alpha_contrib >= EPSILON:
            hp = pos + d * t
            fog = tri.get("fog")
            if fog is not None:
                frgb, fa = fog_from_camera(scene, hp, fog)
                transparent += frgb * fa * alpha_contrib
                alpha_contrib *= (1.0 - fa)
            self_light = np.asarray(tri.get("self_light", (0.0, 0.0, 0.0)))
            if tri.get("lit", True):
                res_color += hc[:3] * alpha_contrib
                stored2 = (hp, hit_normal(tri, d, u, v), i)
            else:
                transparent += hc[:3] * alpha_contrib * (amb + self_light)
            res_a *= (1.0 - hc[3])
        if res_a <= EPSILON:
            break

    if stored2 is not None:
        hp, hn, i = stored2
        self_light = np.asarray(
            scene["tris"][i].get("self_light", (0.0, 0.0, 0.0)))
        direct = compute_light(scene, hp, hn, check_shadows=True) + self_light
        res_color = res_color * (amb + direct)
    res_color = res_color + bg_color * res_a + transparent
    return res_color * refr_alpha


def render(scene, w, h):
    """scene: dict with keys
      view_i, proj_i, view, proj: 4x4 row-vector matrices
      tris: list of {v: (v0,v1,v2), n: (n0,n1,n2), uv, color or texture,
                     alpha, lit, fog, reflection, refraction,
                     self_light, filter, no_cull}
      light: {pos, diffuse, attenuation_radius, attenuation_exponent,
              shadow_offset}
      ambient: rgb
      material: {ignore_normal, shadow_ray_bias}
      sky: optional {texture (H,W,4), viewport (w,h), yaw_offset,
                     diffuse_mult}
    Returns (h, w, 3) float image in [0, 1]-ish linear space.
    """
    img = np.zeros((h, w, 3), np.float64)
    amb = np.asarray(scene["ambient"], np.float64)
    for py in range(h):
        for px in range(w):
            origin, d = primary_ray(px, py, w, h, scene["proj_i"],
                                    scene["view_i"])
            # Background + sky (PrimaryRayGen.hlsl:46-53), black base.
            su, sv = px / w, py / h
            skyc = sample_sky_2d(scene, su, sv)
            bg_color = np.zeros(3) * (1.0 - skyc[3]) + skyc[:3] * skyc[3]

            hits = all_hits(origin, d, scene["tris"])
            r = _resolve_alpha_hits(scene, origin, d, hits, amb,
                                    primary=True)

            # Direct pass on the stored hit (DirectRayGen.hlsl:14-65);
            # miss pixels get direct=1 so compose passes diffuse through.
            if r["stored"] is not None:
                pos, n, i = r["stored"]
                self_light = np.asarray(
                    scene["tris"][i].get("self_light", (0.0, 0.0, 0.0)))
                direct = compute_light(scene, pos, n, check_shadows=True) \
                    + self_light
            else:
                direct = np.ones(3)
            indirect = amb  # gi_samples = 0: ambient fallback

            reflection = np.zeros(3)
            if r["stored"] is not None and r["refl_alpha"] > EPSILON:
                reflection = _reflection_pass(
                    scene, r["stored"], d, r["refl_alpha"], amb)
            refraction = np.zeros(3)
            if r["stored"] is not None and r["refr_alpha"] > EPSILON:
                refraction = _refraction_pass(
                    scene, r["stored"], d, r["refr_alpha"], amb, bg_color)

            # Background blend (PrimaryRayGen.hlsl:183-184).
            diffuse_rgb = r["color"] + bg_color * r["a"]
            diffuse_a = 1.0 - r["a"]

            # ComposePS.hlsl:18-37.
            if diffuse_a > EPSILON:
                lit = diffuse_rgb * (direct + indirect)
                result = diffuse_rgb * (1.0 - diffuse_a) + lit * diffuse_a
                result = result + reflection + refraction + r["transparent"]
            else:
                result = diffuse_rgb
            img[py, px] = result
    return img
