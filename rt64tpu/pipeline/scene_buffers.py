"""Host -> device scene assembly (packed-row layout).

The per-frame analog of View::update (rt64_view.cpp:1053-1178): classify
instances, resolve texture bindings, and upload transform/material data.
Instead of rewriting a descriptor heap, everything packs into wide rows
(pipeline/rows.py) sized for TPU gather economics:

  * geometry epoch (mesh/instance set changed): vertex rows + triangle
    index tables — the BLAS-build analog.
  * texture epoch: the *quad pool* — every (texture, addressing) combo
    used by the scene gets sampling-ready entries holding the texel and
    its +x/+y/+xy neighbors under that addressing mode, so a bilinear
    fetch is ONE row gather (vs 4 scalar gathers).
  * per frame: instance rows (transforms, materials, combiner, light
    eligibility) and lights — the upload-heap analog.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from rt64tpu import descriptors as d
from rt64tpu.api import Instance, Texture, pack_lights
from rt64tpu.limits import SceneLimits
from rt64tpu.pipeline import rows as R

LIGHT_WIDTH = 14


class ShadeFeatures(NamedTuple):
    """STATIC scene-wide shading capabilities, known on the host.

    Rides SceneBuffers as pytree aux data (hashable, not traced), so
    shading specializes away whole sub-passes the scene cannot trigger —
    the dispatch-level analog of the reference compiling a shader
    permutation per material feature set (rt64_shader.cpp:104-129).
    Runtime lax.cond skips are NOT a substitute on TPU: each conditional
    is a scheduling fence that serializes the surrounding DMA pipeline
    (profiled at several ms per fence on a 480p frame). Flipping a flag
    re-specializes the jit, like any other static config change.
    """

    has_alpha: bool = True  # any alpha-class triangles
    has_normal_maps: bool = True
    has_specular_maps: bool = True
    has_texel1: bool = True  # any TEXEL1 (alt) texture bound
    # Any instance that can yield a TRANSPARENT-LIT primary hit
    # (lighting on, alpha-class, partial alpha possible — i.e. not
    # binarized by texture-edge; PrimaryRayGen.hlsl:139-147). When
    # False the whole shared-transparent-light machinery (its light
    # plan + 1xN shadow rays in the batched launch) compiles out.
    has_lit_transparent: bool = True
    # Any instance opted into ray-diff mip LOD (SHADER_MIP_LOD_ENABLED,
    # a TPU extension — the reference's mip pass is compiled out,
    # rt64_device.cpp:758-762). Default False: the differential math
    # and per-level offset selection compile out of every stock scene.
    has_mips: bool = False
    # Any raster-background triangles this frame. When False the
    # background plane is statically the black base, so the raster
    # composite, the fixed-grid background blend, AND the per-ray
    # environment fetch (GI/reflection bounce misses) all compile out —
    # at 4K internal the env fetch alone was 171 ms/frame of gathering
    # zeros (rt64_view.cpp:1292-1319 draws nothing with an empty
    # raster list too).
    has_raster_bg: bool = True


@jax.tree_util.register_pytree_node_class
class SceneBuffers(NamedTuple):
    """Device-resident scene. All shapes fixed by SceneLimits.

    A NamedTuple pytree with one twist: `features` (ShadeFeatures) is
    STATIC aux data — it parameterizes compilation, not execution.
    """

    vertex_rows: jax.Array  # (V, VROW) f32 object-space attrs
    tri_idx: jax.Array  # (T, 3) int32
    tri_instance: jax.Array  # (T,) int32
    tri_valid: jax.Array  # (T,) bool
    instance_rows: jax.Array  # (I, IROW) f32
    lights: jax.Array  # (L, 14) f32
    light_count: jax.Array  # () int32
    quad_pool: jax.Array  # (P, 4) uint32 sampling-ready texels
    quad_records: jax.Array  # (Rec, 3) int32: offset, width, height
    raster_bg: jax.Array  # (RB, RR_WIDTH) raster background triangles
    raster_bg_count: jax.Array  # () int32
    raster_fg: jax.Array  # (RB, RR_WIDTH) raster foreground (HUD)
    raster_fg_count: jax.Array  # () int32
    # Dense (4, Ht, Wt) f32 copy of the sky-plane texture (None when the
    # view has no sky): lets the fixed-grid sky resample ride the MXU
    # (ops/sky.sample_sky_2d_grid) instead of a per-pixel pool gather.
    # Shape changes re-specialize the jit like any other aval change.
    sky_plane: Optional[jax.Array] = None
    features: ShadeFeatures = ShadeFeatures()

    def tree_flatten(self):
        return tuple(self[:-1]), self.features

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, features=aux)


def _addr_np(i, size, mode):
    if mode == d.SHADER_ADDRESSING_WRAP:
        return np.mod(i, size)
    if mode == d.SHADER_ADDRESSING_MIRROR:
        m = np.mod(i, 2 * size)
        return np.where(m < size, m, 2 * size - 1 - m)
    return np.clip(i, 0, size - 1)


def build_quad_entries(rgba: np.ndarray, h_mode: int, v_mode: int) -> np.ndarray:
    """Sampling-ready quad entries for one texture under one addressing
    mode: entry[y*W+x] = packed u32 of (x,y), (x+1,y), (x,y+1), (x+1,y+1)
    with the +1 neighbors wrapped per the mode."""
    h, w = rgba.shape[:2]
    packed = (
        rgba[..., 0].astype(np.uint32)
        | (rgba[..., 1].astype(np.uint32) << 8)
        | (rgba[..., 2].astype(np.uint32) << 16)
        | (rgba[..., 3].astype(np.uint32) << 24)
    )
    xs = np.arange(w)
    ys = np.arange(h)
    x1 = _addr_np(xs + 1, w, h_mode)
    y1 = _addr_np(ys + 1, h, v_mode)
    out = np.zeros((h * w, 4), np.uint32)
    out[:, 0] = packed.reshape(-1)
    out[:, 1] = packed[:, x1].reshape(-1)
    out[:, 2] = packed[y1, :].reshape(-1)
    out[:, 3] = packed[y1][:, x1].reshape(-1)
    return out


class ScenePacker:
    """Incremental packer owning the numpy staging arrays."""

    def __init__(self, limits: SceneLimits):
        self.limits = limits
        self._geometry_key = None
        self._quad_key = None
        self._np: dict = {}
        self._combo_ids: dict = {}  # (tex_id, h, v, mip) -> record index
        self.triangle_count = 0

    # -- texture quad pool ---------------------------------------------------
    def pack_quad_pool(self, instances: List[Instance]):
        """Collect every (texture, hAddr, vAddr) combo in use and build
        the sampling-ready pool."""
        lm = self.limits
        combos = []
        seen = set()
        for inst in instances:
            sh = inst.desc.shader
            if sh is None:
                continue
            # Only the diffuse fetch is mip-filtered (the ray-diff LOD
            # drives tex0; normal/spec/alt maps stay level-0 like the
            # reference's SampleGrad call sites, rt64_shader.cpp:474-545).
            mip_diffuse = bool(getattr(sh, "mip_lod_enabled", False))
            texes = (inst.desc.diffuse_texture, inst.desc.normal_texture,
                     inst.desc.specular_texture, inst.desc.alt_texture)
            for j, tex in enumerate(texes):
                if tex is None:
                    continue
                mip = mip_diffuse and j == 0
                key = (id(tex), sh.h_addr, sh.v_addr, mip)
                if key not in seen:
                    seen.add(key)
                    combos.append((tex, sh.h_addr, sh.v_addr, mip))
        key = tuple((id(t), h, v, mp) for t, h, v, mp in combos)
        if key == self._quad_key:
            return
        pool = np.zeros((lm.texel_pool, 4), np.uint32)
        records = np.zeros((lm.max_textures, 3), np.int32)
        self._combo_ids = {}
        offset = 0
        rec = 0
        for tex, h_addr, v_addr, mip in combos:
            if mip:
                from rt64tpu.ops.mipmaps import generate_mips
                from rt64tpu.ops.texture import MAX_MIP_LEVELS

                levels = generate_mips(tex.rgba, max_levels=MAX_MIP_LEVELS)
            else:
                levels = [tex.rgba]
            n = sum(l.shape[0] * l.shape[1] for l in levels)
            if offset + n > lm.texel_pool or rec >= lm.max_textures:
                raise ValueError("quad pool exhausted; grow SceneLimits")
            # Chain layout contract (texture.mip_select): level l starts
            # right after level l-1's h*w entries; dims halve (floor,
            # min 1) per level until 1x1 or MAX_MIP_LEVELS.
            o = offset
            for lv in levels:
                ln = lv.shape[0] * lv.shape[1]
                pool[o : o + ln] = build_quad_entries(lv, h_addr, v_addr)
                o += ln
            records[rec] = (offset, tex.width, tex.height)
            self._combo_ids[(id(tex), h_addr, v_addr, mip)] = rec
            offset += n
            rec += 1
        self._next_rec = rec
        self._next_off = offset
        self._np["quad_pool"] = pool
        self._np["quad_records"] = records
        self._dev_quads = None  # re-upload lazily (env textures may append)
        self._quad_key = key

    def add_env_texture(self, tex: Optional[Texture]) -> int:
        """Record id for a wrap/wrap env/sky texture (added on demand)."""
        if tex is None:
            return -1
        key = (id(tex), d.SHADER_ADDRESSING_WRAP, d.SHADER_ADDRESSING_WRAP,
               False)
        if key in self._combo_ids:
            return self._combo_ids[key]
        n = tex.width * tex.height
        pool = self._np["quad_pool"]
        records = self._np["quad_records"]
        if self._next_off + n > pool.shape[0] or self._next_rec >= records.shape[0]:
            raise ValueError("quad pool exhausted; grow SceneLimits")
        pool[self._next_off : self._next_off + n] = build_quad_entries(
            tex.rgba, d.SHADER_ADDRESSING_WRAP, d.SHADER_ADDRESSING_WRAP
        )
        records[self._next_rec] = (self._next_off, tex.width, tex.height)
        self._combo_ids[key] = self._next_rec
        self._next_off += n
        self._next_rec += 1
        self._dev_quads = None
        return self._combo_ids[key]

    def set_sky_plane_dense(self, tex: Optional[Texture]):
        """Dense (4, Ht, Wt) f32 sky texture for the fixed-grid MXU
        resample (SceneBuffers.sky_plane). Kept alongside the quad-pool
        record (add_env_texture), which still serves the per-direction
        sky paths (reflection/GI bounces, BgSky.hlsli:72-84)."""
        key = None if tex is None else (id(tex), tex.width, tex.height)
        if getattr(self, "_sky_dense_key", "unset") == key:
            return
        self._sky_dense_key = key
        if tex is None:
            self._sky_dense = None
        else:
            img = tex.rgba.astype(np.float32).transpose(2, 0, 1) / 255.0
            self._sky_dense = jnp.asarray(img)

    # -- geometry epoch -------------------------------------------------------
    def pack_geometry(self, instances: List[Instance]):
        lm = self.limits
        # The alpha-class bit is part of the key: _alpha_class depends on
        # the *material* (solid_alpha_multiplier), so a host-side material
        # edit that flips an instance's class must force a re-pack — else
        # alpha_triangle_count / alpha_cap / ShadeFeatures.has_alpha go
        # stale and the statically-specialized trace drops the geometry.
        key = tuple(
            (id(inst), inst.desc.mesh.version if inst.desc.mesh else -1,
             id(inst.desc.shader),
             inst.desc.shader is not None
             and self._alpha_class(inst.desc.shader, inst.desc.material))
            for inst in instances
        )
        if key == self._geometry_key:
            return
        V, T = lm.max_vertices, lm.max_triangles
        vrows = np.zeros((V, R.VROW), np.float32)
        vrows[:, R.V_IN1 + 3] = 1.0  # float3 inputs extend alpha=1
        vrows[:, R.V_IN2 + 3] = 1.0
        tri_idx = np.zeros((T, 3), np.int32)
        tri_instance = np.zeros(T, np.int32)
        tri_valid = np.zeros(T, bool)

        voff = 0
        toff = 0
        alpha_count = 0
        for ii, inst in enumerate(instances):
            mesh = inst.desc.mesh
            shader = inst.desc.shader
            if mesh is None or shader is None or mesh.indices is None:
                continue
            parsed = mesh.parsed(shader.layout_key)
            nv = parsed["positions"].shape[0]
            nt = parsed["indices"].shape[0]
            if voff + nv > V or toff + nt > T:
                raise ValueError("scene geometry exceeds SceneLimits buckets")
            vrows[voff : voff + nv, R.V_POS : R.V_POS + 3] = parsed["positions"]
            vrows[voff : voff + nv, R.V_NRM : R.V_NRM + 3] = parsed["normals"]
            vrows[voff : voff + nv, R.V_UV : R.V_UV + 2] = parsed["uvs"]
            vrows[voff : voff + nv, R.V_IN1 : R.V_IN1 + 4] = parsed["inputs"][:, 0]
            vrows[voff : voff + nv, R.V_IN2 : R.V_IN2 + 4] = parsed["inputs"][:, 1]
            perm = parsed["tri_perm"]
            tri_idx[toff : toff + nt] = parsed["indices"][perm] + voff
            tri_instance[toff : toff + nt] = ii
            tri_valid[toff : toff + nt] = True
            if self._alpha_class(shader, inst.desc.material):
                alpha_count += nt
            voff += nv
            toff += nt

        self._np.update(
            vertex_rows=vrows, tri_idx=tri_idx, tri_instance=tri_instance,
            tri_valid=tri_valid,
        )
        # Device-resident copies (re-uploaded only on epoch change).
        self._dev_geom = dict(
            vertex_rows=jnp.asarray(vrows),
            tri_idx=jnp.asarray(tri_idx),
            tri_instance=jnp.asarray(tri_instance),
            tri_valid=jnp.asarray(tri_valid),
        )
        self._geometry_key = key
        self.triangle_count = toff
        # Upper bound on compacted alpha-class triangles this epoch:
        # drives alpha_cap growth so compact_alpha never silently drops
        # hits (the any-hit completeness contract, rt64_shader.cpp:547-581).
        self.alpha_triangle_count = alpha_count

    @property
    def alpha_cap(self) -> int:
        """Capacity bucket for the compacted alpha list: the configured
        floor, grown to fit this epoch's actual alpha-class count."""
        from rt64tpu.limits import _next_bucket

        base = self.limits.alpha_triangles
        n = getattr(self, "alpha_triangle_count", 0)
        return base if n <= base else _next_bucket(n, base)

    # -- per-frame -------------------------------------------------------------
    def pack_frame(self, instances: List[Instance], lights_arrays,
                   raster_bg=None, raster_fg=None) -> SceneBuffers:
        """instances: raytraced + raster, in one list (instance rows are
        shared); raster_bg/raster_fg: (instance_index, parsed) pairs for
        the raster classification (rt64_view.cpp:1081-1147)."""
        lm = self.limits
        I = lm.max_instances
        larr, lgroups = lights_arrays
        irows = np.zeros((I, R.IROW), np.float32)
        eye3 = np.eye(3, dtype=np.float32).reshape(-1)
        irows[:, R.I_M3 : R.I_M3 + 9] = eye3
        irows[:, R.I_NM3 : R.I_NM3 + 9] = eye3
        irows[:, R.I_PM3 : R.I_PM3 + 9] = eye3
        irows[:, R.I_TEX_D] = -1
        irows[:, R.I_TEX_N] = -1
        irows[:, R.I_TEX_S] = -1
        irows[:, R.I_TEX_D2] = -1

        # Streamed-frame fast path (rt64_view.cpp:1053-1178 re-packs
        # every frame; the 16.6 ms budget includes this host work):
        # the content columns (I_MAT..end) of each instance row are
        # cached against a cheap value-key of the descriptor, so only
        # instances whose material/shader/texture state actually
        # changed re-pack. Transforms change every frame in a streamed
        # scene, so they are filled vectorized (batched inverse) below
        # rather than cached.
        n_act = min(len(instances), I)
        tfs = np.empty((n_act, 4, 4), np.float32)
        ptfs = np.empty((n_act, 4, 4), np.float32)
        elig_n = min(len(lgroups), R.MAX_ELIG_LIGHTS)
        epoch = (
            tuple(int(g) for g in lgroups[:elig_n]),
            id(self._np.get("quad_records")),
            getattr(self, "_next_rec", 0),
        )
        cache = getattr(self, "_row_cache", {})
        new_cache = {}

        for ii, inst in enumerate(instances[:I]):
            de = inst.desc
            m = de.material
            sh = de.shader
            tf = (
                np.asarray(de.transform, np.float32).reshape(4, 4)
                if de.transform is not None else np.eye(4, dtype=np.float32)
            )
            ptf = (
                np.asarray(de.previous_transform, np.float32).reshape(4, 4)
                if de.previous_transform is not None else tf
            )
            tfs[ii] = tf
            ptfs[ii] = ptf

            ckey = (self._content_key(de), epoch)
            hit = cache.get(id(inst))
            if hit is not None and hit[0] == ckey:
                irows[ii, R.I_MAT :] = hit[1]
                new_cache[id(inst)] = hit
                continue

            mat = irows[ii, R.I_MAT : R.I_MAT + R.M_WIDTH]
            mat[R.M_IGNORE_NORMAL] = m.ignore_normal_factor
            mat[R.M_UV_DETAIL] = m.uv_detail_scale
            mat[R.M_REFLECTION] = m.reflection_factor
            mat[R.M_REFL_FRESNEL] = m.reflection_fresnel_factor
            mat[R.M_REFL_SHINE] = m.reflection_shine_factor
            mat[R.M_REFRACTION] = m.refraction_factor
            mat[R.M_SPECULAR : R.M_SPECULAR + 3] = m.specular_color
            mat[R.M_SPEC_EXP] = m.specular_exponent
            mat[R.M_SOLID_ALPHA] = m.solid_alpha_multiplier
            mat[R.M_SHADOW_ALPHA] = m.shadow_alpha_multiplier
            mat[R.M_DEPTH_BIAS] = m.depth_bias
            mat[R.M_SHADOW_RAY_BIAS] = m.shadow_ray_bias
            mat[R.M_SELF_LIGHT : R.M_SELF_LIGHT + 3] = m.self_light
            mat[R.M_FOG_COLOR : R.M_FOG_COLOR + 3] = m.fog_color
            mat[R.M_DIFFUSE_MIX : R.M_DIFFUSE_MIX + 4] = m.diffuse_color_mix
            mat[R.M_FOG_MUL] = m.fog_mul
            mat[R.M_FOG_OFFSET] = m.fog_offset
            mat[R.M_FOG_ENABLED] = float(m.fog_enabled)
            mat[R.M_LOCK] = m.lock_mask

            if sh is not None:
                cc = sh.combiner
                irows[ii, R.I_CC] = R.pack_cc(cc.c[0], cc.c[1])
                flags = 0
                flags |= R.F_OPT_ALPHA * cc.opt_alpha
                flags |= R.F_TEXTURE_EDGE * cc.opt_texture_edge
                flags |= R.F_NOISE * cc.opt_noise
                flags |= R.F_ALPHA_SAME * cc.color_alpha_same
                flags |= R.F_USE_T0 * cc.use_textures[0]
                flags |= R.F_USE_T1 * cc.use_textures[1]
                flags |= R.F_NORMAL_MAP * sh.normal_map_enabled
                flags |= R.F_SPECULAR_MAP * sh.specular_map_enabled
                flags |= R.F_NO_CULL * bool(
                    de.flags & d.INSTANCE_DISABLE_BACKFACE_CULLING
                )
                flags |= R.F_ALPHA_CLASS * self._alpha_class(sh, m)
                flags |= R.F_HAS_LIGHTING * (m.light_group_mask_bits != 0)
                flags |= R.F_MIP_LOD * (
                    bool(getattr(sh, "mip_lod_enabled", False))
                    and de.diffuse_texture is not None
                )
                irows[ii, R.I_FLAGS] = float(flags)
                irows[ii, R.I_SAMPLER] = float(
                    sh.filter + 4 * sh.h_addr + 16 * sh.v_addr
                )
                irows[ii, R.I_INPUT_COUNT] = float(cc.input_count)

                def rec_id(tex, mip=False):
                    if tex is None:
                        return -1
                    return self._combo_ids.get(
                        (id(tex), sh.h_addr, sh.v_addr, mip), -1
                    )

                irows[ii, R.I_TEX_D] = rec_id(
                    de.diffuse_texture,
                    bool(getattr(sh, "mip_lod_enabled", False)),
                )
                irows[ii, R.I_TEX_N] = rec_id(de.normal_texture)
                irows[ii, R.I_TEX_S] = rec_id(de.specular_texture)
                irows[ii, R.I_TEX_D2] = rec_id(de.alt_texture)

            if de.viewport_rect is not None:
                irows[ii, R.I_VIEWPORT : R.I_VIEWPORT + 4] = de.viewport_rect
            if de.scissor_rect is not None:
                irows[ii, R.I_SCISSOR : R.I_SCISSOR + 4] = de.scissor_rect

            # Light eligibility: exact uint32 mask test done on host.
            gm = np.uint32(m.light_group_mask_bits & 0xFFFFFFFF)
            for l in range(elig_n):
                irows[ii, R.I_ELIG + l] = float(bool(gm & lgroups[l]))

            new_cache[id(inst)] = (ckey, irows[ii, R.I_MAT :].copy())

        self._row_cache = new_cache

        # Vectorized transform fill: batched 3x3 inverse-transpose for
        # the normal matrices (one LAPACK batch instead of n_act Python
        # inversions). Singular transforms (scale-0 hidden instances)
        # fall back to identity normals instead of raising.
        if n_act:
            m3 = tfs[:, :3, :3]
            irows[:n_act, R.I_M3 : R.I_M3 + 9] = m3.reshape(n_act, 9)
            irows[:n_act, R.I_TR : R.I_TR + 3] = tfs[:, 3, :3]
            det = np.linalg.det(m3.astype(np.float64))
            ok = np.abs(det) > 1e-30
            safe = np.where(
                ok[:, None, None], m3, np.eye(3, dtype=np.float32)
            )
            nm = np.linalg.inv(safe).transpose(0, 2, 1)
            irows[:n_act, R.I_NM3 : R.I_NM3 + 9] = nm.reshape(n_act, 9)
            irows[:n_act, R.I_PM3 : R.I_PM3 + 9] = (
                ptfs[:, :3, :3].reshape(n_act, 9)
            )
            irows[:n_act, R.I_PTR : R.I_PTR + 3] = ptfs[:, 3, :3]

        # Bake each instance's texture records (offset, w, h) into the
        # row (I_REC) so sampling needs no per-pixel records[] gather.
        records = self._np["quad_records"]
        for j, col in enumerate(
            (R.I_TEX_D, R.I_TEX_D2, R.I_TEX_N, R.I_TEX_S)
        ):
            dst = slice(R.I_REC + 3 * j, R.I_REC + 3 * j + 3)
            if len(records) == 0:
                continue
            rid = irows[:, col].astype(np.int32)
            ok = rid >= 0
            vals = records[np.clip(rid, 0, len(records) - 1)].astype(
                np.float32
            )
            vals[~ok] = 0.0
            irows[:, dst] = vals

        # Light buffer capacity derives from the ACTUAL light count,
        # bucketed (powers of two from the limits floor) so the shape —
        # and hence the jit program — only changes when the count
        # crosses a bucket. Every selection op is (L, N); padding a
        # 2-light scene to MAX_LIGHTS=16 paid 8x the bandwidth.
        from rt64tpu.limits import _next_bucket

        L = _next_bucket(max(len(larr), 1), lm.max_lights)
        lights = np.zeros((L, LIGHT_WIDTH), np.float32)
        count = min(len(larr), L)
        lights[:count] = larr[:count, :LIGHT_WIDTH]

        rb_rows, rb_count = self._pack_raster(instances, raster_bg or [])
        rf_rows, rf_count = self._pack_raster(instances, raster_fg or [])

        if getattr(self, "_dev_quads", None) is None:
            from rt64tpu.ops import texture as _tex

            pool_np = self._np["quad_pool"]
            if pool_np.shape[0] % _tex.QPR == 0:
                # Corner-major wide rows: one full-lane gather row per
                # bilinear fetch instead of a 4-lane row padded to the
                # 128-lane tile (texture.pack_pool_wide).
                pool_np = _tex.pack_pool_wide(pool_np)
            self._dev_quads = dict(
                quad_pool=jnp.asarray(pool_np),
                quad_records=jnp.asarray(self._np["quad_records"]),
            )
        # Static feature summary (ShadeFeatures docstring): what this
        # scene can trigger at all, computed host-side per frame.
        has_nmap = has_smap = has_t1 = has_mips = False
        for inst in instances[:I]:
            sh = inst.desc.shader
            if sh is None:
                continue
            if sh.normal_map_enabled and inst.desc.normal_texture is not None:
                has_nmap = True
            if sh.specular_map_enabled and inst.desc.specular_texture is not None:
                has_smap = True
            if sh.combiner.use_textures[1] and inst.desc.alt_texture is not None:
                has_t1 = True
            if (getattr(sh, "mip_lod_enabled", False)
                    and inst.desc.diffuse_texture is not None):
                has_mips = True
        has_lit_tl = False
        for inst in instances[:I]:
            sh = inst.desc.shader
            m = inst.desc.material
            if sh is None:
                continue
            # Conservative: lit + alpha-class + alpha not binarized.
            # texture_edge clamps hit alpha to {0, 1} (before the noise
            # keep/zero), and alpha 1 takes the apply-lights path, so
            # it can never produce the 0 < alpha <= 0.5 trans-lit case.
            cc = sh.combiner
            binarized = cc.opt_texture_edge
            if (m.light_group_mask_bits != 0
                    and self._alpha_class(sh, m) and not binarized):
                has_lit_tl = True
        features = ShadeFeatures(
            has_alpha=getattr(self, "alpha_triangle_count", 0) > 0,
            has_normal_maps=has_nmap,
            has_specular_maps=has_smap,
            has_texel1=has_t1,
            has_lit_transparent=has_lit_tl,
            has_mips=has_mips,
            has_raster_bg=rb_count > 0,
        )

        return SceneBuffers(
            **self._dev_geom,
            instance_rows=jnp.asarray(irows),
            lights=jnp.asarray(lights),
            light_count=jnp.int32(count),
            **self._dev_quads,
            raster_bg=jnp.asarray(rb_rows),
            raster_bg_count=jnp.int32(rb_count),
            raster_fg=jnp.asarray(rf_rows),
            raster_fg_count=jnp.int32(rf_count),
            sky_plane=getattr(self, "_sky_dense", None),
            features=features,
        )

    def _pack_raster(self, instances: List[Instance], raster_list):
        """Pack raster triangles (clip-space) into RR rows."""
        from rt64tpu.ops.raster import (
            RR_POS, RR_UV, RR_IN1, RR_IN2, RR_INST, RR_WIDTH,
        )

        cap = self.limits.raster_triangles
        if not raster_list:
            # Zero-row shape -> the raster pass compiles out entirely
            # (rasterize early-returns; no lax.cond fence over the
            # full-res image for scenes with no raster instances).
            return np.zeros((0, RR_WIDTH), np.float32), 0
        rows = np.zeros((cap, RR_WIDTH), np.float32)
        count = 0
        for inst in raster_list:
            ii = instances.index(inst)
            mesh = inst.desc.mesh
            shader = inst.desc.shader
            if mesh is None or shader is None or mesh.indices is None:
                continue
            parsed = mesh.parsed_clip(shader.layout_key)
            tris = parsed["indices"]
            for t in range(tris.shape[0]):
                if count >= cap:
                    break
                for k in range(3):
                    vi = tris[t, k]
                    rows[count, RR_POS + 4 * k : RR_POS + 4 * k + 4] = (
                        parsed["positions4"][vi]
                    )
                    rows[count, RR_UV + 2 * k : RR_UV + 2 * k + 2] = (
                        parsed["uvs"][vi]
                    )
                    rows[count, RR_IN1 + 4 * k : RR_IN1 + 4 * k + 4] = (
                        parsed["inputs"][vi, 0]
                    )
                    rows[count, RR_IN2 + 4 * k : RR_IN2 + 4 * k + 4] = (
                        parsed["inputs"][vi, 1]
                    )
                rows[count, RR_INST] = ii
                count += 1
        return rows, count

    @staticmethod
    def _content_key(de) -> tuple:
        """Value-key of every descriptor field that feeds the content
        columns (I_MAT..end) of an instance row. Cheap to compute
        (attribute reads + one tuple) so the streamed-frame loop can
        skip re-packing unchanged instances; compared by value, not
        object identity, because hosts re-push the same (mutated)
        descriptor object every frame (rt64_view.cpp:1053-1178)."""
        def _v(x):
            if isinstance(x, np.ndarray):
                return tuple(np.asarray(x).ravel().tolist())
            if isinstance(x, (list, tuple)):
                return tuple(_v(e) for e in x)
            return x

        m = de.material
        return (
            tuple(_v(v) for v in vars(m).values()),
            id(de.shader),
            id(de.diffuse_texture), id(de.normal_texture),
            id(de.specular_texture), id(de.alt_texture),
            _v(de.viewport_rect), _v(de.scissor_rect),
            int(de.flags),
        )

    @staticmethod
    def _alpha_class(shader, material: d.Material) -> bool:
        """Conservative: can this instance's evaluated hit alpha be < 1?
        Mirrors when the any-hit could produce partial alpha or
        IgnoreHit (rt64_shader.cpp:489-516)."""
        from rt64tpu.ops.combiner import SHADER_0, SHADER_TEXEL0A

        cc = shader.combiner
        if cc.opt_alpha or cc.opt_noise or cc.opt_texture_edge:
            return True
        if material.solid_alpha_multiplier < 1.0:
            return True
        c = cc.c[0]
        if c[1] == SHADER_0 and c[3] == SHADER_0 and c[2] == SHADER_TEXEL0A:
            return True
        return False
