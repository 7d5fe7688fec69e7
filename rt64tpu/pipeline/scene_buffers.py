"""Host -> device scene assembly.

The per-frame analog of View::update (rt64_view.cpp:1053-1178): classify
instances, assign texture indices, and upload transform/material data.
Instead of rewriting a descriptor heap, we pack everything into one
pytree of fixed-capacity arrays (SceneBuffers) whose shapes are set by
SceneLimits — so jit traces once per capacity bucket.

Assembly is split into:
  * geometry epoch (mesh set / instance list changed): rebuild the
    concatenated vertex/triangle arrays — the BLAS-build analog.
  * per-frame: transforms, materials, lights, camera — small uploads,
    the reference's upload-heap writes.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from rt64tpu import descriptors as d
from rt64tpu.api import Instance, Texture, pack_lights
from rt64tpu.limits import SceneLimits
from rt64tpu.ops.combiner import PARAMS_WIDTH, SHADER_0, SHADER_TEXEL0A
from rt64tpu.ops import math3d

# Material float columns (device layout; mirrors MaterialProperties,
# Materials.hlsli). Integer-ish fields ride mat_i.
MAT_IGNORE_NORMAL = 0
MAT_UV_DETAIL_SCALE = 1
MAT_REFLECTION = 2
MAT_REFLECTION_FRESNEL = 3
MAT_REFLECTION_SHINE = 4
MAT_REFRACTION = 5
MAT_SPECULAR_R = 6  # 6:9 specular color
MAT_SPECULAR_EXP = 9
MAT_SOLID_ALPHA_MULT = 10
MAT_SHADOW_ALPHA_MULT = 11
MAT_DEPTH_BIAS = 12
MAT_SHADOW_RAY_BIAS = 13
MAT_SELF_LIGHT_R = 14  # 14:17
MAT_FOG_R = 17  # 17:20 fog color
MAT_DIFFUSE_MIX_R = 20  # 20:24 diffuse color mix rgba
MAT_FOG_MUL = 24
MAT_FOG_OFFSET = 25
MAT_FOG_ENABLED = 26
MAT_LOCK_MASK = 27
MAT_WIDTH = 28

# Instance int columns.
II_DIFFUSE_TEX = 0
II_NORMAL_TEX = 1
II_SPECULAR_TEX = 2
II_FILTER = 3
II_H_ADDR = 4
II_V_ADDR = 5
II_NORMAL_MAP = 6
II_SPECULAR_MAP = 7
II_NO_CULL = 8
II_ALPHA_CLASS = 9
II_WIDTH = 10


class SceneBuffers(NamedTuple):
    """Device-resident scene. All shapes fixed by SceneLimits."""

    # Geometry (epoch-updated)
    pos: jax.Array  # (V, 3) object-space positions
    nrm: jax.Array  # (V, 3)
    uv: jax.Array  # (V, 2)
    inputs: jax.Array  # (V, 4, 4) combiner input colors
    vert_instance: jax.Array  # (V,) int32
    tri_idx: jax.Array  # (T, 3) int32
    tri_instance: jax.Array  # (T,) int32
    tri_valid: jax.Array  # (T,) bool
    # Per-frame instance data
    transforms: jax.Array  # (I, 4, 4)
    normal_mats: jax.Array  # (I, 4, 4)
    prev_transforms: jax.Array  # (I, 4, 4)
    mat_f: jax.Array  # (I, MAT_WIDTH)
    mat_i: jax.Array  # (I, II_WIDTH) int32
    light_groups_inst: jax.Array  # (I,) uint32 lightGroupMaskBits
    combiner: jax.Array  # (I, PARAMS_WIDTH) int32
    # Lights
    lights: jax.Array  # (L, 14)
    light_groups: jax.Array  # (L,) uint32
    light_count: jax.Array  # () int32
    # Textures
    tex_pool: jax.Array  # (P, 4) uint8
    tex_records: jax.Array  # (Tex, 3) int32


class AssembledScene(NamedTuple):
    buffers: SceneBuffers
    instance_count: int
    triangle_count: int


def _alpha_class(shader, material: d.Material) -> bool:
    """Conservative: can this instance's evaluated hit alpha be < 1?

    Mirrors when the reference's any-hit could produce partial alpha or
    IgnoreHit (rt64_shader.cpp:489-516).
    """
    cc = shader.combiner
    if cc.opt_alpha or cc.opt_noise or cc.opt_texture_edge:
        return True
    if material.solid_alpha_multiplier < 1.0:
        return True
    c = cc.c[0]
    if c[1] == SHADER_0 and c[3] == SHADER_0 and c[2] == SHADER_TEXEL0A:
        return True  # multiply path alpha = texel alpha even without opt_alpha
    return False


class ScenePacker:
    """Incremental packer owning the numpy staging arrays."""

    def __init__(self, limits: SceneLimits, jax_device=None):
        self.limits = limits
        self.jax_device = jax_device
        self._geometry_key = None
        self._texture_key = None
        self._np: dict = {}
        self._geom_cached: dict = {}

    # -- textures ---------------------------------------------------------
    def pack_textures(self, textures: List[Texture]):
        lm = self.limits
        key = tuple(id(t) for t in textures)
        if key == self._texture_key:
            return
        pool = np.zeros((lm.texel_pool, 4), np.uint8)
        records = np.zeros((lm.max_textures, 3), np.int32)
        offset = 0
        for i, tex in enumerate(textures[: lm.max_textures]):
            n = tex.width * tex.height
            if offset + n > lm.texel_pool:
                raise ValueError("texel pool exhausted; grow SceneLimits.texel_pool")
            pool[offset : offset + n] = tex.rgba.reshape(n, 4)
            records[i] = (offset, tex.width, tex.height)
            offset += n
        self._np["tex_pool"] = pool
        self._np["tex_records"] = records
        self._texture_key = key

    # -- geometry epoch -----------------------------------------------------
    def pack_geometry(self, instances: List[Instance]):
        """Concatenate per-instance mesh triangles (Morton-ordered)."""
        lm = self.limits
        key = tuple(
            (id(inst), inst.desc.mesh.version if inst.desc.mesh else -1,
             id(inst.desc.shader))
            for inst in instances
        )
        if key == self._geometry_key:
            return
        V, T, I = lm.max_vertices, lm.max_triangles, lm.max_instances
        pos = np.zeros((V, 3), np.float32)
        nrm = np.zeros((V, 3), np.float32)
        uv = np.zeros((V, 2), np.float32)
        inputs = np.zeros((V, 4, 4), np.float32)
        inputs[:, :, 3] = 1.0
        vert_instance = np.zeros(V, np.int32)
        tri_idx = np.zeros((T, 3), np.int32)
        tri_instance = np.zeros(T, np.int32)
        tri_valid = np.zeros(T, bool)

        voff = 0
        toff = 0
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
            pos[voff : voff + nv] = parsed["positions"]
            nrm[voff : voff + nv] = parsed["normals"]
            uv[voff : voff + nv] = parsed["uvs"]
            inputs[voff : voff + nv] = parsed["inputs"]
            vert_instance[voff : voff + nv] = ii
            perm = parsed["tri_perm"]
            tri_idx[toff : toff + nt] = parsed["indices"][perm] + voff
            tri_instance[toff : toff + nt] = ii
            tri_valid[toff : toff + nt] = True
            voff += nv
            toff += nt

        self._np.update(
            pos=pos, nrm=nrm, uv=uv, inputs=inputs, vert_instance=vert_instance,
            tri_idx=tri_idx, tri_instance=tri_instance, tri_valid=tri_valid,
        )
        self._geometry_key = key
        self._triangle_count = toff

    # -- per-frame ----------------------------------------------------------
    def pack_frame(self, instances: List[Instance], lights_arrays) -> SceneBuffers:
        lm = self.limits
        I = lm.max_instances
        transforms = np.tile(np.eye(4, dtype=np.float32), (I, 1, 1))
        prev_transforms = transforms.copy()
        mat_f = np.zeros((I, MAT_WIDTH), np.float32)
        mat_i = np.full((I, II_WIDTH), -1, np.int32)
        light_groups_inst = np.zeros(I, np.uint32)
        combiner = np.zeros((I, PARAMS_WIDTH), np.int32)

        for ii, inst in enumerate(instances[:I]):
            de = inst.desc
            m = de.material
            if de.transform is not None:
                transforms[ii] = np.asarray(de.transform, np.float32).reshape(4, 4)
            if de.previous_transform is not None:
                prev_transforms[ii] = np.asarray(
                    de.previous_transform, np.float32
                ).reshape(4, 4)
            else:
                prev_transforms[ii] = transforms[ii]
            mat_f[ii, MAT_IGNORE_NORMAL] = m.ignore_normal_factor
            mat_f[ii, MAT_UV_DETAIL_SCALE] = m.uv_detail_scale
            mat_f[ii, MAT_REFLECTION] = m.reflection_factor
            mat_f[ii, MAT_REFLECTION_FRESNEL] = m.reflection_fresnel_factor
            mat_f[ii, MAT_REFLECTION_SHINE] = m.reflection_shine_factor
            mat_f[ii, MAT_REFRACTION] = m.refraction_factor
            mat_f[ii, MAT_SPECULAR_R : MAT_SPECULAR_R + 3] = m.specular_color
            mat_f[ii, MAT_SPECULAR_EXP] = m.specular_exponent
            mat_f[ii, MAT_SOLID_ALPHA_MULT] = m.solid_alpha_multiplier
            mat_f[ii, MAT_SHADOW_ALPHA_MULT] = m.shadow_alpha_multiplier
            mat_f[ii, MAT_DEPTH_BIAS] = m.depth_bias
            mat_f[ii, MAT_SHADOW_RAY_BIAS] = m.shadow_ray_bias
            mat_f[ii, MAT_SELF_LIGHT_R : MAT_SELF_LIGHT_R + 3] = m.self_light
            mat_f[ii, MAT_FOG_R : MAT_FOG_R + 3] = m.fog_color
            mat_f[ii, MAT_DIFFUSE_MIX_R : MAT_DIFFUSE_MIX_R + 4] = m.diffuse_color_mix
            mat_f[ii, MAT_FOG_MUL] = m.fog_mul
            mat_f[ii, MAT_FOG_OFFSET] = m.fog_offset
            mat_f[ii, MAT_FOG_ENABLED] = float(m.fog_enabled)
            mat_f[ii, MAT_LOCK_MASK] = m.lock_mask
            light_groups_inst[ii] = np.uint32(m.light_group_mask_bits & 0xFFFFFFFF)

            def tex_id(t):
                return t.texture_id if t is not None else -1

            mat_i[ii, II_DIFFUSE_TEX] = (
                tex_id(de.diffuse_texture) if m.diffuse_tex_index < 0 else m.diffuse_tex_index
            )
            mat_i[ii, II_NORMAL_TEX] = tex_id(de.normal_texture)
            mat_i[ii, II_SPECULAR_TEX] = tex_id(de.specular_texture)
            sh = de.shader
            if sh is not None:
                mat_i[ii, II_FILTER] = sh.filter
                mat_i[ii, II_H_ADDR] = sh.h_addr
                mat_i[ii, II_V_ADDR] = sh.v_addr
                mat_i[ii, II_NORMAL_MAP] = int(sh.normal_map_enabled)
                mat_i[ii, II_SPECULAR_MAP] = int(sh.specular_map_enabled)
                combiner[ii] = sh.combiner.packed()
                mat_i[ii, II_ALPHA_CLASS] = int(_alpha_class(sh, m))
            mat_i[ii, II_NO_CULL] = int(bool(de.flags & d.INSTANCE_DISABLE_BACKFACE_CULLING))

        normal_mats = math3d.normal_matrix(transforms)

        L = lm.max_lights
        larr, lgroups = lights_arrays
        lights = np.zeros((L, larr.shape[1]), np.float32)
        groups = np.zeros(L, np.uint32)
        count = min(len(larr), L)
        lights[:count] = larr[:count]
        groups[:count] = lgroups[:count]

        def dev(x):
            return jnp.asarray(x)

        return SceneBuffers(
            pos=dev(self._np["pos"]),
            nrm=dev(self._np["nrm"]),
            uv=dev(self._np["uv"]),
            inputs=dev(self._np["inputs"]),
            vert_instance=dev(self._np["vert_instance"]),
            tri_idx=dev(self._np["tri_idx"]),
            tri_instance=dev(self._np["tri_instance"]),
            tri_valid=dev(self._np["tri_valid"]),
            transforms=dev(transforms),
            normal_mats=dev(normal_mats.astype(np.float32)),
            prev_transforms=dev(prev_transforms),
            mat_f=dev(mat_f),
            mat_i=dev(mat_i),
            light_groups_inst=dev(light_groups_inst),
            combiner=dev(combiner),
            lights=dev(lights),
            light_groups=dev(groups),
            light_count=jnp.int32(count),
            tex_pool=dev(self._np["tex_pool"]),
            tex_records=dev(self._np["tex_records"]),
        )
