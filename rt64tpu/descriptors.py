"""POD descriptor structs and constants of the public API.

Mirrors the C ABI surface of the reference (public/rt64.h:11-205): the
material/light/scene/view/instance/texture descriptors, the attribute
bitmask overlay system (rt64.h:207-267), and every named constant.
These are plain Python dataclasses — the host-side representation.
Device-side packing happens in :mod:`rt64tpu.pipeline.scene_buffers`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

Vec2 = Tuple[float, float]
Vec3 = Tuple[float, float, float]
Vec4 = Tuple[float, float, float, float]

# --- Material constants (rt64.h:12-24) ---
MATERIAL_FILTER_POINT = 0
MATERIAL_FILTER_LINEAR = 1
MATERIAL_ADDR_WRAP = 0
MATERIAL_ADDR_MIRROR = 1
MATERIAL_ADDR_CLAMP = 2
MATERIAL_CC_SHADER_0 = 0
MATERIAL_CC_SHADER_INPUT_1 = 1
MATERIAL_CC_SHADER_INPUT_2 = 2
MATERIAL_CC_SHADER_INPUT_3 = 3
MATERIAL_CC_SHADER_INPUT_4 = 4
MATERIAL_CC_SHADER_TEXEL0 = 5
MATERIAL_CC_SHADER_TEXEL0A = 6
MATERIAL_CC_SHADER_TEXEL1 = 7

# --- Material attributes (rt64.h:27-42) ---
ATTRIBUTE_NONE = 0x0000
ATTRIBUTE_IGNORE_NORMAL_FACTOR = 0x0001
ATTRIBUTE_UV_DETAIL_SCALE = 0x0002
ATTRIBUTE_REFLECTION_FACTOR = 0x0004
ATTRIBUTE_REFLECTION_FRESNEL_FACTOR = 0x0008
ATTRIBUTE_REFLECTION_SHINE_FACTOR = 0x0010
ATTRIBUTE_REFRACTION_FACTOR = 0x0020
ATTRIBUTE_SPECULAR_COLOR = 0x0040
ATTRIBUTE_SPECULAR_EXPONENT = 0x0080
ATTRIBUTE_SOLID_ALPHA_MULTIPLIER = 0x0100
ATTRIBUTE_SHADOW_ALPHA_MULTIPLIER = 0x0200
ATTRIBUTE_DEPTH_BIAS = 0x0400
ATTRIBUTE_SHADOW_RAY_BIAS = 0x0800
ATTRIBUTE_SELF_LIGHT = 0x1000
ATTRIBUTE_LIGHT_GROUP_MASK_BITS = 0x2000
ATTRIBUTE_DIFFUSE_COLOR_MIX = 0x4000

# --- Mesh flags (rt64.h:45-48) ---
MESH_RAYTRACE_ENABLED = 0x1
MESH_RAYTRACE_UPDATABLE = 0x2
MESH_RAYTRACE_FAST_TRACE = 0x4
MESH_RAYTRACE_COMPACT = 0x8

# --- Shader flags (rt64.h:51-59) ---
SHADER_FILTER_POINT = 0x0
SHADER_FILTER_LINEAR = 0x1
SHADER_ADDRESSING_WRAP = 0x0
SHADER_ADDRESSING_MIRROR = 0x1
SHADER_ADDRESSING_CLAMP = 0x2
SHADER_RASTER_ENABLED = 0x1
SHADER_RAYTRACE_ENABLED = 0x2
SHADER_NORMAL_MAP_ENABLED = 0x4
SHADER_SPECULAR_MAP_ENABLED = 0x8
# TPU extension (not in rt64.h): opt-in mip-mapped diffuse sampling
# driven by Igehy ray differentials (Ray.hlsli:37-94). The reference
# ships with its mip pass compiled out (rt64_device.cpp:758-762), so
# every rt64.h flag combination keeps bilinear level-0 behavior; this
# flag adds the minification filtering the reference never enabled.
SHADER_MIP_LOD_ENABLED = 0x10

# --- Instance flags (rt64.h:62-63) ---
INSTANCE_RASTER_BACKGROUND = 0x1
INSTANCE_DISABLE_BACKFACE_CULLING = 0x2

# --- Light flags (rt64.h:66-68) ---
LIGHT_GROUP_MASK_ALL = 0xFFFFFFFF
LIGHT_GROUP_DEFAULT = 0x1
LIGHT_MAX_SAMPLES = 128

# --- Upscaler constants (rt64.h:71-82) ---
UPSCALER_OFF = 0x0
UPSCALER_AUTO = 0x1
UPSCALER_DLSS = 0x2  # learned-model slot in the TPU build
UPSCALER_FSR = 0x3  # hand-written temporal upscaler
UPSCALER_XESS = 0x4  # learned-model slot (alias)
UPSCALER_MODE_AUTO = 0x0
UPSCALER_MODE_ULTRA_PERFORMANCE = 0x1
UPSCALER_MODE_PERFORMANCE = 0x2
UPSCALER_MODE_BALANCED = 0x3
UPSCALER_MODE_QUALITY = 0x4
UPSCALER_MODE_ULTRA_QUALITY = 0x5
UPSCALER_MODE_NATIVE = 0x6

# --- Texture formats (rt64.h:85-86) ---
TEXTURE_FORMAT_RGBA8 = 0x1
TEXTURE_FORMAT_DDS = 0x2

# --- Visualization modes (rt64_common.h:131-148, GlobalParams.hlsli) ---
VISUALIZATION_MODE_FINAL = 0
VISUALIZATION_MODE_SHADING_POSITION = 1
VISUALIZATION_MODE_SHADING_NORMAL = 2
VISUALIZATION_MODE_SHADING_SPECULAR = 3
VISUALIZATION_MODE_DIFFUSE = 4
VISUALIZATION_MODE_INSTANCE_ID = 5
VISUALIZATION_MODE_DIRECT_LIGHT_RAW = 6
VISUALIZATION_MODE_DIRECT_LIGHT_FILTERED = 7
VISUALIZATION_MODE_INDIRECT_LIGHT_RAW = 8
VISUALIZATION_MODE_INDIRECT_LIGHT_FILTERED = 9
VISUALIZATION_MODE_REFLECTION = 10
VISUALIZATION_MODE_REFRACTION = 11
VISUALIZATION_MODE_TRANSPARENT = 12
VISUALIZATION_MODE_FLOW = 13
VISUALIZATION_MODE_REACTIVE_MASK = 14
VISUALIZATION_MODE_LOCK_MASK = 15
VISUALIZATION_MODE_DEPTH = 16
VISUALIZATION_MODE_COUNT = 17


@dataclass
class Material:
    """RT64_MATERIAL (rt64.h:118-145)."""

    diffuse_tex_index: int = -1
    normal_tex_index: int = -1
    specular_tex_index: int = -1
    ignore_normal_factor: float = 0.0
    uv_detail_scale: float = 1.0
    reflection_factor: float = 0.0
    reflection_fresnel_factor: float = 0.0
    reflection_shine_factor: float = 0.0
    refraction_factor: float = 0.0
    specular_color: Vec3 = (1.0, 1.0, 1.0)
    specular_exponent: float = 5.0
    solid_alpha_multiplier: float = 1.0
    shadow_alpha_multiplier: float = 1.0
    depth_bias: float = 0.0
    shadow_ray_bias: float = 0.0
    self_light: Vec3 = (0.0, 0.0, 0.0)
    light_group_mask_bits: int = LIGHT_GROUP_MASK_ALL
    fog_color: Vec3 = (1.0, 1.0, 1.0)
    diffuse_color_mix: Vec4 = (0.0, 0.0, 0.0, 0.0)
    fog_mul: float = 0.0
    fog_offset: float = 0.0
    fog_enabled: int = 0
    lock_mask: float = 0.0
    enabled_attributes: int = ATTRIBUTE_NONE

    def copy(self) -> "Material":
        return dataclasses.replace(self)


# Attribute bit -> Material field(s); drives apply_material_attributes.
_ATTRIBUTE_FIELDS = {
    ATTRIBUTE_IGNORE_NORMAL_FACTOR: ("ignore_normal_factor",),
    ATTRIBUTE_UV_DETAIL_SCALE: ("uv_detail_scale",),
    ATTRIBUTE_REFLECTION_FACTOR: ("reflection_factor",),
    ATTRIBUTE_REFLECTION_FRESNEL_FACTOR: ("reflection_fresnel_factor",),
    ATTRIBUTE_REFLECTION_SHINE_FACTOR: ("reflection_shine_factor",),
    ATTRIBUTE_REFRACTION_FACTOR: ("refraction_factor",),
    ATTRIBUTE_SPECULAR_COLOR: ("specular_color",),
    ATTRIBUTE_SPECULAR_EXPONENT: ("specular_exponent",),
    ATTRIBUTE_SOLID_ALPHA_MULTIPLIER: ("solid_alpha_multiplier",),
    ATTRIBUTE_SHADOW_ALPHA_MULTIPLIER: ("shadow_alpha_multiplier",),
    ATTRIBUTE_DEPTH_BIAS: ("depth_bias",),
    ATTRIBUTE_SHADOW_RAY_BIAS: ("shadow_ray_bias",),
    ATTRIBUTE_SELF_LIGHT: ("self_light",),
    ATTRIBUTE_LIGHT_GROUP_MASK_BITS: ("light_group_mask_bits",),
    ATTRIBUTE_DIFFUSE_COLOR_MIX: ("diffuse_color_mix",),
}


def apply_material_attributes(dst: Material, src: Material) -> None:
    """Overlay src onto dst for every enabled attribute bit.

    Behavioral match of RT64_ApplyMaterialAttributes (rt64.h:207-267):
    only fields whose bit is set in ``src.enabled_attributes`` are copied.
    """
    for bit, fields in _ATTRIBUTE_FIELDS.items():
        if src.enabled_attributes & bit:
            for name in fields:
                setattr(dst, name, getattr(src, name))


@dataclass
class Light:
    """RT64_LIGHT (rt64.h:148-158)."""

    position: Vec3 = (0.0, 0.0, 0.0)
    diffuse_color: Vec3 = (1.0, 1.0, 1.0)
    attenuation_radius: float = 1e5
    point_radius: float = 0.0
    specular_color: Vec3 = (0.0, 0.0, 0.0)
    shadow_offset: float = 0.0
    attenuation_exponent: float = 1.0
    flicker_intensity: float = 0.0
    group_bits: int = LIGHT_GROUP_DEFAULT


@dataclass
class SceneDesc:
    """RT64_SCENE_DESC (rt64.h:160-170); defaults from rt64_scene.cpp:25-31."""

    ambient_base_color: Vec3 = (0.25, 0.25, 0.25)
    ambient_no_gi_color: Vec3 = (0.0, 0.0, 0.0)
    eye_light_diffuse_color: Vec3 = (0.0, 0.0, 0.0)
    eye_light_specular_color: Vec3 = (0.0, 0.0, 0.0)
    sky_diffuse_multiplier: Vec3 = (1.0, 1.0, 1.0)
    sky_hsl_modifier: Vec3 = (0.0, 0.0, 0.0)
    sky_yaw_offset: float = 0.0
    gi_diffuse_strength: float = 0.7
    gi_sky_strength: float = 0.35


@dataclass
class ViewDesc:
    """RT64_VIEW_DESC (rt64.h:172-182); defaults from rt64_view.cpp:44-60."""

    resolution_scale: float = 1.0
    motion_blur_strength: float = 0.0
    di_samples: int = 1
    gi_samples: int = 1
    max_lights: int = 12
    upscaler: int = UPSCALER_OFF
    upscaler_mode: int = UPSCALER_MODE_AUTO
    upscaler_sharpness: float = 0.0
    denoiser_enabled: bool = False


@dataclass
class InstanceDesc:
    """RT64_INSTANCE_DESC (rt64.h:184-196).

    mesh/textures/shader are the api.py object handles (or None).
    Transforms are 4x4 row-major nested tuples or numpy arrays.
    """

    mesh: Optional[object] = None
    transform: object = None
    previous_transform: object = None
    diffuse_texture: Optional[object] = None
    normal_texture: Optional[object] = None
    specular_texture: Optional[object] = None
    # TPU extension: second combiner texture (TEXEL1). The reference
    # has no binding slot for it and stubs TEXEL1 samples to magenta
    # (rt64_shader.cpp:484-487); binding one here makes TEXEL1
    # combiners sample it for real. None preserves the magenta parity
    # behavior. Set via RT64_SetInstanceAltTexture at the C ABI.
    alt_texture: Optional[object] = None
    shader: Optional[object] = None
    material: Material = field(default_factory=Material)
    scissor_rect: Optional[Tuple[int, int, int, int]] = None
    viewport_rect: Optional[Tuple[int, int, int, int]] = None
    flags: int = 0


@dataclass
class TextureDesc:
    """RT64_TEXTURE_DESC (rt64.h:198-205)."""

    bytes: object = None  # bytes-like or numpy array
    byte_count: int = 0
    format: int = TEXTURE_FORMAT_RGBA8
    width: int = 0
    height: int = 0
    row_pitch: int = 0
