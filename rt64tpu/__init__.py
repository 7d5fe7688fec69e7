"""rt64tpu — a TPU-native real-time raytracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of RT64's legacy
backend (DarioSamo/sm64rt-legacy-renderer): an N64-faithful hardware
raytracer with color-combiner shading, per-light shadow rays, 1-bounce
path-traced GI, recursive reflections/refractions, a spatiotemporal
denoiser, and an upscaler slot — all resident in TPU HBM as one fused
XLA program per frame.

Architecture (TPU-first, not a port):
  * The D3D12 DXR pipeline (TLAS/BLAS + raygen/any-hit shaders,
    reference src/rt64lib/private/rt64_view.cpp) is replaced by a
    wavefront design: world-space triangles are rebuilt in-jit each
    frame, grouped into Morton-ordered clusters with AABBs, and traced
    by packet kernels with block-granularity culling.
  * Runtime HLSL codegen per combiner shaderId (rt64_shader.cpp) is
    replaced by a data-driven, fully vectorized combiner interpreter.
  * Hand-placed UAV barriers become XLA dataflow; the per-frame
    descriptor-heap rewrite becomes a pytree of donated HBM arrays.

Public API mirrors the RT64 C ABI (reference public/rt64.h) via
:mod:`rt64tpu.api`; POD descriptors live in :mod:`rt64tpu.descriptors`.
"""

from rt64tpu.descriptors import (  # noqa: F401
    Material,
    Light,
    SceneDesc,
    ViewDesc,
    InstanceDesc,
    TextureDesc,
    apply_material_attributes,
)
from rt64tpu.api import (  # noqa: F401
    Device,
    Scene,
    View,
    Mesh,
    Texture,
    Shader,
    Instance,
    Inspector,
)

__version__ = "0.1.0"
