"""Static capacity buckets for the device-resident scene.

XLA traces fixed shapes; the reference instead grows GPU buffers
monotonically and rewrites descriptor heaps per frame
(rt64_view.cpp:338-346,431-447). The TPU-native equivalent is padding
every scene array to a capacity bucket and bumping buckets (causing a
single retrace) only when exceeded.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


def _next_bucket(n: int, lo: int) -> int:
    cap = lo
    while cap < n:
        cap *= 2
    return cap


@dataclass(frozen=True)
class SceneLimits:
    """Capacity buckets. All counts are padded up to these."""

    max_vertices: int = 1 << 14
    max_triangles: int = 1 << 13
    max_instances: int = 64
    # Light BUFFER capacity bucket (grows by fit(), floor 2). Distinct
    # from MAX_LIGHTS=16, the per-pixel selection cap (Lights.hlsli:24):
    # every light-selection op is (L, N) over the padded buffer, so a
    # 2-light scene padded to 16 paid 8x the selection bandwidth.
    max_lights: int = 2
    max_textures: int = 64
    texel_pool: int = 1 << 20  # RGBA8 texels in the atlas pool
    max_hit_queries: int = 16  # MAX_HIT_QUERIES (GlobalHitBuffers.hlsli:8)
    alpha_triangles: int = 256  # compacted alpha-class triangle capacity
    raster_triangles: int = 64  # raster bg/fg triangle capacity (each)
    cluster_size: int = 32  # triangles per leaf cluster
    clusters_per_group: int = 8  # clusters per mid-level AABB group
    vertex_inputs: int = 2  # supported per-vertex combiner input colors

    @property
    def max_clusters(self) -> int:
        return -(-self.max_triangles // self.cluster_size)

    @property
    def max_groups(self) -> int:
        return -(-self.max_clusters // self.clusters_per_group)

    def grown_for(
        self,
        vertices: int = 0,
        triangles: int = 0,
        instances: int = 0,
        lights: int = 0,
        textures: int = 0,
        texels: int = 0,
    ) -> "SceneLimits":
        """Return limits (possibly self) large enough for the given counts."""
        new = replace(
            self,
            max_vertices=_next_bucket(vertices, self.max_vertices),
            max_triangles=_next_bucket(triangles, self.max_triangles),
            max_instances=_next_bucket(instances, self.max_instances),
            max_lights=_next_bucket(lights, self.max_lights),
            max_textures=_next_bucket(textures, self.max_textures),
            texel_pool=_next_bucket(texels, self.texel_pool),
        )
        return self if new == self else new
