"""Geometry pipeline: Morton ordering, clusters, per-frame world refit.

TPU-native replacement for the driver BLAS/TLAS black box the reference
relies on (contrib/nv_helpers_dx12/BottomLevelASGenerator.cpp,
TopLevelASGenerator.cpp; built/refit at rt64_mesh.cpp:114-158 and
rt64_view.cpp:412-452). Design:

  * At mesh upload ("BLAS build"), triangles are reordered along a
    Morton curve of their object-space centroids so that consecutive
    triangles are spatially coherent. This is host-side, once per mesh
    version — the analog of the driver's BLAS build cost.
  * Each frame ("TLAS rebuild + BLAS refit"), one fused XLA program
    transforms every vertex to world space (a batched (V,3)x(3,3)
    matmul feeding the MXU), and refits a 2-level hierarchy of AABBs
    over fixed-size triangle clusters with pure min/max reductions —
    no pointer chasing, no divergent builds.

Traversal consumes: world triangle vertices, cluster AABBs, group
AABBs, and per-cluster alpha/any flags for block-level culling.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _expand_bits_10(v: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(np.uint32) & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton3d(points: np.ndarray) -> np.ndarray:
    """30-bit Morton codes for points normalized to the unit cube."""
    p = np.clip(points * 1024.0, 0.0, 1023.0)
    x = _expand_bits_10(p[..., 0].astype(np.uint32))
    y = _expand_bits_10(p[..., 1].astype(np.uint32))
    z = _expand_bits_10(p[..., 2].astype(np.uint32))
    return (x << 2) | (y << 1) | z


def morton_order(vertices: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Triangle permutation sorting centroids along a Morton curve.

    vertices: (V, 3) float; indices: (T, 3) int. Returns (T,) permutation.
    """
    tri = vertices[indices]  # (T, 3, 3)
    centroid = tri.mean(axis=1)
    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    extent = np.maximum(hi - lo, 1e-8)
    codes = morton3d((centroid - lo) / extent)
    return np.argsort(codes, kind="stable")


def transform_vertices(positions, normals, transforms, normal_mats, vert_instance):
    """World-space positions/normals for all scene vertices, in-jit.

    positions: (V, 3); normals: (V, 3); transforms: (I, 4, 4) row-vector
    object-to-world; normal_mats: (I, 4, 4); vert_instance: (V,) int32.

    The per-vertex transform gather keeps this one fused op: XLA lowers
    it to a gather + batched matmul, the TLAS-rebuild analog
    (rt64_view.cpp:412-452) at a fraction of the cost.
    """
    m = transforms[vert_instance]  # (V, 4, 4)
    nm = normal_mats[vert_instance]
    world_pos = jnp.einsum("vi,vij->vj", positions, m[:, :3, :3]) + m[:, 3, :3]
    world_nrm = jnp.einsum("vi,vij->vj", normals, nm[:, :3, :3])
    return world_pos, world_nrm


def triangle_corners(world_pos, tri_idx):
    """Gather triangle corner positions: (T, 3) x3 -> v0, v1, v2."""
    v0 = world_pos[tri_idx[:, 0]]
    v1 = world_pos[tri_idx[:, 1]]
    v2 = world_pos[tri_idx[:, 2]]
    return v0, v1, v2


def refit_clusters(v0, v1, v2, tri_valid, cluster_size: int, clusters_per_group: int):
    """Refit cluster and group AABBs over the world triangle soup.

    Returns (cluster_lo, cluster_hi, group_lo, group_hi): the 2-level
    hierarchy consumed by the packet tracer. Invalid (padding)
    triangles contribute +inf/-inf so empty clusters never intersect.
    """
    big = jnp.float32(3.0e37)
    valid = tri_valid[:, None]
    lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    lo = jnp.where(valid, lo, big)
    hi = jnp.where(valid, hi, -big)
    n_clusters = lo.shape[0] // cluster_size
    cl_lo = lo.reshape(n_clusters, cluster_size, 3).min(axis=1)
    cl_hi = hi.reshape(n_clusters, cluster_size, 3).max(axis=1)
    n_groups = n_clusters // clusters_per_group
    gr_lo = cl_lo.reshape(n_groups, clusters_per_group, 3).min(axis=1)
    gr_hi = cl_hi.reshape(n_groups, clusters_per_group, 3).max(axis=1)
    return cl_lo, cl_hi, gr_lo, gr_hi


def cluster_flags(tri_alpha, tri_valid, cluster_size: int):
    """Per-cluster reductions: any-valid and any-alpha flags."""
    n_clusters = tri_alpha.shape[0] // cluster_size
    valid = tri_valid.reshape(n_clusters, cluster_size).any(axis=1)
    alpha = (tri_alpha & tri_valid).reshape(n_clusters, cluster_size).any(axis=1)
    return valid, alpha
