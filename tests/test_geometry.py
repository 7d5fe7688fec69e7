"""Geometry pipeline: Morton order, cluster refit."""

import numpy as np
import jax.numpy as jnp

from rt64tpu.ops import geometry


def test_morton_order_is_permutation_and_local():
    rng = np.random.default_rng(4)
    verts = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    idx = rng.integers(0, 300, (500, 3))
    perm = geometry.morton_order(verts, idx)
    assert sorted(perm.tolist()) == list(range(500))
    # Locality: mean distance between consecutive centroids should be
    # far below random order's.
    c = verts[idx].mean(axis=1)
    d_sorted = np.linalg.norm(np.diff(c[perm], axis=0), axis=1).mean()
    d_random = np.linalg.norm(np.diff(c, axis=0), axis=1).mean()
    assert d_sorted < d_random * 0.6


def test_cluster_refit_bounds():
    rng = np.random.default_rng(5)
    T = 64
    v0 = rng.normal(0, 1, (T, 3)).astype(np.float32)
    v1 = v0 + rng.normal(0, 0.1, (T, 3)).astype(np.float32)
    v2 = v0 + rng.normal(0, 0.1, (T, 3)).astype(np.float32)
    valid = np.ones(T, bool)
    valid[48:] = False  # cluster 3 (tris 48..63) fully invalid
    cl_lo, cl_hi, gr_lo, gr_hi = geometry.refit_clusters(
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(valid), cluster_size=16, clusters_per_group=2,
    )
    cl_lo, cl_hi = np.asarray(cl_lo), np.asarray(cl_hi)
    # First cluster bounds all of tris 0..15.
    pts = np.concatenate([v0[:16], v1[:16], v2[:16]])
    np.testing.assert_allclose(cl_lo[0], pts.min(0), rtol=1e-6)
    np.testing.assert_allclose(cl_hi[0], pts.max(0), rtol=1e-6)
    # Fully-invalid cluster is inverted (never intersects).
    assert np.all(cl_lo[3] > cl_hi[3])
    # Groups contain their clusters.
    np.testing.assert_allclose(np.asarray(gr_lo)[0], np.minimum(cl_lo[0], cl_lo[1]))


def test_transform_vertices_matches_numpy():
    from rt64tpu.ops import math3d

    rng = np.random.default_rng(6)
    V, I = 50, 3
    pos = rng.normal(0, 1, (V, 3)).astype(np.float32)
    nrm = rng.normal(0, 1, (V, 3)).astype(np.float32)
    transforms = np.stack([
        math3d.translation(1, 0, 0),
        math3d.scaling(2, 1, 1) @ math3d.translation(0, 5, 0),
        math3d.rotation_y(0.7),
    ])
    nmats = math3d.normal_matrix(transforms)
    vi = rng.integers(0, I, V).astype(np.int32)
    wp, wn = geometry.transform_vertices(
        jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(transforms),
        jnp.asarray(nmats), jnp.asarray(vi),
    )
    for k in range(V):
        want = math3d.transform_points(pos[k], transforms[vi[k]])
        np.testing.assert_allclose(np.asarray(wp[k]), want, rtol=1e-5, atol=1e-5)
