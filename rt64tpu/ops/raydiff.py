"""Igehy ray differentials (Ray.hlsli:37-94) — provided for parity.

The reference propagates ray differentials through hits to drive
SampleGrad texture LOD (rt64_shader.cpp:474-480), but its mip pass is
compiled out (rt64_device.cpp:758-762) so the gradients never change
the sampled level. The hot path therefore omits them; this module keeps
the math available (planar layout) for when a mip-enabled sampler is
wired in.
"""

from __future__ import annotations

import jax.numpy as jnp

from rt64tpu.ops import vecmath as vm


def compute_ray_diffs(non_norm_dir, camera_right, camera_up, viewport_wh):
    """computeRayDiffs (Ray.hlsli:40-49): camera-ray direction
    differentials. non_norm_dir: (3, N); camera_right/up: (3,)."""
    r = vm.splat(camera_right, non_norm_dir)
    u = vm.splat(camera_up, non_norm_dir)
    dd = vm.dot(non_norm_dir, non_norm_dir)
    divd = 2.0 / (dd * jnp.sqrt(dd))
    dr = vm.dot(non_norm_dir, r)
    du = vm.dot(non_norm_dir, u)
    d_dx = (r * dd[None] - non_norm_dir * dr[None]) * divd[None] / viewport_wh[0]
    d_dy = -(u * dd[None] - non_norm_dir * du[None]) * divd[None] / viewport_wh[1]
    return d_dx, d_dy


def propagate(d_odx, d_ody, d_ddx, d_ddy, direction, t, normal):
    """propagateRayDiffs (Ray.hlsli:51-66): transfer to a hit plane."""
    dodx = d_odx + d_ddx * t[None]
    dody = d_ody + d_ddy * t[None]
    rcp_dn = 1.0 / vm.dot(direction, normal)
    dtdx = -vm.dot(dodx, normal) * rcp_dn
    dtdy = -vm.dot(dody, normal) * rcp_dn
    return dodx + direction * dtdx[None], dody + direction * dtdy[None]


def barycentric_differentials(d_odx, d_ody, edge01, edge02, face_normal):
    """computeBarycentricDifferentials (Ray.hlsli:68-78)."""
    nu = vm.cross(edge02, face_normal)
    nv = vm.cross(edge01, face_normal)
    lu = nu / vm.dot(nu, edge01)[None]
    lv = nv / vm.dot(nv, edge02)[None]
    return (
        (vm.dot(lu, d_odx), vm.dot(lv, d_odx)),
        (vm.dot(lu, d_ody), vm.dot(lv, d_ody)),
    )


def texture_differentials(dbary_dx, dbary_dy, uv0, uv1, uv2):
    """computeTextureDifferentials (Ray.hlsli:88-94). uv*: (2, N)."""
    uv01 = uv1 - uv0
    uv02 = uv2 - uv0
    duv_dx = uv01 * dbary_dx[0][None] + uv02 * dbary_dx[1][None]
    duv_dy = uv01 * dbary_dy[0][None] + uv02 * dbary_dy[1][None]
    return duv_dx, duv_dy
