"""Vector/matrix math in the reference's row-vector convention.

The reference uses DirectXMath row-major, row-vector matrices: points
transform as ``[x y z 1] @ M`` and translations live in ``M[3, :3]``
(see sample main.cpp:244-258, rt64_view.cpp:1759-1766). All matrices in
this framework follow that convention, host- and device-side, so view
matrices arriving through the API are used verbatim.

Works on numpy or jax.numpy arrays (pass the namespace via ``xp`` or
let it default to jnp).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def transform_points(points, m):
    """``[p, 1] @ M`` -> xyz. points: (..., 3), m: (..., 4, 4)."""
    xp = jnp if isinstance(points, jnp.ndarray) else np
    p = points @ m[..., :3, :3] + m[..., 3, :3]
    del xp
    return p


def transform_points_h(points, m):
    """``[p, 1] @ M`` -> xyzw (homogeneous). points: (..., 3)."""
    return points @ m[..., :3, :4] + m[..., 3, :4]


def transform_dirs(dirs, m):
    """``[d, 0] @ M`` -> xyz (no translation)."""
    return dirs @ m[..., :3, :3]


def normal_matrix(m):
    """objectToWorldNormal: transpose(inverse(upper3x3)) padded to 4x4.

    Matches rt64_view.cpp:359-370.
    """
    xp = jnp if isinstance(m, jnp.ndarray) else np
    m3 = m[..., :3, :3]
    inv_t = xp.swapaxes(xp.linalg.inv(m3), -1, -2)
    out = xp.zeros(m.shape[:-2] + (4, 4), dtype=m.dtype)
    if xp is np:
        out[..., :3, :3] = inv_t
        out[..., 3, 3] = 1.0
        return out
    out = out.at[..., :3, :3].set(inv_t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def perspective_fov_rh(fov_radians: float, aspect: float, near: float, far: float):
    """XMMatrixPerspectiveFovRH, row-vector convention (rt64_view.cpp:1766)."""
    h = 1.0 / math.tan(fov_radians * 0.5)
    w = h / aspect
    rng = far / (near - far)
    return np.array(
        [
            [w, 0.0, 0.0, 0.0],
            [0.0, h, 0.0, 0.0],
            [0.0, 0.0, rng, -1.0],
            [0.0, 0.0, rng * near, 0.0],
        ],
        dtype=np.float32,
    )


def look_at_rh(eye, target, up):
    """XMMatrixLookAtRH, row-vector convention (view matrix)."""
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    z = eye - target
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = x
    m[:3, 1] = y
    m[:3, 2] = z
    m[3, 0] = -float(np.dot(x, eye))
    m[3, 1] = -float(np.dot(y, eye))
    m[3, 2] = -float(np.dot(z, eye))
    return m


def translation(x: float, y: float, z: float):
    m = np.eye(4, dtype=np.float32)
    m[3, :3] = (x, y, z)
    return m


def scaling(x: float, y: float, z: float):
    return np.diag(np.array([x, y, z, 1.0], np.float32))


def rotation_y(angle: float):
    c, s = math.cos(angle), math.sin(angle)
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], np.float32
    )


def normalize(v, eps: float = 0.0):
    xp = jnp if isinstance(v, jnp.ndarray) else np
    n = xp.linalg.norm(v, axis=-1, keepdims=True)
    if eps:
        n = xp.maximum(n, eps)
    return v / n


def world_to_screen(view_proj, world_pos):
    """WorldToScreenPos (PrimaryRayGen.hlsl:20-24): uv in [0,1]."""
    clip = transform_points_h(world_pos, view_proj)
    ndc = clip[..., :3] / clip[..., 3:4]
    return 0.5 + ndc[..., :2] * 0.5


def halton(i: int, b: int) -> float:
    """HaltonSequence (rt64_common.h:347-357)."""
    f, r = 1.0, 0.0
    while i > 0:
        f /= b
        r += f * (i % b)
        i //= b
    return r


def halton_jitter(frame: int, phases: int):
    """HaltonJitter (rt64_common.h:359-361): in [-0.5, 0.5]^2."""
    i = frame % phases + 1
    return (halton(i, 2) - 0.5, halton(i, 3) - 0.5)


def camera_uvw(view_i, fov_radians: float, aspect: float, near: float, far: float):
    """Pinhole camera basis (rt64_view.cpp:993-1010).

    Returns (cameraU, cameraV, cameraW) scaled by focal distance and
    half-extents, used to build non-normalized ray directions as
    ``d.x*U + d.y*V + W``.
    """
    xp = jnp if isinstance(view_i, jnp.ndarray) else np
    focal = (near + far) / 2.0
    pos = view_i[3, :3]
    fwd = view_i[2, :3]  # [0,0,1,0] @ viewI (rt64_view.cpp:1800-1803)
    fwd = fwd / xp.linalg.norm(fwd)
    target = pos + fwd * focal
    up = xp.asarray([0.0, 1.0, 0.0], dtype=view_i.dtype)
    w = target - pos
    w = w / xp.linalg.norm(w) * focal
    u = xp.cross(w, up)
    u = u / xp.linalg.norm(u)
    v = xp.cross(u, w)
    v = v / xp.linalg.norm(v)
    ulen = focal * math.tan(fov_radians * 0.5) * aspect
    vlen = focal * math.tan(fov_radians * 0.5)
    return u * ulen, v * vlen, w
