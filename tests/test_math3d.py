"""Math core: Halton, matrices, projections, screen mapping."""

import numpy as np

from rt64tpu.ops import math3d


def test_halton_sequence_values():
    # HaltonSequence(i, 2): 1->0.5, 2->0.25, 3->0.75 (rt64_common.h:347).
    assert math3d.halton(1, 2) == 0.5
    assert math3d.halton(2, 2) == 0.25
    assert math3d.halton(3, 2) == 0.75
    assert abs(math3d.halton(1, 3) - 1 / 3) < 1e-9


def test_halton_jitter_range():
    for frame in range(100):
        jx, jy = math3d.halton_jitter(frame, 16)
        assert -0.5 <= jx <= 0.5 and -0.5 <= jy <= 0.5


def test_row_vector_translation():
    m = math3d.translation(1, 2, 3)
    p = math3d.transform_points(np.array([0.0, 0.0, 0.0], np.float32), m)
    np.testing.assert_allclose(p, [1, 2, 3])


def test_look_at_inverse_position():
    eye = np.array([3.0, 4.0, 5.0], np.float32)
    vm = math3d.look_at_rh(eye, (0, 0, 0), (0, 1, 0))
    vi = np.linalg.inv(vm)
    # Camera position = [0,0,0,1] @ viewI (rt64_view.cpp:1795-1798).
    np.testing.assert_allclose(vi[3, :3], eye, atol=1e-5)


def test_perspective_projects_center():
    proj = math3d.perspective_fov_rh(0.8, 4 / 3, 0.1, 100.0)
    vm = math3d.look_at_rh((0, 0, 5), (0, 0, 0), (0, 1, 0))
    vp = vm @ proj
    uv = math3d.world_to_screen(vp, np.array([0.0, 0.0, 0.0], np.float32))
    np.testing.assert_allclose(uv, [0.5, 0.5], atol=1e-6)
    # A point right of center (+x) should land at u > 0.5.
    uv2 = math3d.world_to_screen(vp, np.array([1.0, 0.0, 0.0], np.float32))
    assert uv2[0] > 0.5


def test_normal_matrix_nonuniform_scale():
    m = math3d.scaling(2.0, 1.0, 1.0)
    nm = math3d.normal_matrix(m)
    n = math3d.transform_dirs(np.array([1.0, 0.0, 0.0], np.float32), nm)
    n = n / np.linalg.norm(n)
    np.testing.assert_allclose(n, [1, 0, 0], atol=1e-6)
    # Plane normal of a stretched 45deg surface must stay perpendicular.
    v = np.array([1.0, 1.0, 0.0], np.float32) / np.sqrt(2)
    n2 = math3d.transform_dirs(v, nm)
    t = math3d.transform_dirs(np.array([1.0, -1.0, 0.0], np.float32), m)
    assert abs(np.dot(n2, t)) < 1e-5
