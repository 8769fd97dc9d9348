import math

import numpy as np
import pytest

from vlnce_tpu.tasks import geometry as geo


def test_heading_quat_roundtrip():
    for phi in np.linspace(0, 2 * math.pi, 17, endpoint=False):
        q = geo.quat_from_heading(phi)
        assert abs(geo.heading_from_quaternion(q) - phi) % (2 * math.pi) < 1e-9


def test_forward_direction_convention():
    # heading 0 faces -z
    assert np.allclose(geo.heading_to_forward_xz(0.0), [0.0, -1.0])
    # heading pi/2 faces -x (turn left)
    assert np.allclose(geo.heading_to_forward_xz(math.pi / 2), [-1.0, 0.0], atol=1e-12)


def test_compute_heading_to_consistency():
    # heading toward a point straight ahead equals the agent's own heading
    for phi in [0.1, 1.3, 3.0, 5.5]:
        fwd = geo.heading_to_forward_xz(phi)
        target = [fwd[0] * 2.0, 0.0, fwd[1] * 2.0]
        _, angle = geo.compute_heading_to([0.0, 0.0, 0.0], target)
        assert abs((angle - phi + math.pi) % (2 * math.pi) - math.pi) < 1e-9


def test_rtheta_roundtrip():
    # r along theta=0 moves straight ahead
    pos = geo.rtheta_to_global_coordinates([1.0, 0.0, 1.0], 0.0, 2.0, 0.0, dimensionality=3)
    assert np.allclose(pos, [1.0, 0.0, -1.0])
    # theta=pi/2 moves left (-x)
    pos = geo.rtheta_to_global_coordinates([0.0, 0.0, 0.0], 0.0, 1.0, math.pi / 2, dimensionality=2)
    assert np.allclose(pos, [-1.0, 0.0], atol=1e-12)


def test_predictions_to_global_matches_rtheta():
    # pano k at offset o distance d == rtheta with theta = k*2pi/12 + o
    heading = 0.7
    pano, offset, dist = 3, 0.1, 1.5
    xz = geo.predictions_to_global_xz(
        np.array([pano]), np.array([offset]), np.array([dist]),
        np.array([[2.0, 0.0, 3.0]]), np.array([heading]),
    )[0]
    expected = geo.rtheta_to_global_coordinates(
        [2.0, 0.0, 3.0], heading, dist, pano * 2 * math.pi / 12 + offset, dimensionality=2
    )
    assert np.allclose(xz, expected, atol=1e-9)


def test_quat_rotate_vector_identity_and_composition():
    q = geo.quat_from_angle_axis(0.3, [0, 1, 0])
    v = np.array([1.0, 2.0, 3.0])
    q2 = geo.quat_multiply(q, q)
    r1 = geo.quat_rotate_vector(q, geo.quat_rotate_vector(q, v))
    r2 = geo.quat_rotate_vector(q2, v)
    assert np.allclose(r1, r2)
    assert np.allclose(geo.quat_rotate_vector(geo.IDENTITY_QUAT, v), v)
