"""Unit tests for geometry kernels (C4) against closed-form cases and the
reference formulas (main.cpp:332-342, 2329-2366)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kmc_tpu.geometry import (
    align_angle_2d,
    angle_between_deg,
    apply_rotation,
    euler_matrix,
    quat_from_euler,
    quat_mul,
    quat_to_mat,
    reflect_z,
    rot2d_apply,
    rot_z,
    wrap_shift,
)


def ref_euler(theta, phi, psai):
    """Literal transcription of the reference matrix (main.cpp:332-342)."""
    t = np.zeros((3, 3))
    t[0][0] = np.cos(psai) * np.cos(phi) - np.cos(theta) * np.sin(phi) * np.sin(psai)
    t[0][1] = -np.sin(psai) * np.cos(phi) - np.cos(theta) * np.sin(phi) * np.cos(psai)
    t[0][2] = np.sin(theta) * np.sin(phi)
    t[1][0] = np.cos(psai) * np.sin(phi) + np.cos(theta) * np.cos(phi) * np.sin(psai)
    t[1][1] = -np.sin(psai) * np.sin(phi) + np.cos(theta) * np.cos(phi) * np.cos(psai)
    t[1][2] = -np.sin(theta) * np.cos(phi)
    t[2][0] = np.sin(psai) * np.sin(theta)
    t[2][1] = np.cos(psai) * np.sin(theta)
    t[2][2] = np.cos(theta)
    return t


@pytest.mark.parametrize("angles", [(0.0, 0.0, 0.7), (0.3, -1.1, 2.0),
                                    (-2.9, 0.4, -0.2)])
def test_euler_matches_reference(angles):
    got = np.asarray(euler_matrix(*angles))
    want = ref_euler(*angles)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_euler_is_zxz():
    """The reference convention factors as Rz(phi) Rx(theta) Rz(psai)."""
    th, ph, ps = 0.5, 1.2, -0.8

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                         [0, 0, 1]])

    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                         [0, np.sin(a), np.cos(a)]])

    want = rz(ph) @ rx(th) @ rz(ps)
    np.testing.assert_allclose(np.asarray(euler_matrix(th, ph, ps)), want,
                               atol=1e-6)


def test_quat_matches_euler():
    th, ph, ps = 0.4, -0.9, 1.7
    q = quat_from_euler(th, ph, ps)
    np.testing.assert_allclose(
        np.asarray(quat_to_mat(q)), np.asarray(euler_matrix(th, ph, ps)),
        atol=1e-6,
    )


def test_quat_mul_composes():
    q1 = quat_from_euler(0.2, 0.3, 0.4)
    q2 = quat_from_euler(-0.7, 1.1, 0.5)
    np.testing.assert_allclose(
        np.asarray(quat_to_mat(quat_mul(q1, q2))),
        np.asarray(quat_to_mat(q1) @ quat_to_mat(q2)),
        atol=1e-6,
    )


def test_rot_z_matches():
    p = jnp.array([[1.0, 0.0, 5.0]])
    out = apply_rotation(rot_z(jnp.pi / 2), p, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out), [[0.0, 1.0, 5.0]], atol=1e-6)


def test_angle_between_deg():
    assert float(angle_between_deg(jnp.array([1.0, 0, 0]),
                                   jnp.array([0.0, 1, 0]))) == pytest.approx(90.0)
    assert float(angle_between_deg(jnp.array([1.0, 0, 0]),
                                   jnp.array([-2.0, 0, 0]))) == pytest.approx(180.0)
    # acos clamping: numerically parallel vectors must not NaN (main.cpp:2357-2362)
    v = jnp.array([1.0, 1.0, 1.0])
    assert float(angle_between_deg(v, v * 3.0)) == pytest.approx(0.0, abs=1e-2)


def test_wrap_and_reflect():
    assert float(wrap_shift(5900.0, 5773.0)) == pytest.approx(5773.0)
    assert float(wrap_shift(-5900.0, 5773.0)) == pytest.approx(-5773.0)
    # main.cpp:925-931: z = -z + 2*Lz*round(z/Lz)
    assert float(reflect_z(-5.0, 1000.0)) == pytest.approx(5.0)
    assert float(reflect_z(1005.0, 1000.0)) == pytest.approx(995.0)


def test_align_angle_2d_rotates_a_onto_b():
    a = jnp.array([0.0, 1.0])
    b = jnp.array([-1.0, 0.0])
    ang = align_angle_2d(a, b)
    rotated = rot2d_apply(ang, a[None, :])
    np.testing.assert_allclose(np.asarray(rotated[0]), np.asarray(b), atol=1e-6)
