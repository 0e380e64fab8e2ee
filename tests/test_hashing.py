"""Statistical quality tests for the stateless counter hash (ops/hashing.py)
— the lattice engine's RNG. Referenced by the module docstring."""

import numpy as np

import jax.numpy as jnp

from kmc_tpu.ops.hashing import cell_uniform, hash_u32, scalar_uniforms


def test_uniform_moments():
    u = np.asarray(cell_uniform((256, 256), jnp.int32(7), 5))
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1 / 12) < 0.005
    assert u.min() >= 0.0 and u.max() < 1.0


def test_chi_square_uniformity():
    u = np.asarray(cell_uniform((512, 512), jnp.int32(3), 9)).ravel()
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    chi2 = np.sum((counts - expected) ** 2 / expected)
    # 63 dof: mean 63, sd ~11; 5-sigma bound
    assert chi2 < 63 + 5 * np.sqrt(2 * 63), chi2


def test_step_decorrelation():
    a = np.asarray(cell_uniform((128, 128), jnp.int32(10), 1)).ravel()
    b = np.asarray(cell_uniform((128, 128), jnp.int32(11), 1)).ravel()
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.02


def test_stream_decorrelation():
    a = np.asarray(cell_uniform((128, 128), jnp.int32(10), 1)).ravel()
    b = np.asarray(cell_uniform((128, 128), jnp.int32(10), 2)).ravel()
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.02


def test_neighbor_cell_decorrelation():
    u = np.asarray(cell_uniform((256, 256), jnp.int32(4), 3))
    right = np.corrcoef(u[:, :-1].ravel(), u[:, 1:].ravel())[0, 1]
    down = np.corrcoef(u[:-1, :].ravel(), u[1:, :].ravel())[0, 1]
    assert abs(right) < 0.02 and abs(down) < 0.02


def test_offset_consistency():
    """A shifted block with global offsets reproduces the full grid's values
    — the property halo exchange depends on."""
    full = np.asarray(cell_uniform((64, 64), jnp.int32(5), 7))
    block = np.asarray(
        cell_uniform((16, 16), jnp.int32(5), 7, row0=8, col0=24,
                     full_height=64, full_width=64)
    )
    np.testing.assert_array_equal(block, full[8:24, 24:40])
    # negative (halo) offsets wrap periodically
    halo = np.asarray(
        cell_uniform((4, 4), jnp.int32(5), 7, row0=-2, col0=-2,
                     full_height=64, full_width=64)
    )
    np.testing.assert_array_equal(halo[2:, 2:], full[:2, :2])
    np.testing.assert_array_equal(halo[:2, :2], full[-2:, -2:])


def test_seed_changes_everything():
    a = np.asarray(scalar_uniforms(16, jnp.int32(3), 0 * 16))
    b = np.asarray(scalar_uniforms(16, jnp.int32(3), 1 * 16))
    assert not np.allclose(a, b)
