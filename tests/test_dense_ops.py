"""ops/dense.py: one-hot matmul gathers/scatters must be BITWISE equal to
the indexing they replace (they are drop-in hot-path substitutes)."""

import numpy as np

import jax
import jax.numpy as jnp

from kmc_tpu.ops import dense


def test_take_f32_bitwise():
    k = jax.random.key(0)
    vals = jax.random.normal(k, (37, 5)) * 1e4          # spread exponents
    idx = jax.random.randint(jax.random.key(1), (90,), 0, 37)
    got = dense.take(vals, dense.onehot(idx, 37))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(vals[idx]))


def test_take_int_bool_bitwise():
    vals_i = jax.random.randint(jax.random.key(2), (25, 3), -(2**20), 2**20)
    vals_b = jax.random.bernoulli(jax.random.key(3), 0.3, (25,))
    idx = jax.random.randint(jax.random.key(4), (40,), 0, 25)
    oh = dense.onehot(idx, 25)
    np.testing.assert_array_equal(np.asarray(dense.take(vals_i, oh)),
                                  np.asarray(vals_i[idx]))
    np.testing.assert_array_equal(np.asarray(dense.take(vals_b, oh)),
                                  np.asarray(vals_b[idx]))
    assert dense.take(vals_i, oh).dtype == vals_i.dtype
    assert dense.take(vals_b, oh).dtype == jnp.bool_


def test_take_multidim_values():
    vals = jax.random.normal(jax.random.key(5), (12, 3, 3))
    idx = jnp.array([0, 11, 5, 5, 3])
    got = dense.take(vals, dense.onehot(idx, 12))
    assert got.shape == (5, 3, 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(vals[idx]))


def test_take_vmapped_bitwise():
    vals = jax.random.normal(jax.random.key(6), (8, 20, 4))
    idx = jax.random.randint(jax.random.key(7), (8, 33), 0, 20)

    def one(v, i):
        return dense.take(v, dense.onehot(i, 20))

    got = jax.jit(jax.vmap(one))(vals, idx)
    want = jax.vmap(lambda v, i: v[i])(vals, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_scatter_or_2d_matches_at_max():
    rows = jnp.array([0, 3, 3, 7, 2, 0])
    cols = jnp.array([1, 0, 2, 2, 1, 1])
    flags = jnp.array([True, True, False, True, True, True])
    got = dense.scatter_or_2d(rows, cols, flags, 9, 3)
    want = jnp.zeros((9, 3), bool).at[rows, cols].max(flags)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
