"""Lane-major (node-axis-last) block linear algebra vs numpy oracles.

ops/lanes.py is the layout-critical core of the TPU factorization
path (ops/tridiag.py PCR); these tests pin its semantics against
dense numpy on CPU so the TPU runs inherit verified kernels.
"""

import numpy as np
import jax.numpy as jnp

from opty_tpu.ops.lanes import (block_inv_nl, from_lanes, matmul_nl,
                                matvec_nl, to_lanes, transpose_nl)


def test_roundtrip_and_transpose():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((7, 4, 3))
    Al = to_lanes(jnp.asarray(A))
    assert Al.shape == (4, 3, 7)
    np.testing.assert_array_equal(np.asarray(from_lanes(Al)), A)
    At = transpose_nl(Al)
    np.testing.assert_array_equal(np.asarray(from_lanes(At)),
                                  A.transpose(0, 2, 1))


def test_matmul_nl_matches_einsum():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((5, 4, 33))
    B = rng.standard_normal((4, 6, 33))
    C = np.asarray(matmul_nl(jnp.asarray(A), jnp.asarray(B)))
    C_ref = np.einsum('ijn,jkn->ikn', A, B)
    np.testing.assert_allclose(C, C_ref, rtol=1e-12, atol=1e-12)


def test_matvec_nl_matches_einsum():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((5, 4, 17))
    v = rng.standard_normal((4, 17))
    out = np.asarray(matvec_nl(jnp.asarray(A), jnp.asarray(v)))
    np.testing.assert_allclose(out, np.einsum('ijn,jn->in', A, v),
                               rtol=1e-12, atol=1e-12)


def test_block_inv_nl_random():
    rng = np.random.default_rng(3)
    d, N = 6, 41
    A = rng.standard_normal((d, d, N)) + 3.0 * np.eye(d)[:, :, None]
    X = np.asarray(block_inv_nl(jnp.asarray(A)))
    for k in range(N):
        np.testing.assert_allclose(X[:, :, k] @ A[:, :, k], np.eye(d),
                                   atol=1e-10)


def test_block_inv_nl_needs_pivoting():
    # leading-principal-minor-singular matrix: fails without row swaps
    A = np.array([[0.0, 1.0], [1.0, 0.0]])[:, :, None]
    A = np.concatenate([A, np.array([[1e-14, 1.0],
                                     [1.0, 1.0]])[:, :, None]], axis=-1)
    X = np.asarray(block_inv_nl(jnp.asarray(A)))
    for k in range(A.shape[-1]):
        np.testing.assert_allclose(X[:, :, k] @ A[:, :, k], np.eye(2),
                                   atol=1e-9)


def test_block_inv_nl_batched_leading_axes():
    rng = np.random.default_rng(4)
    A = rng.standard_normal((2, 3, 4, 4, 9)) \
        + 4.0 * np.eye(4)[:, :, None]
    X = np.asarray(block_inv_nl(jnp.asarray(A)))
    prod = np.einsum('bcijn,bcjkn->bcikn', X, A)
    eye = np.broadcast_to(np.eye(4)[:, :, None], (2, 3, 4, 4, 9))
    np.testing.assert_allclose(prod, eye, atol=1e-10)
