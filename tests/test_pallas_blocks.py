"""Pallas batched small-block kernels vs the pure-jnp oracle
(interpret mode on CPU; the same code runs natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opty_tpu.ops.smallblock import block_inv
from opty_tpu.ops.pallas_blocks import (block_inv_pallas,
                                        block_matmul_pallas,
                                        has_pallas_support)

pytestmark = pytest.mark.skipif(not has_pallas_support(),
                                reason='pallas not available')

INTERP = jax.default_backend() == 'cpu'


@pytest.mark.parametrize('B,d', [(7, 4), (128, 10), (300, 5)])
def test_matches_oracle(B, d):
    rng = np.random.default_rng(B + d)
    A = jnp.asarray(rng.normal(size=(B, d, d)) + 3.0 * np.eye(d),
                    jnp.float32)
    got = block_inv_pallas(A, interpret=INTERP)
    want = block_inv(A)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pivoting_handles_zero_leading_pivot():
    A = np.array([[[0.0, 1.0], [1.0, 0.0]],
                  [[2.0, 1.0], [1.0, 2.0]]], dtype=np.float32)
    got = block_inv_pallas(jnp.asarray(A), interpret=INTERP)
    want = np.linalg.inv(A)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-6)


def test_multi_batch_dims():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(3, 11, 6, 6)) + 4.0 * np.eye(6),
                    jnp.float32)
    got = block_inv_pallas(A, interpret=INTERP)
    want = block_inv(A)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('B,d', [(5, 3), (128, 7), (200, 5)])
def test_matmul_matches_oracle(B, d):
    rng = np.random.default_rng(10 * B + d)
    A = jnp.asarray(rng.normal(size=(B, d, d)), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(B, d, d)), jnp.float32)
    got = block_matmul_pallas(A, Bm, interpret=INTERP)
    want = jnp.einsum('bij,bjk->bik', A, Bm,
                      precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_matmul_multi_batch_dims():
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.normal(size=(2, 9, 4, 4)), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(2, 9, 4, 4)), jnp.float32)
    got = block_matmul_pallas(A, Bm, interpret=INTERP)
    want = jnp.einsum('cbij,cbjk->cbik', A, Bm,
                      precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
