"""Structured block-tridiagonal-with-border KKT solver vs dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from opty_tpu.nlp.kkt import (KKTBlocks, kkt_matvec, solve_structured_kkt)

rng = np.random.default_rng(7)


def random_blocks(N, nz, M, bw, o, reg=3.0):
    Hd = rng.normal(size=(N, nz, nz))
    Hd = 0.5 * (Hd + np.swapaxes(Hd, 1, 2)) + reg * np.eye(nz)
    Ho = rng.normal(size=(N, nz, nz)) * 0.3
    Ho[0] = 0.0
    Hw = rng.normal(size=(N, nz, bw)) * 0.3
    Hww = rng.normal(size=(bw, bw))
    Hww = 0.5 * (Hww + Hww.T) + reg * np.eye(bw)
    P = rng.normal(size=(N, M, nz))
    Q = rng.normal(size=(N, M, nz))
    C = rng.normal(size=(N, M, bw)) * 0.5
    P[0] = Q[0] = 0.0
    C[0] = 0.0
    Ds = np.abs(rng.normal(size=(N, M))) * 0.1
    Ds[0] = 1.0
    Gz = rng.normal(size=(o, N, nz)) * (rng.random((o, N, nz)) < 0.05)
    Gw = rng.normal(size=(o, bw))
    Di = np.abs(rng.normal(size=(o,))) * 0.01
    return KKTBlocks(*[jnp.asarray(a) for a in
                       (Hd, Ho, Hw, Hww, P, Q, C, Ds, Gz, Gw, Di)])


def dense_kkt(blocks):
    """Assemble the full symmetric KKT matrix for the oracle."""
    N, nz, _ = blocks.Hd.shape
    M = blocks.P.shape[1]
    bw = blocks.Hw.shape[2]
    o = blocks.Gz.shape[0]
    d = nz + M
    size = N * d + bw + o
    K = np.zeros((size, size))
    Hd, Ho, Hw, Hww, P, Q, C, Ds, Gz, Gw, Di = [np.asarray(a)
                                                for a in blocks]

    def zi(k):
        return slice(k * d, k * d + nz)

    def yi(k):
        return slice(k * d + nz, (k + 1) * d)

    wsl = slice(N * d, N * d + bw)
    isl = slice(N * d + bw, size)
    for k in range(N):
        K[zi(k), zi(k)] += Hd[k]
        K[yi(k), zi(k)] += P[k]
        K[zi(k), yi(k)] += P[k].T
        K[yi(k), yi(k)] += -np.diag(Ds[k])
        if k >= 1:
            K[zi(k - 1), zi(k)] += Ho[k]
            K[zi(k), zi(k - 1)] += Ho[k].T
            K[yi(k), zi(k - 1)] += Q[k]
            K[zi(k - 1), yi(k)] += Q[k].T
        K[zi(k), wsl] += Hw[k]
        K[wsl, zi(k)] += Hw[k].T
        K[yi(k), wsl] += C[k]
        K[wsl, yi(k)] += C[k].T
        if o:
            K[isl, zi(k)] += Gz[:, k, :]
            K[zi(k), isl] += Gz[:, k, :].T
    K[wsl, wsl] += Hww
    if o:
        K[isl, wsl] += Gw
        K[wsl, isl] += Gw.T
        K[isl, isl] += -np.diag(Di)
    return K


def check_case(N, nz, M, bw, o):
    blocks = random_blocks(N, nz, M, bw, o)
    d = nz + M
    r_nodes = jnp.asarray(rng.normal(size=(N, d)))
    r_border = jnp.asarray(rng.normal(size=(bw + o,)))

    K = dense_kkt(blocks)
    rhs = np.concatenate([np.asarray(r_nodes).ravel(),
                          np.asarray(r_border)])
    expected = np.linalg.solve(K, rhs)

    u, beta = solve_structured_kkt(blocks, r_nodes, r_border)
    got = np.concatenate([np.asarray(u).ravel(), np.asarray(beta)])
    np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-8)

    # matvec consistency
    Ku, Kb = kkt_matvec(blocks, u, beta)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(Ku).ravel(), np.asarray(Kb)]),
        rhs, rtol=1e-8, atol=1e-8)


def test_with_border_and_instances():
    check_case(N=9, nz=3, M=2, bw=2, o=3)


def test_no_border():
    check_case(N=7, nz=2, M=2, bw=0, o=0)


def test_border_no_instances():
    check_case(N=6, nz=4, M=3, bw=1, o=0)


def test_f32_factor_with_refinement():
    blocks = random_blocks(8, 3, 2, 2, 1)
    d = 5
    r_nodes = jnp.asarray(rng.normal(size=(8, d)))
    r_border = jnp.asarray(rng.normal(size=(3,)))
    K = dense_kkt(blocks)
    rhs = np.concatenate([np.asarray(r_nodes).ravel(),
                          np.asarray(r_border)])
    expected = np.linalg.solve(K, rhs)
    u, beta = solve_structured_kkt(blocks, r_nodes, r_border,
                                   factor_dtype=jnp.float32,
                                   refine_steps=3)
    got = np.concatenate([np.asarray(u).ravel(), np.asarray(beta)])
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_vmap_batch():
    def solve(seedshift):
        blocks = random_blocks(6, 2, 2, 1, 1)
        # perturb diagonal per batch element
        blocks = blocks._replace(
            Hd=blocks.Hd + seedshift * jnp.eye(2)[None])
        r_nodes = jnp.ones((6, 4))
        r_border = jnp.ones((2,))
        return solve_structured_kkt(blocks, r_nodes, r_border)

    shifts = jnp.array([0.0, 1.0, 2.0])
    u, beta = jax.vmap(solve)(shifts)
    assert u.shape == (3, 6, 4)
    assert np.all(np.isfinite(np.asarray(u)))


def test_cyclic_reduction_matches_dense():
    for (N, nz, M, bw, o) in [(9, 3, 2, 2, 3), (16, 2, 2, 0, 0),
                              (7, 4, 3, 1, 0)]:
        blocks = random_blocks(N, nz, M, bw, o)
        d = nz + M
        r_nodes = jnp.asarray(rng.normal(size=(N, d)))
        r_border = jnp.asarray(rng.normal(size=(bw + o,)))
        K = dense_kkt(blocks)
        rhs = np.concatenate([np.asarray(r_nodes).ravel(),
                              np.asarray(r_border)])
        expected = np.linalg.solve(K, rhs)
        u, beta = solve_structured_kkt(blocks, r_nodes, r_border,
                                       method='cr')
        got = np.concatenate([np.asarray(u).ravel(), np.asarray(beta)])
        np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-7)


def test_cyclic_reduction_f32_refined():
    blocks = random_blocks(33, 3, 2, 2, 1)
    r_nodes = jnp.asarray(rng.normal(size=(33, 5)))
    r_border = jnp.asarray(rng.normal(size=(3,)))
    K = dense_kkt(blocks)
    rhs = np.concatenate([np.asarray(r_nodes).ravel(),
                          np.asarray(r_border)])
    expected = np.linalg.solve(K, rhs)
    u, beta = solve_structured_kkt(blocks, r_nodes, r_border,
                                   factor_dtype=jnp.float32,
                                   refine_steps=3, method='cr')
    got = np.concatenate([np.asarray(u).ravel(), np.asarray(beta)])
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)
