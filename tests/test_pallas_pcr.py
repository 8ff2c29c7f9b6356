"""Fused Pallas PCR kernels vs the pure-jnp oracle (interpret mode on
CPU; the same code runs natively on TPU, where ops/tridiag.py
dispatches to it automatically — see fused_supported)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opty_tpu.ops import pallas_pcr, tridiag
from opty_tpu.ops.pallas_blocks import has_pallas_support

pytestmark = pytest.mark.skipif(not has_pallas_support(),
                                reason='pallas not available')


@pytest.fixture(autouse=True)
def _interpret_mode():
    """Run the kernels through the Pallas interpreter off-TPU."""
    prev = pallas_pcr._INTERPRET
    pallas_pcr._INTERPRET = jax.default_backend() == 'cpu'
    yield
    pallas_pcr._INTERPRET = prev


def _random_system(B, d, b, N, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((B, d, d, N)) + 4.0 * np.eye(d)[:, :, None]
    E = rng.standard_normal((B, d, d, N))
    E[..., 0] = 0.0
    F = 0.1 * rng.standard_normal((B, d, b, N))
    Kbb = rng.standard_normal((B, b, b)) + 5.0 * np.eye(b)
    r = rng.standard_normal((B, d, N))
    rb = rng.standard_normal((B, b))
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return f32(D), f32(E), f32(F), f32(Kbb), f32(r), f32(rb)


def _relerr(a, want):
    a = np.asarray(a, np.float64)
    want = np.asarray(want, np.float64)
    return np.max(np.abs(a - want)) / max(1e-30, np.max(np.abs(want)))


@pytest.mark.parametrize('d,b,N', [(3, 0, 40), (5, 4, 200)])
def test_factor_matches_jnp_oracle(d, b, N):
    D, E, F, Kbb, _, _ = _random_system(1, d, max(b, 1), N)
    F = F[:, :, :b, :]
    fac = tridiag.pcr_factor(D[0], E[0], F[0],
                             jnp.eye(b, dtype=jnp.float32))
    A, B, Dinv, Fp, Z = pallas_pcr.pcr_factor_fused(D[0], E[0], F[0])
    # level 0 is exact f32 algebra; later levels accumulate f32
    # roundoff differently through XLA fusion choices, so compare the
    # early levels tightly and the final state loosely
    assert _relerr(A[0][..., :N], fac.A[0]) < 1e-5
    assert _relerr(B[0][..., :N], fac.B[0]) < 1e-5
    assert _relerr(Dinv[..., :N], fac.Dinv) < 5e-2
    if b:
        assert _relerr(Fp[..., :N], fac.Fp) < 5e-2
        assert _relerr(Z[..., :N], fac.Z) < 5e-2


def test_vmap_is_bitwise_single():
    """The grouped vmap rule must produce the single-call results —
    grouping is a layout decision, not a numeric one.  Bitwise in
    interpret mode; on real TPU different block shapes may compile to
    differently-ordered vector ops, so a tight relative tolerance is
    the guaranteed contract there."""
    atol = 0.0 if pallas_pcr._INTERPRET else 1e-6
    B, d, b, N = 5, 5, 4, 200   # B=5 exercises group padding
    D, E, F, _, r, _ = _random_system(B, d, b, N)
    Av, Bv, Div, Fpv, Zv = jax.vmap(pallas_pcr.pcr_factor_fused)(D, E, F)
    for i in (0, 4):
        A1, B1, Di1, Fp1, Z1 = pallas_pcr.pcr_factor_fused(D[i], E[i],
                                                           F[i])
        assert _relerr(Av[i], A1) <= atol
        assert _relerr(Div[i], Di1) <= atol
        assert _relerr(Zv[i], Z1) <= atol

    Np = Div.shape[-1]
    rp = jnp.concatenate([r, jnp.zeros((B, d, Np - N), jnp.float32)], -1)
    sv = jax.vmap(pallas_pcr.pcr_downsweep_fused)(Av, Bv, rp)
    s0 = pallas_pcr.pcr_downsweep_fused(Av[0], Bv[0], rp[0])
    assert _relerr(sv[0], s0) <= atol


def test_downsweep_matches_jnp():
    d, b, N = 5, 4, 200
    D, E, F, Kbb, r, _ = _random_system(1, d, b, N, seed=3)
    fac = tridiag.pcr_factor(D[0], E[0], F[0], Kbb[0])
    A, B, Dinv, Fp, Z = pallas_pcr.pcr_factor_fused(D[0], E[0], F[0])
    Np = Dinv.shape[-1]
    rp = jnp.concatenate([r[0], jnp.zeros((d, Np - N), jnp.float32)], -1)
    got = pallas_pcr.pcr_downsweep_fused(A, B, rp)

    rs, s = r[0], 1
    for l in range(fac.A.shape[0]):
        rs = (rs - tridiag.matvec_nl(fac.A[l], tridiag._down(rs, s))
              - tridiag.matvec_nl(fac.B[l], tridiag._up(rs, s)))
        s *= 2
    assert _relerr(got[..., :N], rs) < 5e-2
    assert np.all(np.asarray(got[..., N:]) == 0.0)


def test_padded_solve_roundtrip():
    """pcr_solve must accept a lane-padded factorization and return
    the unpadded solution: verified against the dense system in f64
    on a well-conditioned (diagonally dominant) chain."""
    d, b, N = 4, 3, 75
    rng = np.random.default_rng(7)
    D = rng.standard_normal((d, d, N)) * 0.1 + 6.0 * np.eye(d)[:, :, None]
    E = 0.3 * rng.standard_normal((d, d, N))
    E[..., 0] = 0.0
    F = 0.1 * rng.standard_normal((d, b, N))
    Kbb = rng.standard_normal((b, b)) + 6.0 * np.eye(b)
    r = rng.standard_normal((d, N))
    rb = rng.standard_normal((b,))
    f32 = lambda x: jnp.asarray(x, jnp.float32)

    A, B, Dinv, Fp, Z = pallas_pcr.pcr_factor_fused(f32(D), f32(E),
                                                    f32(F))
    schur = f32(Kbb) - jnp.einsum('dbn,den->be', Z, Fp)
    fac = tridiag.PCRFactorization(
        A=A, B=B, Dinv=Dinv, Fp=Fp, Z=Z,
        schur_inv=tridiag._small_inv(schur))
    u, beta = tridiag.pcr_solve(fac, f32(r), f32(rb))
    assert u.shape == (d, N)

    # dense oracle
    n_tot = d * N + b
    K = np.zeros((n_tot, n_tot))
    for k in range(N):
        K[k*d:(k+1)*d, k*d:(k+1)*d] = D[:, :, k]
        if k > 0:
            K[k*d:(k+1)*d, (k-1)*d:k*d] = E[:, :, k]
            K[(k-1)*d:k*d, k*d:(k+1)*d] = E[:, :, k].T
        K[k*d:(k+1)*d, d*N:] = F[:, :, k]
        K[d*N:, k*d:(k+1)*d] = F[:, :, k].T
    K[d*N:, d*N:] = Kbb
    sol = np.linalg.solve(K, np.concatenate([r.T.reshape(-1), rb]))
    u_ref = sol[:d*N].reshape(N, d).T
    assert _relerr(u, u_ref) < 2e-3
    assert _relerr(beta, sol[d*N:]) < 2e-3


def test_fused_supported_gates():
    assert not pallas_pcr.fused_supported(5, 4, 501, backend='cpu')
    # the kernels are TPU-only (pltpu.roll, pltpu.VMEM): any non-TPU
    # backend — not just cpu — must fall back to the jnp path
    assert not pallas_pcr.fused_supported(5, 4, 501, backend='gpu')
    # Mosaic cannot lower f64 (factor_dtype='float64' runs jnp instead)
    assert not pallas_pcr.fused_supported(5, 4, 501, backend='tpu',
                                          dtype=jnp.float64)
    assert pallas_pcr.fused_supported(5, 4, 501, backend='tpu',
                                      dtype=jnp.float32)
    # gait-scale blocks blow the VMEM budget -> jnp fallback
    assert not pallas_pcr.fused_supported(50, 40, 4096, backend='tpu')
    assert pallas_pcr.fused_supported(5, 4, 501, backend='tpu')


def test_forced_group_is_clamped(monkeypatch):
    """OPTY_TPU_PCR_GROUP is validated: non-power-of-two values round
    down, oversized values clamp to the VMEM-fitting group."""
    monkeypatch.setenv('OPTY_TPU_PCR_GROUP', '6')
    g = pallas_pcr._pick_group(8, 5, 4, 501, pallas_pcr._factor_vmem)
    assert g >= 1 and (g & (g - 1)) == 0 and g <= 4
    assert pallas_pcr._factor_vmem(5, 4, 501, g) <= pallas_pcr._VMEM_CEILING
    monkeypatch.setenv('OPTY_TPU_PCR_GROUP', '4096')
    g = pallas_pcr._pick_group(8, 5, 4, 501, pallas_pcr._factor_vmem)
    assert g >= 1 and (g & (g - 1)) == 0
    assert pallas_pcr._factor_vmem(5, 4, 501, g) <= pallas_pcr._VMEM_CEILING
