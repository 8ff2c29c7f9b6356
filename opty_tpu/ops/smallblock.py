"""Batched small-matrix inversion in pure jnp arithmetic.

``jnp.linalg.inv``/``solve`` lower to backend linear-algebra custom
calls: on TPU these exist only for float32 and (empirically) with
numerics that stall the IPM around 1e-5 primal infeasibility.  The KKT
factorizations instead use this pure-jnp routine:

  * Gaussian elimination with partial pivoting (forward elimination
    applied to [A | I], eliminating below the pivot only) followed by
    triangular back-substitution — the classical LU-based inversion,
    which has markedly better error growth than full Gauss-Jordan
    elimination (a GJ variant measurably stalled the variable-duration
    pendulum benchmark that this version solves);
  * plain jnp arithmetic runs in any dtype on any backend — including
    TPU's *emulated* float64 (the float-float path covers +, *, / but
    not LAPACK custom calls), so factorization precision matches CPU;
  * the block size d is static and small (n + q + M per collocation
    node), so the unrolled elimination is cheap and fully batched over
    nodes and vmapped problem instances.
"""

import jax.numpy as jnp

__all__ = ['block_inv']


def block_inv(A):
    """Inverse of a batch of small matrices, shape (..., d, d).

    Singular inputs produce inf/nan entries (callers detect non-finite
    directions and regularize, mirroring how LU factorizations surface
    singularity).
    """
    d = A.shape[-1]
    batch = A.shape[:-2]
    rows = jnp.arange(d)
    M = A
    R = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), batch + (d, d))

    # On TPU the row swap must avoid dynamic gathers (take_along_axis
    # inside vmapped f64-emulated programs faults the TPU runtime): row
    # p is extracted through a one-hot masked sum and rows are SELECTED
    # (an exact permutation for finite inputs; the earlier additive
    # form A + e_k(row_p - row_k) + ... lost eps*|large/small| relative
    # accuracy and stalled float32 factorizations).  On CPU the gather
    # form is kept: for *non-finite* rows (near-singular blocks inside
    # IPM regularization probes) the masked sum turns 0*inf into nan
    # where the gather keeps the clean row, and the nonconvex
    # benchmark paths are sensitive to exactly those probes.
    from ..config import on_tpu
    use_onehot = on_tpu()

    for k in range(d):
        col = jnp.abs(M[..., :, k])
        col = jnp.where(rows >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)

        if use_onehot:
            oh_p = (rows == p[..., None])[..., :, None]  # (..., d, 1)
            oh_k = (rows == k)[..., :, None]

            def swap(A):
                row_p = jnp.sum(A * oh_p, axis=-2, keepdims=True)
                row_k = A[..., k:k + 1, :]
                return jnp.where(oh_k, row_p, jnp.where(oh_p, row_k, A))
        else:
            pk = p[..., None]
            perm = jnp.where(rows == k, pk,
                             jnp.where(rows == pk, k, rows))

            def swap(A):
                return jnp.take_along_axis(A, perm[..., :, None], axis=-2)

        M = swap(M)
        R = swap(R)

        below = (rows > k)[..., :, None]
        f = jnp.where(below, M[..., :, k:k + 1] / M[..., k:k + 1, k:k + 1],
                      0.0)
        M = M - f * M[..., k:k + 1, :]
        R = R - f * R[..., k:k + 1, :]

    # back substitution: solve U X = R with U = M upper triangular
    X = jnp.zeros_like(R)
    for k in reversed(range(d)):
        rhs = R[..., k:k + 1, :] - M[..., k:k + 1, :] @ X
        xk = rhs / M[..., k:k + 1, k:k + 1]
        X = jnp.where((rows == k)[..., :, None], xk, X)
    return X
