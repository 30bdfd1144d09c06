"""Unrolled small-matrix linear algebra for the TPU hot path.

XLA's library `cholesky`/`triangular_solve` on tiny batched operands (the
nv=12 mass/Hessian systems of this scene) lower to column-loop kernels that
cost ~6 ms per call at B=4096 on the target runtime — measured 8x slower
than fully unrolled scalar arithmetic, which fuses into the surrounding
elementwise program (devtools/probe_layout.py).  These helpers unroll the
factorization at trace time over the static size n and keep every
intermediate a (batch,)-shaped scalar, so the whole solve becomes straight
-line VPU code under jit/vmap.

Replaces the role of mj_factorM / mj_solveM in the reference's MuJoCo step
(/root/reference/gym_so100/env.py step -> mj_step -> mj_solveM).
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_factor(A, eps=0.0):
    """Cholesky factor of SPD A (..., n, n) -> lower L (..., n, n), unrolled.

    `eps` adds a diagonal regularizer.  Diagonal pivots are clamped to a tiny
    positive floor so a (masked-out / degenerate) system cannot produce NaN
    that would poison downstream masked arithmetic.
    """
    n = A.shape[-1]
    a = [[A[..., i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    tiny = jnp.asarray(jnp.finfo(A.dtype).tiny ** 0.5, A.dtype)
    for j in range(n):
        s = a[j][j] + eps
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, tiny))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    zero = jnp.zeros_like(a[0][0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def chol_solve(L, b):
    """Solve (L L^T) x = b with L lower-triangular (..., n, n), b (..., n)."""
    n = L.shape[-1]
    Ls = [[L[..., i, j] for j in range(i + 1)] for i in range(n)]
    bs = [b[..., i] for i in range(n)]
    y = [None] * n
    for i in range(n):
        s = bs[i]
        for k in range(i):
            s = s - Ls[i][k] * y[k]
        y[i] = s / Ls[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - Ls[k][i] * x[k]
        x[i] = s / Ls[i][i]
    return jnp.stack(x, axis=-1)


_UNROLL_MAX = 16


def matvec(A, x):
    """(..., m, n) @ (..., n) -> (..., m) without batched-GEMV lowering.

    Batched tiny GEMVs pad to MXU tiles on TPU.  Instead, unroll the
    contraction when it is small (n FMAs on (..., m) slices); for long
    contractions use broadcast-multiply + reduction, which lowers to
    elementwise + sublane reduce.
    """
    n = A.shape[-1]
    if n == 0:
        return jnp.zeros(A.shape[:-1], A.dtype)
    if n <= _UNROLL_MAX:
        s = A[..., :, 0] * x[..., 0:1]
        for j in range(1, n):
            s = s + A[..., :, j] * x[..., j : j + 1]
        return s
    return jnp.sum(A * x[..., None, :], axis=-1)


def matvec_t(A, x):
    """A^T @ x for A (..., m, n), x (..., m) -> (..., n)."""
    m = A.shape[-2]
    if m == 0:
        return jnp.zeros(A.shape[:-2] + A.shape[-1:], A.dtype)
    if m <= _UNROLL_MAX:
        s = A[..., 0, :] * x[..., 0:1]
        for i in range(1, m):
            s = s + A[..., i, :] * x[..., i : i + 1]
        return s
    return jnp.sum(A * x[..., :, None], axis=-2)


def dot(a, b):
    """(..., n) . (..., n) -> (...,) unrolled."""
    n = a.shape[-1]
    s = a[..., 0] * b[..., 0]
    for i in range(1, n):
        s = s + a[..., i] * b[..., i]
    return s
