"""Layout experiment: vmap-AoS (B, 3)/(B, 3, 3) vs SoA batch-last (3, B)/(3, 3, B).

Hypothesis (PERF_NOTES round 1): the vmap layout tile-pads minor dims of 3 to
(8, 128) — 42-113x wasted lanes — and that, not FLOPs, dominates the batched
physics step.  This probe times the same chained computation (quaternion
rotate + 3x3 matmul + cross products, chained N times so it is compute- not
launch-bound) in both layouts, plus a 12x12 Cholesky solve comparison
(jnp.linalg.cholesky under vmap vs unrolled scalar SoA).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B = 4096
N = 50  # chain length
dt = jnp.float32


def timed(name, fn, *args, n=5):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt_s = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt_s*1000:10.2f} ms")
    return dt_s


# ---------------- AoS (vmap) version ----------------
def quat_rotate_aos(q, v):  # q (B,4) v (B,3)
    w, xyz = q[:, :1], q[:, 1:]
    t = 2 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def chain_aos(q, v, M):
    def body(carry, _):
        v, M = carry
        v2 = quat_rotate_aos(q, v)
        v3 = jnp.einsum("bij,bj->bi", M, v2)
        M2 = M * 0.999 + 0.001 * jnp.einsum("bi,bj->bij", v3, v2)
        return (v3 * 0.5 + v2 * 0.5, M2), None

    (v, M), _ = jax.lax.scan(body, (v, M), None, length=N)
    return v


# ---------------- SoA (batch-last) version ----------------
def cross_soa(a, b):  # (3, B)
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def quat_rotate_soa(q, v):  # q (4,B) v (3,B)
    w, xyz = q[0], q[1:]
    t = 2 * cross_soa(xyz, v)
    return v + w[None] * t + cross_soa(xyz, t)


def chain_soa(q, v, M):  # M (3,3,B)
    def body(carry, _):
        v, M = carry
        v2 = quat_rotate_soa(q, v)
        v3 = jnp.stack([
            M[i, 0] * v2[0] + M[i, 1] * v2[1] + M[i, 2] * v2[2] for i in range(3)
        ])
        M2 = M * 0.999 + 0.001 * v3[:, None, :] * v2[None, :, :]
        return (v3 * 0.5 + v2 * 0.5, M2), None

    (v, M), _ = jax.lax.scan(body, (v, M), None, length=N)
    return v


# ---------------- Cholesky comparison (nv=12) ----------------
NV = 12


def chol_aos(A, b):  # A (B, nv, nv) SPD, b (B, nv)
    def one(A, b):
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    def body(carry, _):
        x = jax.vmap(one)(A, carry)
        return x / jnp.maximum(jnp.max(jnp.abs(x)), 1.0), None

    x, _ = jax.lax.scan(body, b, None, length=10)
    return x


def chol_soa(A, b):  # A (nv, nv, B), b (nv, B)
    def solve_one(A, b):
        L = [[None] * NV for _ in range(NV)]
        for j in range(NV):
            s = A[j][j]
            for k in range(j):
                s = s - L[j][k] * L[j][k]
            L[j][j] = jnp.sqrt(s)
            inv = 1.0 / L[j][j]
            for i in range(j + 1, NV):
                s = A[i][j]
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                L[i][j] = s * inv
        # forward/back solve
        y = [None] * NV
        for i in range(NV):
            s = b[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * NV
        for i in reversed(range(NV)):
            s = y[i]
            for k in range(i + 1, NV):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return x

    def body(carry, _):
        A_l = [[A[i, j] for j in range(NV)] for i in range(NV)]
        b_l = [carry[i] for i in range(NV)]
        x = solve_one(A_l, b_l)
        x = jnp.stack(x)
        return x / jnp.maximum(jnp.max(jnp.abs(x)), 1.0), None

    x, _ = jax.lax.scan(body, b, None, length=10)
    return x


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (B, 4), dt)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    v = jax.random.normal(k2, (B, 3), dt)
    M = jax.random.normal(k3, (B, 3, 3), dt) * 0.1 + jnp.eye(3, dtype=dt)

    f_aos = jax.jit(chain_aos)
    f_soa = jax.jit(chain_soa)
    t_aos = timed(f"chain AoS vmap-style (B={B}, N={N})", f_aos, q, v, M)
    t_soa = timed(f"chain SoA batch-last (B={B}, N={N})", f_soa, q.T, v.T,
                  jnp.transpose(M, (1, 2, 0)))
    print(f"  -> SoA speedup: {t_aos/t_soa:.1f}x")

    G = jax.random.normal(k4, (B, NV, NV), dt)
    A = jnp.einsum("bij,bkj->bik", G, G) + 10 * jnp.eye(NV, dtype=dt)
    b = jax.random.normal(k1, (B, NV), dt)
    f_ca = jax.jit(chol_aos)
    f_cs = jax.jit(chol_soa)
    t_ca = timed("cholesky 12x12 x10 AoS (jnp.linalg, vmap)", f_ca, A, b)
    t_cs = timed("cholesky 12x12 x10 SoA (unrolled scalar)", f_cs,
                 jnp.transpose(A, (1, 2, 0)), b.T)
    print(f"  -> SoA speedup: {t_ca/t_cs:.1f}x")


if __name__ == "__main__":
    main()
