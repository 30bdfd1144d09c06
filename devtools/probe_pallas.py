"""Probe: per-op overhead hypothesis + Pallas megakernel comparison.

probe_layout.py showed AoS==SoA for elementwise chains at ~16 GFLOP/s
effective — i.e. per-kernel / loop overhead dominates, not layout.  This
probe times the same chained quat/matmul computation:
  (a) lax.scan N=50 (baseline from probe_layout)
  (b) lax.scan N=200 (does cost scale with iterations -> per-iter overhead?)
  (c) fully unrolled N=50 (no scan boundaries -> XLA free to fuse across)
  (d) one Pallas kernel, fori_loop N=50 inside (no XLA kernel boundaries)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 4096
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


def quat_rotate_aos(q, v):
    w, xyz = q[:, :1], q[:, 1:]
    t = 2 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def body_fn(q, v, M):
    v2 = quat_rotate_aos(q, v)
    v3 = jnp.einsum("bij,bj->bi", M, v2)
    M2 = M * 0.999 + 0.001 * jnp.einsum("bi,bj->bij", v3, v2)
    return v3 * 0.5 + v2 * 0.5, M2


def chain_scan(q, v, M, N):
    def body(carry, _):
        v, M = carry
        v, M = body_fn(q, v, M)
        return (v, M), None

    (v, M), _ = jax.lax.scan(body, (v, M), None, length=N)
    return v


def chain_unroll(q, v, M):
    for _ in range(50):
        v, M = body_fn(q, v, M)
    return v


# ---------------- Pallas version ----------------
# Layout: each physics scalar is an (8, 128) f32 tile = 1024 envs per program.
# q: (4, B) -> blocks (4, 8, 128); v: (3, B); M: (9, B).
SUB = 8
LANE = 128
TILE = SUB * LANE  # 1024 envs per grid step


def pallas_kernel(q_ref, v_ref, m_ref, o_ref):
    q = [q_ref[i] for i in range(4)]
    v = [v_ref[i] for i in range(3)]
    M = [[m_ref[3 * i + j] for j in range(3)] for i in range(3)]

    def cross(a, b):
        return [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]

    def body(k, carry):
        v, M = carry
        w, xyz = q[0], q[1:]
        t = cross(xyz, v)
        t = [2.0 * x for x in t]
        ct = cross(xyz, t)
        v2 = [v[i] + w * t[i] + ct[i] for i in range(3)]
        v3 = [M[i][0] * v2[0] + M[i][1] * v2[1] + M[i][2] * v2[2] for i in range(3)]
        M2 = [[M[i][j] * 0.999 + 0.001 * v3[i] * v2[j] for j in range(3)] for i in range(3)]
        vo = [v3[i] * 0.5 + v2[i] * 0.5 for i in range(3)]
        return vo, M2

    # jax.lax.fori_loop with list carries needs tuples; unroll instead (N=50
    # static) — Mosaic compiles straight-line vector code.
    carry = (v, M)
    for k in range(50):
        carry = body(k, carry)
    v, M = carry
    for i in range(3):
        o_ref[i] = v[i]


def chain_pallas(q, v, M):
    # reshape (C, B) -> (C, B//TILE, SUB, LANE), grid over B tiles
    def blk(x):
        C = x.shape[0]
        return x.reshape(C, B // TILE, SUB, LANE)

    out = pl.pallas_call(
        pallas_kernel,
        out_shape=jax.ShapeDtypeStruct((3, B // TILE, SUB, LANE), dt),
        grid=(B // TILE,),
        in_specs=[
            pl.BlockSpec((4, 1, SUB, LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, SUB, LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 1, SUB, LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 1, SUB, LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
    )(blk(q), blk(v), blk(M))
    return out


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, 4), dt)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    v = jax.random.normal(k2, (B, 3), dt)
    M = jax.random.normal(k3, (B, 3, 3), dt) * 0.1 + jnp.eye(3, dtype=dt)

    t50 = timed("scan N=50 AoS", jax.jit(lambda q, v, M: chain_scan(q, v, M, 50)), q, v, M)
    t200 = timed("scan N=200 AoS", jax.jit(lambda q, v, M: chain_scan(q, v, M, 200)), q, v, M)
    print(f"  -> per-extra-iter cost: {(t200-t50)/150*1e6:.1f} us")
    tun = timed("unrolled N=50 AoS", jax.jit(chain_unroll), q, v, M)
    print(f"  -> unroll speedup vs scan: {t50/tun:.1f}x")

    qT = q.T.copy()
    vT = v.T.copy()
    MT = M.reshape(B, 9).T.copy()
    tp = timed("pallas megakernel N=50 (unrolled inside)", jax.jit(chain_pallas), qT, vT, MT)
    print(f"  -> pallas speedup vs scan: {t50/tp:.1f}x, vs unrolled: {tun/tp:.1f}x")


if __name__ == "__main__":
    main()
