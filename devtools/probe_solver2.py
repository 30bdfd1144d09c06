"""Isolate efc-assembly vs Newton-iteration vs line-search costs on TPU.

Times forward_batched variants with modified solver budgets by monkeypatching
solver internals.  Run: python -u devtools/probe_solver2.py [B]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import constraint as constraint_mod
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import solver as solver_mod
from gym_so100_tpu.parallel.batch import BatchedEnv

XML = "/root/repo/gym_so100_tpu/assets/so100_transfer_cube.xml"
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
dt = jnp.float32


def timed(name, fn, *args, n=5):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:9.1f} ms", flush=True)


def main():
    m, _ = build_model(XML, max_contacts=24)
    m = m.astype(dt)
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=False)
    mnh = env.m
    key = jax.random.PRNGKey(0)
    es = env.reset(key)
    acts = jax.random.uniform(key, (B, 6), dt, -1, 1)
    for _ in range(4):
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    s = es.physics

    # smooth+collide+efc, no solve
    def _efc(s):
        d = jax.vmap(lambda s1: fwd.smooth.forward_smooth(mnh, s1))(s)
        con = fwd.narrowphase.collide_batched(mnh, d)
        d = d.replace(contact=con)
        efc = jax.vmap(lambda d1, s1, c1: constraint_mod.make_efc(mnh, d1, s1, c1))(
            d, s, con
        )
        return efc.aref

    timed("smooth+collide+efc (no solve)", jax.jit(_efc), s)

    def make_full(iters, lslen, brack):
        orig_solve = solver_mod.solve

        def solve_patched(m_, d_, efc_, warm=None):
            import gym_so100_tpu.ops.solver as S

            old = (S_MAXIT[0], S_LS[0], S_BR[0])
            S_MAXIT[0], S_LS[0], S_BR[0] = iters, lslen, brack
            try:
                return orig_solve(m_, d_, efc_, warm)
            finally:
                S_MAXIT[0], S_LS[0], S_BR[0] = old

        def _full(s):
            d = jax.vmap(lambda s1: fwd.smooth.forward_smooth(mnh, s1))(s)
            con = fwd.narrowphase.collide_batched(mnh, d)
            d = d.replace(contact=con)

            def tail(d1, s1, c1):
                efc = constraint_mod.make_efc(mnh, d1, s1, c1)
                qacc, *_ = solve_patched(mnh, d1, efc, s1.qacc_warmstart)
                return qacc

            return jax.vmap(tail)(d, s, con)

        return jax.jit(_full)

    # knobs live in solver module globals (see solver.py overrides)
    global S_MAXIT, S_LS, S_BR
    S_MAXIT = solver_mod._OVR_MAXIT
    S_LS = solver_mod._OVR_LS
    S_BR = solver_mod._OVR_BRACKET

    for iters, lslen, brack in [
        (20, 13, 8),   # current defaults
        (10, 13, 8),   # halve Newton iters
        (20, 6, 4),    # cheap line search
        (10, 6, 4),
        (5, 3, 2),     # floor
    ]:
        timed(
            f"forward it={iters} ls={lslen} br={brack}",
            make_full(iters, lslen, brack), s,
        )


if __name__ == "__main__":
    main()
