"""Isolated per-stage timings at B=4096 hulls-on (r3).

Unlike probe_stages_r2 (jitted prefixes, which attribute scheduling
interactions to the marginal stage), each stage here runs ALONE in a
10-iteration scan with a data dependence threaded through the carry so XLA
cannot hoist the stage out of the loop.  Compare against the prefix numbers
to see how much is intrinsic stage cost vs cross-stage scheduling.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.models.scene import Data
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth_lanes, constraint_lanes, solver_lanes
from gym_so100_tpu.ops.collision import narrowphase
from gym_so100_tpu.parallel.batch import BatchedEnv

XML = "/root/repo/gym_so100_tpu/assets/so100_transfer_cube.xml"
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def main():
    m, _ = build_model(XML, max_contacts=16)
    m = m.astype(jnp.float32)
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=True)
    mm = env.m
    es = env.reset(jax.random.PRNGKey(0))
    acts = jax.random.uniform(jax.random.PRNGKey(0), (B, 6), jnp.float32, -1, 1)
    for _ in range(3):
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    s = es.physics

    # fixed-point inputs for the isolated stages
    sl = jax.jit(lambda s: smooth_lanes.forward_smooth_lanes(mm, s))(s)
    qM_lanes = sl.pop("qM_lanes")
    sl.pop("qL", None)
    d = Data(
        geom_xpos=sl["geom_xpos"], geom_xmat=sl["geom_xmat"],
        site_xpos=sl["site_xpos"], site_xmat=sl["site_xmat"],
        subtree_com=sl["subtree_com0"][:, None, :], cdof=sl["cdof"],
        qM=sl["qM"], qacc_smooth=sl["qacc_smooth"],
        qfrc_actuator=sl["qfrc_actuator"], qfrc_passive=sl["qfrc_passive"],
        qfrc_bias=sl["qfrc_bias"], qfrc_smooth=sl["qfrc_smooth"],
    )
    con = jax.jit(lambda d: narrowphase.collide_batched(mm, d))(d)
    dc = d.replace(contact=con)
    efc = jax.jit(
        lambda d, s, con: constraint_lanes.make_efc_lanes(mm, d, s, con)
    )(dc, s, con)
    jax.block_until_ready(efc.aref)

    # 1. smooth: evolve qvel slightly
    def st_smooth(s1, z):
        sl = smooth_lanes.forward_smooth_lanes(mm, s1)
        z2 = jnp.sum(sl["qacc_smooth"]) * 1e-30
        return s1.replace(qvel=s1.qvel + z2), z + z2

    def run(name, stage, x0):
        def g(c):
            def body(carry, _):
                return stage(*carry), None
            out, _ = jax.lax.scan(body, c, None, length=10)
            return out
        gj = jax.jit(g)
        c0 = (x0, jnp.float32(0))
        t0 = time.perf_counter()
        out = gj(c0)
        float(out[1])
        ct = time.perf_counter() - t0
        N = 5
        t0 = time.perf_counter()
        for _ in range(N):
            out = gj(out)
        float(out[1])
        dt = (time.perf_counter() - t0) / N
        print(f"{name:12s}: {dt*1000:8.1f} ms/10x  [compile {ct:.0f}s]",
              flush=True)

    run("smooth", st_smooth, s)

    # 2. collide: perturb geom positions by carry
    def st_collide(d1, z):
        con = narrowphase.collide_batched(mm, d1)
        z2 = jnp.sum(con.dist) * 1e-30
        return d1.replace(geom_xpos=d1.geom_xpos + z2), z + z2

    run("collide", st_collide, d)

    # 3. efc: perturb qvel
    def st_efc(args, z):
        dc, s1 = args
        efc = constraint_lanes.make_efc_lanes(mm, dc, s1, dc.contact)
        z2 = (jnp.sum(efc.aref) + sum(jnp.sum(Jv) for Jv in efc.J)) * 1e-30
        return (dc, s1.replace(qvel=s1.qvel + z2)), z + z2

    run("efc", st_efc, (dc, s))

    # 4. solve: perturb warmstart
    warm = s.qacc_warmstart

    def st_solve(args, z):
        efc1, w = args
        qacc, qfrc, niter = solver_lanes.solve_lanes(
            mm, qM_lanes, d.qacc_smooth, efc1, w
        )
        z2 = jnp.sum(qacc) * 1e-30
        return (efc1, w + z2), z + z2

    run("solve", st_solve, (efc, warm))


if __name__ == "__main__":
    main()
