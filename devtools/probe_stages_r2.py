"""Decompose the batched control step into stage costs at B=4096.

Times jitted prefixes of the substep pipeline (each scanned 10x like the
real control step, so per-dispatch overhead amortizes identically):
  smooth      : forward_smooth_lanes + integrate
  +collide    : ... + batched narrowphase (boxbox lanes + hull lanes)
  +efc        : ... + constraint assembly
  full        : ... + Newton solve (the real step_batched)
Differences between consecutive rows = per-stage cost.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.models.scene import Data
from gym_so100_tpu.ops import constraint as constraint_mod
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth_lanes
from gym_so100_tpu.ops import solver as solver_mod
from gym_so100_tpu.ops.collision import narrowphase
from gym_so100_tpu.parallel.batch import BatchedEnv

XML = "/root/repo/gym_so100_tpu/assets/so100_transfer_cube.xml"
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
HULLS = True


def build_data(m, sl):
    return Data(
        geom_xpos=sl["geom_xpos"], geom_xmat=sl["geom_xmat"],
        site_xpos=sl["site_xpos"], site_xmat=sl["site_xmat"],
        subtree_com=sl["subtree_com0"][:, None, :], cdof=sl["cdof"],
        qM=sl["qM"], qacc_smooth=sl["qacc_smooth"],
        qfrc_actuator=sl["qfrc_actuator"], qfrc_passive=sl["qfrc_passive"],
        qfrc_bias=sl["qfrc_bias"], qfrc_smooth=sl["qfrc_smooth"],
    )


def main():
    m, _ = build_model(XML, max_contacts=24)
    m = m.astype(jnp.float32)
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=HULLS)
    mm = env.m  # pair table as benched
    es = env.reset(jax.random.PRNGKey(0))
    acts = jax.random.uniform(jax.random.PRNGKey(0), (B, 6), jnp.float32, -1, 1)
    for _ in range(3):  # settle into contact
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    s = es.physics

    def scan10(f):
        def g(s):
            def body(c, _):
                return f(c), None
            out, _ = jax.lax.scan(body, s, None, length=10)
            return out
        return jax.jit(g)

    def smooth_only(s):
        sl = smooth_lanes.forward_smooth_lanes(mm, s)
        s2 = smooth_lanes.integrate_lanes(mm, s, sl["qacc_smooth"])
        return s2

    def plus_collide(s):
        sl = smooth_lanes.forward_smooth_lanes(mm, s)
        d = build_data(mm, sl)
        con = narrowphase.collide_batched(mm, d)
        # feed contact depth back so the stage can't be DCE'd
        s2 = smooth_lanes.integrate_lanes(mm, s, sl["qacc_smooth"])
        bump = 1e-12 * jnp.sum(con.dist, axis=-1, keepdims=True)
        return s2.replace(qvel=s2.qvel + bump)

    def plus_efc(s):
        sl = smooth_lanes.forward_smooth_lanes(mm, s)
        d = build_data(mm, sl)
        con = narrowphase.collide_batched(mm, d)
        d = d.replace(contact=con)

        from gym_so100_tpu.ops import constraint_lanes

        efc = constraint_lanes.make_efc_lanes(mm, d, s, con)
        z = (
            jnp.sum(efc.aref, 0) + sum(jnp.sum(Jv, 0) for Jv in efc.J)
            + jnp.sum(efc.D, 0)
        )
        s2 = smooth_lanes.integrate_lanes(mm, s, sl["qacc_smooth"])
        return s2.replace(qvel=s2.qvel + 1e-12 * z[:, None])

    def full(s):
        s2, _ = fwd.step_batched(mm, s)
        return s2

    for name, f in [
        ("smooth", smooth_only), ("+collide", plus_collide),
        ("+efc", plus_efc), ("full", full),
    ]:
        g = scan10(f)
        t0 = time.perf_counter()
        out = g(s)
        float(jnp.sum(out.qvel))
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        N = 5
        for _ in range(N):
            out = g(out)
        float(jnp.sum(out.qvel))
        dt = (time.perf_counter() - t0) / N
        print(f"{name:10s}: {dt*1000:8.1f} ms/control-step "
              f"[compile {compile_t:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
