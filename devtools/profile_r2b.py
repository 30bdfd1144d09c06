"""Stage breakdown of the lanes control step at B=4096, hulls ON.

Times each forward_batched stage separately with value-fetch sync.
Run: python -u devtools/profile_r2b.py [B]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth_lanes, constraint_lanes, solver_lanes
from gym_so100_tpu.ops.collision import narrowphase, hull_lanes
from gym_so100_tpu.parallel.batch import BatchedEnv

XML = "/root/repo/gym_so100_tpu/assets/so100_transfer_cube.xml"
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
dt = jnp.float32


def timed(name, fn, *args, n=5):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt_s = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt_s*1000:10.1f} ms", flush=True)
    return out


def main():
    m, _ = build_model(XML, max_contacts=24)
    m = m.astype(dt)
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=True)
    mh = env.m
    key = jax.random.PRNGKey(0)
    es = env.reset(key)
    acts = jax.random.uniform(key, (B, 6), dt, -1, 1)
    print(f"B={B} hulls=True", flush=True)
    t0 = time.perf_counter()
    for _ in range(4):
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    print(f"[compile+warm {time.perf_counter()-t0:.0f}s]", flush=True)
    s = es.physics

    timed("full env.step (10 substeps)", env.step, es, acts)
    timed("1 substep full (lanes)", jax.jit(lambda s: fwd.step_batched(mh, s)[0]), s)

    # stage: smooth
    f_sm = jax.jit(lambda s: smooth_lanes.forward_smooth_lanes(mh, s)["qacc_smooth"])
    timed("smooth_lanes", f_sm, s)

    # kinematics only (for downstream stages)
    from gym_so100_tpu.ops import smooth as smooth_aos

    def _kin(s):
        sl = smooth_lanes.forward_smooth_lanes(mh, s)
        return sl

    sl = jax.jit(_kin)(s)

    def _dfrom(sl):
        from gym_so100_tpu.models.scene import Data

        return Data(
            geom_xpos=sl["geom_xpos"], geom_xmat=sl["geom_xmat"],
            site_xpos=sl["site_xpos"], site_xmat=sl["site_xmat"],
            subtree_com=sl["subtree_com0"][:, None, :], cdof=sl["cdof"],
            qM=sl["qM"], qacc_smooth=sl["qacc_smooth"],
            qfrc_actuator=sl["qfrc_actuator"], qfrc_passive=sl["qfrc_passive"],
            qfrc_bias=sl["qfrc_bias"], qfrc_smooth=sl["qfrc_smooth"],
        )

    d = jax.jit(lambda s: _dfrom(_kin(s)))(s)

    # stage: collide split
    timed("collide_batched (box+hull)", jax.jit(lambda d: narrowphase.collide_batched(mh, d).dist), d)
    import dataclasses

    mnh = dataclasses.replace(mh, pairs=dataclasses.replace(mh.pairs, hull_box=(), hull_hull=()))
    timed("collide_batched (boxes only)", jax.jit(lambda d: narrowphase.collide_batched(mnh, d).dist), d)
    timed("hull_lanes only", jax.jit(lambda d: hull_lanes.collide_hulls_lanes(mh, d)[2]), d)

    con = jax.jit(lambda d: narrowphase.collide_batched(mh, d))(d)
    d2 = d.replace(contact=con)

    # stage: efc
    f_efc = jax.jit(lambda d2, s: constraint_lanes.make_efc_lanes(mh, d2, s, d2.contact).J)
    timed("efc_lanes", f_efc, d2, s)
    efc = jax.jit(lambda d2, s: constraint_lanes.make_efc_lanes(mh, d2, s, d2.contact))(d2, s)

    # stage: solver
    qml = jax.jit(lambda s: smooth_lanes.forward_smooth_lanes(mh, s)["qM_lanes"])(s)
    f_sol = jax.jit(
        lambda qml, d2, efc, s: solver_lanes.solve_lanes(mh, qml, d2.qacc_smooth, efc, s.qacc_warmstart)[0]
    )
    timed("solver_lanes", f_sol, qml, d2, efc, s)

    # stage: integrate
    f_int = jax.jit(lambda s, d2: smooth_lanes.integrate_lanes(mh, s, d2.qacc_smooth).qpos)
    timed("integrate_lanes", f_int, s, d2)

    import numpy as np

    ni = np.asarray(jax.jit(lambda s: fwd.forward_batched(mh, s).solver_niter)(s))
    print(f"solver niter: min={ni.min()} mean={ni.mean():.2f} max={ni.max()}")


if __name__ == "__main__":
    main()
