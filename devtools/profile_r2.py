"""Round-2 profiling: decompose the batched control step cost at B=1024.

Times each pipeline stage separately (with a value fetch to force execution
on the tunneled runtime) and reports the Newton iteration distribution.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import constraint as constraint_mod
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth
from gym_so100_tpu.ops import solver as solver_mod
from gym_so100_tpu.ops.collision import narrowphase
from gym_so100_tpu.parallel.batch import BatchedEnv

XML = "/root/reference/gym_so100/assets/so100_transfer_cube.xml"
B = 1024
dt = jnp.float32


def timed(name, fn, *args, n=3):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))) if hasattr(x, "astype") else x,
        jax.tree_util.tree_leaves(out)[0],
    )
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt_s = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt_s*1000:10.1f} ms")
    return out


def main():
    m, _ = build_model(XML, max_contacts=24)
    m = m.astype(dt)
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=False)
    mnh = env.m  # hulls stripped
    key = jax.random.PRNGKey(0)
    es = env.reset(key)
    acts = jax.random.uniform(key, (B, 6), dt, -1, 1)
    # settle into contact-rich regime
    for _ in range(4):
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    sbatch = es.physics

    # full control step (10 substeps + position stage + reward + autoreset)
    timed("full env.step (10 substeps)", env.step, es, acts)

    # 1 substep, full physics
    f_step1 = jax.jit(jax.vmap(lambda s: fwd.step(mnh, s)[0]))
    timed("1 substep full", f_step1, sbatch)

    # smooth only
    f_smooth = jax.jit(jax.vmap(lambda s: smooth.forward_smooth(mnh, s).qacc_smooth))
    timed("1x smooth (FK/CRBA/RNE/act)", f_smooth, sbatch)

    # collide only (incl. kinematics)
    def _collide(s):
        d = smooth.kinematics(mnh, s)
        return narrowphase.collide(mnh, d).dist

    timed("1x kinematics+collide", jax.jit(jax.vmap(_collide)), sbatch)

    # forward with solver stubbed (qacc = qacc_smooth)
    def _nosolve(s):
        d = smooth.forward_smooth(mnh, s)
        con = narrowphase.collide(mnh, d)
        d = d.replace(contact=con)
        efc = constraint_mod.make_efc(mnh, d, s, con)
        return d.qacc_smooth + 0.0 * efc.aref[0]

    timed("1x forward minus solver", jax.jit(jax.vmap(_nosolve)), sbatch)

    # full forward (with solver)
    def _full(s):
        return fwd.forward(mnh, s).qacc

    timed("1x forward incl solver", jax.jit(jax.vmap(_full)), sbatch)

    # solver iteration count distribution
    def _niter(s):
        return fwd.forward(mnh, s).solver_niter

    ni = jax.jit(jax.vmap(_niter))(sbatch)
    import numpy as np

    ni = np.asarray(ni)
    print(f"solver niter: min={ni.min()} mean={ni.mean():.2f} max={ni.max()}")


if __name__ == "__main__":
    main()
