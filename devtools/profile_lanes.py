"""Profile the lanes (batch-last) step pipeline on the real TPU.

Decomposes the batched control step after the boxbox_lanes rewrite: full
step, one substep, collide-only, smooth-only, solver share, and the
selection/pack stage.  Run: python -u devtools/profile_lanes.py [B]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth
from gym_so100_tpu.ops.collision import narrowphase
from gym_so100_tpu.parallel.batch import BatchedEnv

XML = "/root/reference/gym_so100/assets/so100_transfer_cube.xml"
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
HULLS = len(sys.argv) > 2 and sys.argv[2] == "hulls"
dt = jnp.float32


def timed(name, fn, *args, n=3):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt_s = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt_s*1000:10.1f} ms", flush=True)
    return out


def main():
    m, _ = build_model(XML, max_contacts=24)
    m = m.astype(dt)
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=HULLS)
    mnh = env.m
    key = jax.random.PRNGKey(0)
    es = env.reset(key)
    acts = jax.random.uniform(key, (B, 6), dt, -1, 1)
    print(f"B={B} hulls={HULLS}", flush=True)
    t0 = time.perf_counter()
    for _ in range(4):
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    print(f"[compile+warm {time.perf_counter()-t0:.0f}s]", flush=True)
    sbatch = es.physics

    timed("full env.step (10 substeps)", env.step, es, acts)
    f_step1 = jax.jit(lambda s: fwd.step_batched(mnh, s)[0])
    timed("1 substep full (lanes)", f_step1, sbatch)

    f_smooth = jax.jit(
        lambda s: jax.vmap(lambda s1: smooth.forward_smooth(mnh, s1))(
            s
        ).qacc_smooth
    )
    timed("1x smooth vmapped", f_smooth, sbatch)

    def _collide(s):
        d = jax.vmap(lambda s1: smooth.kinematics(mnh, s1))(s)
        return narrowphase.collide_batched(mnh, d).dist

    timed("1x kinematics+collide (lanes)", jax.jit(_collide), sbatch)

    def _full(s):
        return fwd.forward_batched(mnh, s).qacc

    timed("1x forward incl solver", jax.jit(_full), sbatch)

    ni = jax.jit(lambda s: fwd.forward_batched(mnh, s).solver_niter)(sbatch)
    import numpy as np

    ni = np.asarray(ni)
    print(f"solver niter: min={ni.min()} mean={ni.mean():.2f} max={ni.max()}")
    steps_per_s = 0.0


if __name__ == "__main__":
    main()
