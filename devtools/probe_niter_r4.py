"""Newton-iteration convergence distribution at B=4096, K=16, hulls on.

The f32 solver runs a fixed-length masked scan, so the iteration CAP is the
cost (PERF_NOTES).  This measures how many iterations lanes actually need
(solver_niter = first iteration where the improvement/gradient test hit)
across settled + random-action states, to justify the cap.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.parallel.batch import BatchedEnv

XML = "/root/repo/gym_so100_tpu/assets/so100_transfer_cube.xml"
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def main():
    m, _ = build_model(XML, max_contacts=16)
    m = m.astype(jnp.float32)
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=True)
    es = env.reset(jax.random.PRNGKey(0))
    acts = jax.random.uniform(jax.random.PRNGKey(0), (B, 6), jnp.float32, -1, 1)
    for _ in range(5):
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))

    step1 = jax.jit(lambda s: fwd.step_batched(m, s))
    for label, a in (("random", acts), ("hold", jnp.zeros_like(acts))):
        s = es.physics.replace(ctrl=jnp.zeros((B, 6), jnp.float32))
        niters = []
        for _ in range(10):
            s, d = step1(s)
            niters.append(np.asarray(d.solver_niter))
        ni = np.concatenate(niters)
        print(
            f"{label}: mean {ni.mean():.2f}  p50 {np.percentile(ni, 50):.0f}"
            f"  p99 {np.percentile(ni, 99):.0f}  max {ni.max()}"
            f"  frac@cap {np.mean(ni >= ni.max()):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
