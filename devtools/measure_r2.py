"""Round-2 headline measurement: control-step throughput across configs.

Runs the full BatchedEnv control step (the bench metric) at several
(B, hulls) configs in one process and prints env-steps/s for each.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.parallel.batch import BatchedEnv

XML = "/root/repo/gym_so100_tpu/assets/so100_transfer_cube.xml"


def run(m, B, hulls, steps=20):
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=hulls)
    key = jax.random.PRNGKey(0)
    es = env.reset(key)
    acts = jax.random.uniform(key, (B, 6), jnp.float32, -1, 1)
    t0 = time.perf_counter()
    for _ in range(4):
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    print(f"  [compile+settle {time.perf_counter()-t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    for _ in range(steps):
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    dt = time.perf_counter() - t0
    sps = B * steps / dt
    print(f"B={B} hulls={hulls}: {dt/steps*1000:.1f} ms/step -> "
          f"{sps:,.0f} env-steps/s", flush=True)
    return sps


def main():
    m, _ = build_model(XML, max_contacts=24)
    m = m.astype(jnp.float32)
    for B, hulls in [(4096, False), (4096, True), (1024, True), (8192, False)]:
        run(m, B, hulls)


if __name__ == "__main__":
    main()
