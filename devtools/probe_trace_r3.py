"""Capture a real device trace of the fused batched step (B=4096, hulls ON).

The r3 isolation probe showed stages sum to ~203 ms while the fused step
takes ~506 ms — this captures where the extra ~300 ms actually goes
(layout copies? fusion duplication? scheduling gaps?).  Parse the dump with
devtools/parse_trace_r3.py.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.parallel.batch import BatchedEnv

XML = "/root/repo/gym_so100_tpu/assets/so100_transfer_cube.xml"
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/trace_r3"


def main():
    import os
    m, _ = build_model(XML, max_contacts=int(os.environ.get("TRACE_K", "16")))
    m = m.astype(jnp.float32)
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=True)
    key = jax.random.PRNGKey(0)
    es = env.reset(key)
    acts = jax.random.uniform(key, (B, 6), jnp.float32, -1, 1)

    t0 = time.perf_counter()
    for _ in range(4):
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    print(f"warmup+compile {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(5):
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    dt = time.perf_counter() - t0
    print(f"steady: {dt/5*1e3:.1f} ms/step = {B*5/dt:.0f} steps/s", flush=True)

    with jax.profiler.trace(OUT):
        for _ in range(3):
            es, obs, *_ = env.step(es, acts)
        float(jnp.sum(obs))
    print("trace written to", OUT, flush=True)


if __name__ == "__main__":
    main()
