"""Benchmark: batched env throughput on the default backend (TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: lockstep batched env-steps/s on the full SO100 transfer-cube scene
(state obs, so100_cube_to_bin task, float32, auto-reset), the reference's
structural analog being SubprocVecEnv workers each running MuJoCo
(/root/reference/scripts/train_sac.py:294-310).  vs_baseline is against the
north-star target of 100k env-steps/s/chip at 4096 envs (BASELINE.md) —
the reference itself publishes no numbers.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the batched lanes step lowers to a large XLA
# program (~2-4 min cold compile); cache it across bench invocations
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gym_so100_tpu.models.builder import build_model  # noqa: E402
from gym_so100_tpu.parallel.batch import BatchedEnv  # noqa: E402

XML = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gym_so100_tpu", "assets", "so100_transfer_cube.xml")
B = int(os.environ.get("BENCH_NUM_ENVS", 4096))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
HULLS = os.environ.get("BENCH_HULL_CONTACTS", "1") == "1"


def main():
    # K=16: reference MuJoCo ncon over 2,100 random-action steps peaks at 7
    # (p99 5), so 16 keeps >2x headroom while halving solver rows vs K=32
    m, _ = build_model(XML, max_contacts=16)
    m = m.astype(jnp.float32)
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=HULLS)
    key = jax.random.PRNGKey(0)
    es = env.reset(key)
    acts = jax.random.uniform(key, (B, 6), jnp.float32, -1, 1)

    # warmup / compile + settle into the contact-rich regime.  NOTE: on the
    # tunneled TPU runtime block_until_ready does not actually synchronize;
    # only a value fetch forces execution, so the measurement fetches a
    # scalar after the timed loop.
    for _ in range(4):
        es, obs, rew, term, trunc, info = env.step(es, acts)
    float(jnp.sum(obs))

    t0 = time.perf_counter()
    for _ in range(STEPS):
        es, obs, rew, term, trunc, info = env.step(es, acts)
    float(jnp.sum(obs))
    dt = time.perf_counter() - t0

    steps_per_s = B * STEPS / dt
    print(
        json.dumps(
            {
                "metric": "batched_env_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": f"env-steps/s/chip @ {B} envs (f32, hull_contacts={HULLS})",
                "vs_baseline": round(steps_per_s / 100_000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
