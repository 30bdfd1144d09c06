"""Decompose the multi-chip dryrun weak-scaling ratio (round 5).

MULTICHIP_r04 reported step time 2.72 s (1 dev) -> 6.94 s (8 dev) at fixed
per-device envs on 8 VIRTUAL CPU devices — ratio 2.55.  Question (VERDICT
r4 #6): host contention artifact, or real cross-device serialization in the
sharded program?

Method: on an N-core host with n virtual devices, measure at each mesh size
  (a) the sharded batched env step (per-device envs fixed), and
  (b) a ZERO-COMMUNICATION control: the same per-device amount of pure
      elementwise+reduce compute, sharded identically, no collectives —
      its ratio measures pure host oversubscription/contention.
If (a) tracks (b), the partitioned env step adds no cross-device
serialization beyond what the virtual-device host imposes; on real chips
(one core/controller per chip, no oversubscription) the ratio would be ~1.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python devtools/probe_weakscale_r5.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from gym_so100_tpu.models.builder import build_model  # noqa: E402
from gym_so100_tpu.parallel.batch import BatchedEnv  # noqa: E402

XML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gym_so100_tpu", "assets", "so100_transfer_cube.xml",
)
PER_DEV = 2
REPS = int(os.environ.get("PROBE_REPS", "5"))


def env_step_time(m, ndev):
    mesh = Mesh(jax.devices()[:ndev], ("env",))
    B = PER_DEV * ndev
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=True)
    es = env.reset(jax.random.PRNGKey(0))
    es = env.shard(es, mesh)
    acts = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (B, 6), jnp.float32, -1, 1),
        NamedSharding(mesh, P("env", None)),
    )
    t0 = time.perf_counter()
    es, obs, *_ = env.step(es, acts)
    jax.block_until_ready(obs)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        es, obs, *_ = env.step(es, acts)
    jax.block_until_ready(obs)
    return (time.perf_counter() - t0) / REPS, compile_s


def control_step_time(ndev):
    """Zero-communication sharded compute: per-device work is constant."""
    mesh = Mesh(jax.devices()[:ndev], ("env",))
    B = PER_DEV * ndev
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (B, 256, 256), jnp.float32),
        NamedSharding(mesh, P("env", None, None)),
    )

    @jax.jit
    def f(x):
        def body(c, _):
            c = jnp.tanh(c @ c * 1e-3 + 0.1)
            return c, None
        c, _ = jax.lax.scan(body, x, None, length=40)
        return c

    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(REPS):
        x = f(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / REPS


def main():
    m, _ = build_model(XML, max_contacts=16)
    m = m.astype(jnp.float32)
    ncores = os.cpu_count()
    sizes = [1, 2, 4, 8]
    out = {"host_cores": ncores, "per_device_envs": PER_DEV, "sizes": {}}
    for nd in sizes:
        t_env, c_env = env_step_time(m, nd)
        t_ctl = control_step_time(nd)
        out["sizes"][nd] = {
            "env_step_s": round(t_env, 4),
            "control_s": round(t_ctl, 4),
            "compile_s": round(c_env, 1),
        }
        print(f"ndev={nd}: env_step={t_env:.4f}s control={t_ctl:.4f}s "
              f"compile={c_env:.1f}s", flush=True)
    e1 = out["sizes"][1]["env_step_s"]
    c1 = out["sizes"][1]["control_s"]
    for nd in sizes[1:]:
        out["sizes"][nd]["env_ratio"] = round(out["sizes"][nd]["env_step_s"] / e1, 3)
        out["sizes"][nd]["control_ratio"] = round(out["sizes"][nd]["control_s"] / c1, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
