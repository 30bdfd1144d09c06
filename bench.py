"""Benchmark: batched env throughput on the default backend (TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: lockstep batched env-steps/s on the full SO100 transfer-cube scene
(state obs, so100_cube_to_bin task, float32, auto-reset), the reference's
structural analog being SubprocVecEnv workers each running MuJoCo
(/root/reference/scripts/train_sac.py:294-310).  vs_baseline is against the
north-star target of 100k env-steps/s/chip at 4096 envs (BASELINE.md) —
the reference itself publishes no numbers.

Modes (env vars):
  BENCH_PIXELS=1        pixel-obs throughput (batched on-device rasterizer,
                        the reference's default obs family,
                        /root/reference/gym_so100/__init__.py:11) instead of
                        the state-obs metric.
  BENCH_NUM_ENVS/BENCH_STEPS/BENCH_HULL_CONTACTS/BENCH_MAX_CONTACTS  knobs.

Resilience: the round-4 capture died rc=1 because one transient TPU-backend
init failure (axon tunnel) had no retry.  bench.py now supervises itself:
the parent re-execs this file as a worker subprocess with a hard timeout
and retries with backoff on failure OR hang, so a flaky backend init can't
cost the round its number.  Set BENCH_NO_SUPERVISE=1 to run inline.
"""

import json
import os
import subprocess
import sys
import time

B = int(os.environ.get("BENCH_NUM_ENVS", 4096))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
HULLS = os.environ.get("BENCH_HULL_CONTACTS", "1") == "1"
K = int(os.environ.get("BENCH_MAX_CONTACTS", "16"))
PIXELS = os.environ.get("BENCH_PIXELS", "0") == "1"


def worker():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the batched lanes step lowers to a large XLA
    # program (~2-4 min cold compile); cache it across bench invocations
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from gym_so100_tpu.models.builder import build_model
    from gym_so100_tpu.parallel.batch import BatchedEnv

    xml = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "gym_so100_tpu", "assets", "so100_transfer_cube.xml",
    )
    # K=16 default: reference MuJoCo ncon over 2,100 random-action steps
    # peaks at 7 (p99 5).  Trained policies have been observed to reach
    # ncon 27 (artifacts/sac_touchcube_curve.jsonl) — BENCH_MAX_CONTACTS=32
    # gives the trained-policy-safe number (PERF_NOTES.md, round 5).
    m, aux = build_model(xml, max_contacts=K, keep_visual=PIXELS)
    m = m.astype(jnp.float32)
    if PIXELS:
        env = BatchedEnv(
            m, "so100_cube_to_bin", num_envs=B, hull_contacts=HULLS,
            obs_mode="pixels_agent_pos", render_aux=aux,
        )
    else:
        env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=HULLS)
    key = jax.random.PRNGKey(0)
    es = env.reset(key)
    acts = jax.random.uniform(key, (B, 6), jnp.float32, -1, 1)

    if PIXELS:
        # warmup / compile + settle.  NOTE: on the tunneled TPU runtime
        # block_until_ready does not synchronize; only a value fetch forces
        # execution, so fetch a scalar after the timed loop.
        for _ in range(4):
            es, obs, rew, term, trunc, info = env.step(es, acts)
        float(jnp.sum(obs["agent_pos"])) + float(jnp.sum(obs["pixels"][0]))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            es, obs, rew, term, trunc, info = env.step(es, acts)
        float(jnp.sum(obs["agent_pos"])) + float(jnp.sum(obs["pixels"][0]))
        dt = time.perf_counter() - t0
        steps_per_s = B * STEPS / dt
        print(json.dumps({
            "metric": "batched_env_steps_per_s_pixels",
            "value": round(steps_per_s, 1),
            "unit": f"env-steps/s/chip @ {B} envs (64x48 px obs, f32, hull_contacts={HULLS}, K={K})",
            "vs_baseline": round(steps_per_s / 100_000.0, 4),
        }))
        return

    # warmup / compile + settle into the contact-rich regime (sync note above)
    for _ in range(4):
        es, obs, rew, term, trunc, info = env.step(es, acts)
    float(jnp.sum(obs))

    t0 = time.perf_counter()
    for _ in range(STEPS):
        es, obs, rew, term, trunc, info = env.step(es, acts)
    float(jnp.sum(obs))
    dt = time.perf_counter() - t0

    steps_per_s = B * STEPS / dt
    print(json.dumps({
        "metric": "batched_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": f"env-steps/s/chip @ {B} envs (f32, hull_contacts={HULLS}, K={K})",
        "vs_baseline": round(steps_per_s / 100_000.0, 4),
    }))


def supervise():
    """Run the worker in a subprocess; retry on failure or hang.

    The TPU backend behind the axon tunnel occasionally fails or hangs at
    init (BENCH_r04.json: rc=1, backend UNAVAILABLE).  A fresh process gets
    a fresh backend handshake, so retrying in-process is not enough.
    """
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    timeout_s = float(os.environ.get("BENCH_TIMEOUT_S", "1800"))
    backoffs = [20.0, 60.0]
    env = dict(os.environ, BENCH_NO_SUPERVISE="1")
    last_err = ""
    for i in range(attempts):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired as e:
            last_err = f"attempt {i + 1}: hang (>{timeout_s:.0f}s); stderr tail: " + (
                (e.stderr or "")[-2000:] if isinstance(e.stderr, str) else ""
            )
            print(last_err, file=sys.stderr)
        else:
            line = ""
            for ln in (p.stdout or "").splitlines():
                if ln.startswith("{"):
                    line = ln
            if p.returncode == 0 and line:
                print(line)
                return 0
            last_err = (
                f"attempt {i + 1}: rc={p.returncode}; stderr tail: "
                + (p.stderr or "")[-2000:]
            )
            print(last_err, file=sys.stderr)
        if i < attempts - 1:
            time.sleep(backoffs[min(i, len(backoffs) - 1)])
    print(f"bench failed after {attempts} attempts: {last_err}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if os.environ.get("BENCH_NO_SUPERVISE", "0") == "1":
        worker()
    else:
        sys.exit(supervise())
