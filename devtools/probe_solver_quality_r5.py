"""On-chip quality validation of the fused Pallas whole-solve kernel.

Compares GST_PALLAS_SOLVE=1 vs the scan path at bench scale (B=4096,
hulls on, settled contact-rich states) on the real TPU, against a
40/25/10 near-exact solve as the ground truth: if the fused kernel's
error vs truth matches the scan path's error vs truth, the kernel is
quality-equivalent and can become the default (the interpret-mode CPU
test pins semantics; this pins on-chip numerics at scale).

Run on TPU:  python devtools/probe_solver_quality_r5.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402

from gym_so100_tpu.models.builder import build_model  # noqa: E402
from gym_so100_tpu.parallel.batch import BatchedEnv  # noqa: E402
from gym_so100_tpu.ops import forward as fwd  # noqa: E402

XML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gym_so100_tpu", "assets", "so100_transfer_cube.xml",
)
B = int(os.environ.get("PROBE_B", "4096"))


def main():
    K = int(os.environ.get("PROBE_K", "16"))
    m, _ = build_model(XML, max_contacts=K)
    m = m.astype(jnp.float32)
    env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=True)
    es = env.reset(jax.random.PRNGKey(0))
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B, 6), jnp.float32, -1, 1)
    os.environ["GST_PALLAS_SOLVE"] = "0"
    for _ in range(6):  # settle into contact-rich regime
        es, obs, *_ = env.step(es, acts)
    float(jnp.sum(obs))
    s = es.physics

    def run(knob, budget=None):
        old = {k: os.environ.get(k) for k in
               ("GST_PALLAS_SOLVE", "GST_NEWTON", "GST_LS", "GST_BRACKET")}
        os.environ["GST_PALLAS_SOLVE"] = knob
        if budget:
            os.environ["GST_NEWTON"], os.environ["GST_LS"], os.environ[
                "GST_BRACKET"] = map(str, budget)
        d = jax.jit(lambda s: fwd.forward_batched(m, s))(s)
        q = np.asarray(d.qacc)
        ni = np.asarray(d.solver_niter)
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        return q, ni

    q_scan, ni_scan = run("0")
    q_fus, ni_fus = run("1")
    q_true, _ = run("0", budget=(40, 25, 10))

    rms = float(np.sqrt((q_true**2).mean()))
    e_scan = np.abs(q_scan - q_true).max(axis=1)
    e_fus = np.abs(q_fus - q_true).max(axis=1)
    out = {
        "B": B, "K": K, "qacc_rms": rms,
        "scan_err_p99": float(np.quantile(e_scan, 0.99)),
        "scan_err_max": float(e_scan.max()),
        "fused_err_p99": float(np.quantile(e_fus, 0.99)),
        "fused_err_max": float(e_fus.max()),
        "niter_scan_mean": float(ni_scan.mean()),
        "niter_fused_mean": float(ni_fus.mean()),
        "fused_minus_scan_p99": float(
            np.quantile(np.abs(q_fus - q_scan).max(axis=1), 0.99)
        ),
        "quality_equivalent": bool(
            np.quantile(e_fus, 0.99) < 2 * np.quantile(e_scan, 0.99) + 1e-6
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
