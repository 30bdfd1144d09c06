"""Qualify the f32 fidelity knobs on TRAINED-POLICY states (round 5).

Round 4 qualified the 10/6/5 solver budget and the 126-direction hull
sweep on settled *random-action* batches; round 4 then proved trained
policies visit a different state distribution (ncon 27 vs 7).  This probe
re-runs both error measurements on the harvested hard-state batch
(devtools/probe_k_requal_r5.py output: states where the trained/press
policy pushes many simultaneous contacts):

  1. solver budget: default f32 10/6/5 vs a 40/25/10 near-exact solve on
     identical EfcLanes rows (same K=32 model) — p50/p99/max qacc error;
  2. end-to-end f32 fidelity: one full f32 control step vs the f64
     exact-GJK/EPA parity path from the same states — cube-pose and qpos
     divergence (bounds the hull-sweep angular-resolution error where it
     matters, on contact-rich trained states).

Results go to PERF_NOTES.md round 5; tests/test_k_requal.py pins (1) on
the committed hard-state batch.

Run:  python devtools/probe_fidelity_r5.py [--states devtools/hard_states_r5.npz]
"""

import argparse
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
from gym_so100_tpu.ops import forward as fwd  # noqa: E402

XML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gym_so100_tpu", "assets", "so100_transfer_cube.xml",
)


class _budget:
    """Temporarily override the f32 solver budget env knobs."""

    def __init__(self, newton, ls, bracket):
        self.vals = {"GST_NEWTON": str(newton), "GST_LS": str(ls),
                     "GST_BRACKET": str(bracket)}

    def __enter__(self):
        self.old = {k: os.environ.get(k) for k in self.vals}
        os.environ.update(self.vals)

    def __exit__(self, *a):
        for k, v in self.old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def load_states(path, m, dtype):
    z = np.load(path)
    n = z["qpos"].shape[0]
    s1 = fwd.make_state(m, dtype=dtype)
    s = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (n, *a.shape)).astype(
            dtype if a.dtype in (jnp.float32, jnp.float64) else a.dtype
        ),
        s1,
    )
    return s.replace(
        qpos=jnp.asarray(z["qpos"], dtype),
        qvel=jnp.asarray(z["qvel"], dtype),
        ctrl=jnp.asarray(z["ctrl"], dtype),
        qacc_warmstart=jnp.asarray(z["warm"], dtype),
    ), n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--states", default="devtools/hard_states_r5.npz")
    args = p.parse_args()

    out = {}
    m32, _ = build_model(XML, max_contacts=32)
    m32f = m32.astype(jnp.float32)

    # ---- 1: solver budget error on hard states ----
    s, n = load_states(args.states, m32f, jnp.float32)
    out["n_states"] = n
    with _budget(10, 6, 5):
        d_def = jax.jit(lambda s: fwd.forward_batched(m32f, s))(s)
        q_def = np.asarray(d_def.qacc)
    with _budget(40, 25, 10):
        d_ref = jax.jit(lambda s: fwd.forward_batched(m32f, s))(s)
        q_ref = np.asarray(d_ref.qacc)
    rms = float(np.sqrt((q_ref**2).mean()))
    err = np.abs(q_def - q_ref).max(axis=1)
    out["qacc_rms"] = rms
    out["budget_abs_err_p50"] = float(np.quantile(err, 0.5))
    out["budget_abs_err_p99"] = float(np.quantile(err, 0.99))
    out["budget_abs_err_max"] = float(err.max())
    out["budget_rel_err_p99"] = float(np.quantile(err, 0.99) / max(rms, 1e-9))
    print("budget:", json.dumps(out), flush=True)

    # ---- 2: end-to-end f32 vs f64-exact parity step on the same states ----
    m64, _ = build_model(XML, ccd_manifolds=True)
    s64, _ = load_states(args.states, m64, jnp.float64)
    s32 = s
    sA, _ = jax.jit(lambda s: fwd.n_steps_batched(m32f, s, 10))(s32)
    # f64 parity path: vmapped per-env exact step (manifold collider)
    sB = jax.jit(
        jax.vmap(lambda s1: fwd.n_steps(m64, s1, 10))
    )(s64)
    dq = np.abs(np.asarray(sA.qpos, np.float64) - np.asarray(sB.qpos))
    dcube = dq[:, 6:9].max(axis=1)
    out2 = {
        "e2e_qpos_err_p50": float(np.quantile(dq.max(axis=1), 0.5)),
        "e2e_qpos_err_p99": float(np.quantile(dq.max(axis=1), 0.99)),
        "e2e_cube_err_p99": float(np.quantile(dcube, 0.99)),
        "e2e_cube_err_max": float(dcube.max()),
    }
    print("e2e:", json.dumps(out2))


if __name__ == "__main__":
    main()
