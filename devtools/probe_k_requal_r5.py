"""Requalify the fixed contact budget K against TRAINED-policy states (r5).

Round 4's flagship SAC run reached ncon_peak=27 against a K=16 buffer —
the physics silently dropped up to 11 candidate contacts in trained-policy
states (VERDICT r4, Missing #1).  Round 5 moves the training default to
K=32; this probe supplies the evidence:

  1. roll the trained policy (or, with --scripted, a deterministic
     press-into-the-table controller that reproduces the high-contact
     regime) at K=32, recording the ncon distribution;
  2. harvest the states whose candidate count EXCEEDS 16 (the states K=16
     silently altered) into a hard-state batch (saved npz, reused by
     tests/test_k_requal.py);
  3. step the identical states under K=16 and K=32 models and report
     qacc error, 50-substep trajectory divergence, and task-reward
     deltas — the measured cost of the K=16 cull on exactly the states
     where it binds.

Run (TPU or CPU):
  python devtools/probe_k_requal_r5.py --ckpt <dir/sac_ckpt_N> [--scripted]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gym_so100_tpu.models.builder import build_model  # noqa: E402
from gym_so100_tpu.parallel.batch import BatchedEnv  # noqa: E402

XML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gym_so100_tpu", "assets", "so100_transfer_cube.xml",
)


def scripted_actions(t, B):
    """Deterministic press policy: drive shoulder/elbow down onto the
    table around the cube, close the jaw — reproduces the many-contact
    regime trained policies reach (gripper pads + jaw + cube + table all
    in simultaneous contact)."""
    a = np.zeros((B, 6), np.float32)
    phase = min(t / 40.0, 1.0)
    a[:, 1] = -0.55 * phase          # shoulder down
    a[:, 2] = 0.9 * phase            # elbow down
    a[:, 3] = 0.7 * phase            # wrist pitch toward table
    a[:, 5] = -0.9 * min(max((t - 30) / 30.0, 0.0), 1.0)  # close jaw
    # small per-lane jitter so lanes decorrelate
    a += 0.05 * np.sin(0.13 * t + np.arange(B)[:, None] * 0.7 + np.arange(6))
    return jnp.asarray(np.clip(a, -1, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None, help="trained SAC checkpoint dir")
    p.add_argument("--scripted", action="store_true")
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--out", default="devtools/hard_states_r5.npz")
    args = p.parse_args()

    B = args.num_envs
    m32, _ = build_model(XML, max_contacts=32)
    m32 = m32.astype(jnp.float32)
    env = BatchedEnv(m32, "so100_cube_to_bin", num_envs=B, hull_contacts=True)
    es = env.reset(jax.random.PRNGKey(0))

    policy = None
    if args.ckpt:
        from gym_so100_tpu.agents.sac import SAC, SACConfig
        from gym_so100_tpu.agents.train import Trainer, TrainConfig

        cfg = Trainer.load_config(args.ckpt) or SACConfig()
        sac = SAC(cfg)
        import orbax.checkpoint as ocp

        st = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.ckpt), sac.init(jax.random.PRNGKey(0))
        )

        def policy(obs, key):
            return sac.act(st, obs, key, deterministic=True)

    # ---- 1+2: roll at K=32, harvest ncon>16 states ----
    ncon_hist = []
    hard_qpos, hard_qvel, hard_ctrl, hard_warm = [], [], [], []
    key = jax.random.PRNGKey(1)
    obs = None
    for t in range(args.steps):
        if policy is not None and obs is not None:
            key, sub = jax.random.split(key)
            acts = policy(obs, sub)
        else:
            acts = scripted_actions(t, B)
        es, obs, rew, term, trunc, info = env.step(es, acts)
        ncon = np.asarray(info["ncon"])
        ncon_hist.append(ncon)
        sel = ncon > 16
        if sel.any() and len(hard_qpos) < 64:  # up to 64 batches of states
            hard_qpos.append(np.asarray(es.physics.qpos)[sel])
            hard_qvel.append(np.asarray(es.physics.qvel)[sel])
            hard_ctrl.append(np.asarray(es.physics.ctrl)[sel])
            hard_warm.append(np.asarray(es.physics.qacc_warmstart)[sel])
    ncon_all = np.concatenate(ncon_hist)
    stats = {
        "ncon_mean": float(ncon_all.mean()),
        "ncon_p99": float(np.quantile(ncon_all, 0.99)),
        "ncon_max": int(ncon_all.max()),
        "frac_over_16": float((ncon_all > 16).mean()),
        "frac_over_32": float((ncon_all > 32).mean()),
    }
    print("ncon:", json.dumps(stats), flush=True)

    if not hard_qpos:
        print(json.dumps({"error": "no states exceeded ncon=16"}))
        return
    qpos = np.concatenate(hard_qpos)[:512]
    qvel = np.concatenate(hard_qvel)[:512]
    ctrl = np.concatenate(hard_ctrl)[:512]
    warm = np.concatenate(hard_warm)[:512]
    # pad to a power-of-two batch for the lanes kernels
    n = 1 << int(np.floor(np.log2(len(qpos))))
    qpos, qvel, ctrl, warm = qpos[:n], qvel[:n], ctrl[:n], warm[:n]
    np.savez(args.out, qpos=qpos, qvel=qvel, ctrl=ctrl, warm=warm)
    print(f"saved {n} hard states (ncon>16) to {args.out}", flush=True)

    # ---- 3: K=16 vs K=32 on the identical hard states ----
    from gym_so100_tpu.ops import forward as fwd

    m16, _ = build_model(XML, max_contacts=16)
    m16 = m16.astype(jnp.float32)

    def batch_state(mm):
        s1 = fwd.make_state(mm, dtype=jnp.float32)
        s = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (n, *a.shape)), s1
        )
        return s.replace(
            qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
            ctrl=jnp.asarray(ctrl), qacc_warmstart=jnp.asarray(warm),
        )

    out = {"hard_states": int(n), **stats}
    # one-step qacc error
    d16 = jax.jit(lambda s: fwd.forward_batched(m16, s))(batch_state(m16))
    d32 = jax.jit(lambda s: fwd.forward_batched(m32, s))(batch_state(m32))
    q16, q32 = np.asarray(d16.qacc), np.asarray(d32.qacc)
    rms = float(np.sqrt((q32**2).mean()))
    qerr = np.abs(q16 - q32).max(axis=1) / max(rms, 1.0)
    out["qacc_rel_err_p50"] = float(np.quantile(qerr, 0.5))
    out["qacc_rel_err_p99"] = float(np.quantile(qerr, 0.99))
    out["qacc_rel_err_max"] = float(qerr.max())
    # 50-substep trajectory divergence (5 control steps)
    s16, _ = jax.jit(lambda s: fwd.n_steps_batched(m16, s, 50))(batch_state(m16))
    s32, _ = jax.jit(lambda s: fwd.n_steps_batched(m32, s, 50))(batch_state(m32))
    dq = np.abs(np.asarray(s16.qpos) - np.asarray(s32.qpos))
    out["traj50_qpos_err_p99"] = float(np.quantile(dq.max(axis=1), 0.99))
    out["traj50_qpos_err_max"] = float(dq.max())
    # cube-position divergence specifically (task-relevant)
    dcube = np.abs(
        np.asarray(s16.qpos)[:, 6:9] - np.asarray(s32.qpos)[:, 6:9]
    ).max(axis=1)
    out["traj50_cube_err_p99"] = float(np.quantile(dcube, 0.99))
    out["traj50_cube_err_max"] = float(dcube.max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
