"""MuJoCo-vs-MuJoCo divergence under solver perturbation: the parity ceiling.

Steps the REFERENCE env twice in lockstep with identical seeds/actions; the
second copy's solver is perturbed infinitesimally (ls_tolerance x (1+1e-9)
by default — far below any physical scale).  The per-step qpos divergence
of the two MuJoCo runs bounds what ANY re-implementation can achieve
without bit-identical solver internals: once contact events amplify a
1e-9-relative solver difference to O(1), trajectory-level parity is
information-theoretically gone.

Usage: python devtools/measure_selfdivergence.py [steps] [seed] [mode]
  mode: ls (ls_tolerance nudge, default) | iter (iterations 100 -> 99)
        | tol (tolerance x 1.000000001) | state[EPS] (qpos[0] += EPS (default 1e-15) after
        reset — the Lyapunov bound: any reimplementation that differs from
        MuJoCo by even one ulp anywhere cannot track past the horizon
        where 1e-15 amplifies to the comparison tolerance)
"""

import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np

sys.modules.setdefault("gym", types.ModuleType("gym"))
import gymnasium as gym  # noqa: E402
from dm_control import mujoco as _dmj  # noqa: E402

_dmj.Physics.render = lambda self, height=480, width=640, **kw: np.zeros(
    (height, width, 3), np.uint8
)
import gym_so100  # noqa: E402,F401


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    mode = sys.argv[3] if len(sys.argv) > 3 else "ls"
    a_env = gym.make("gym_so100/SO100TouchCube-v0", obs_type="so100_state")
    b_env = gym.make("gym_so100/SO100TouchCube-v0", obs_type="so100_state")
    a_env.reset(seed=seed)
    b_env.reset(seed=seed)
    pa = a_env.unwrapped._env.physics
    pb = b_env.unwrapped._env.physics
    if mode == "ls":
        pb.model.opt.ls_tolerance *= 1.0 + 1e-9
    elif mode == "iter":
        pb.model.opt.iterations = max(1, pa.model.opt.iterations - 1)
    elif mode == "tol":
        pb.model.opt.tolerance *= 1.0 + 1e-9
    elif mode.startswith("state"):
        # state or stateEXP (e.g. state1e-9): perturbation size after reset
        eps = float(mode[5:]) if len(mode) > 5 else 1e-15
        pb.data.qpos[0] += eps
    elif mode.startswith("late:"):
        # late:STEP:EPS — inject an eps-scale random full-state perturbation
        # just BEFORE step STEP (models the accumulated op-order error a
        # reimplementation carries into a contact event)
        pass  # handled in the loop below
    else:
        pass  # late:/noise: handled below
    if not (mode.startswith(("ls", "iter", "tol", "state", "late:", "noise:"))):
        raise SystemExit(f"unknown mode {mode}")
    late_step, late_eps = -1, 0.0
    if mode.startswith("late:"):
        _, s_, e_ = mode.split(":")
        late_step, late_eps = int(s_), float(e_)
    noise_eps = 0.0
    if mode.startswith("noise:"):
        # noise:EPS — inject eps*randn into B's qpos/qvel after EVERY step:
        # models the fresh per-step op-order noise a reimplementation
        # injects continuously (vs a one-shot perturbation)
        noise_eps = float(mode.split(":")[1])
    print(
        f"mode={mode}: A iter={pa.model.opt.iterations} "
        f"tol={pa.model.opt.tolerance} ls_tol={pa.model.opt.ls_tolerance}; "
        f"B iter={pb.model.opt.iterations} tol={pb.model.opt.tolerance} "
        f"ls_tol={pb.model.opt.ls_tolerance}",
        flush=True,
    )
    rng = np.random.RandomState(1000 + seed)
    acts = rng.uniform(-1, 1, size=(steps, 6)).astype(np.float32)
    for i, a in enumerate(acts):
        if i == late_step:
            prng = np.random.RandomState(99)
            pb.data.qpos[:] += late_eps * prng.randn(pb.data.qpos.shape[0])
            pb.data.qvel[:] += late_eps * prng.randn(pb.data.qvel.shape[0])
        a_env.step(a)
        b_env.step(a)
        if noise_eps:
            nrng = np.random.RandomState(777 + i)
            pb.data.qpos[:] += noise_eps * nrng.randn(pb.data.qpos.shape[0])
            pb.data.qvel[:] += noise_eps * nrng.randn(pb.data.qvel.shape[0])
        dq = np.abs(np.asarray(pa.data.qpos) - np.asarray(pb.data.qpos)).max()
        dv = np.abs(np.asarray(pa.data.qvel) - np.asarray(pb.data.qvel)).max()
        print(f"step {i:3d} qpos_err {dq:.3e} qvel_err {dv:.3e}", flush=True)


if __name__ == "__main__":
    main()
