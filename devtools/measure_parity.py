"""Measure per-step lockstep deviation between our env and the reference
env (the exact comparison tests/test_env_parity.py asserts) without
tolerances — prints the max obs/reward error at every step so the parity
cliff can be tracked while the manifold path is tuned.

Usage: python devtools/measure_parity.py [env_id] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import types

import gymnasium as gym
import numpy as np

sys.modules.setdefault("gym", types.ModuleType("gym"))
from dm_control import mujoco as _dmj  # noqa: E402

_dmj.Physics.render = lambda self, height=480, width=640, **kw: np.zeros(
    (height, width, 3), np.uint8
)
import gym_so100  # noqa: E402,F401  (reference package)
import gym_so100_tpu  # noqa: E402,F401


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "SO100TouchCube-v0"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    ref = gym.make(f"gym_so100/{env_id}", obs_type="so100_state")
    jx = gym.make(f"gym_so100_tpu/{env_id}", obs_type="so100_state")
    obs_r, _ = ref.reset(seed=7)
    obs_j, _ = jx.reset(seed=7)
    print("reset err:", np.abs(obs_j - obs_r).max())
    rng = np.random.RandomState(1)
    acts = rng.uniform(-1, 1, size=(steps, 6)).astype(np.float32)
    for i, a in enumerate(acts):
        obs_r, rew_r, term_r, trunc_r, info_r = ref.step(a)
        obs_j, rew_j, term_j, trunc_j, info_j = jx.step(a)
        err = np.abs(obs_j - obs_r).max()
        rerr = abs(float(rew_j) - float(rew_r))
        print(f"step {i:3d} obs_err {err:.3e} rew_err {rerr:.3e}"
              + ("  TERM-MISMATCH" if term_j != term_r else ""))
        if term_r or trunc_r:
            break
    ref.close(); jx.close()


if __name__ == "__main__":
    main()
