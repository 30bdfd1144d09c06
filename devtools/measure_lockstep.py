"""f64 qpos/qvel lockstep deviation vs the reference MuJoCo env.

Drives both envs with the same seed/actions and prints the raw state-level
max |Δqpos| / |Δqvel| per step (no f32 obs casting in the way) — calibrates
the BASELINE "bit-matched rollouts" tier in tests/test_env_parity.py.

Usage: python devtools/measure_lockstep.py [env_id] [steps] [seed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import types

import gymnasium as gym
import numpy as np

sys.modules.setdefault("gym", types.ModuleType("gym"))
from dm_control import mujoco as _dmj  # noqa: E402

_dmj.Physics.render = lambda self, height=480, width=640, **kw: np.zeros(
    (height, width, 3), np.uint8
)
import gym_so100  # noqa: E402,F401
import gym_so100_tpu  # noqa: E402,F401


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "SO100TouchCube-v0"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    ref = gym.make(f"gym_so100/{env_id}", obs_type="so100_state")
    jx = gym.make(f"gym_so100_tpu/{env_id}", obs_type="so100_state")
    ref.reset(seed=seed)
    jx.reset(seed=seed)
    pr = ref.unwrapped._env.physics
    rng = np.random.RandomState(1000 + seed)
    acts = rng.uniform(-1, 1, size=(steps, 6)).astype(np.float32)
    for i, a in enumerate(acts):
        ref.step(a)
        jx.step(a)
        qp_r = np.asarray(pr.data.qpos)
        qv_r = np.asarray(pr.data.qvel)
        qp_j = np.asarray(jx.unwrapped._es.physics.qpos)
        qv_j = np.asarray(jx.unwrapped._es.physics.qvel)
        print(
            f"step {i:3d} qpos_err {np.abs(qp_j - qp_r).max():.3e} "
            f"qvel_err {np.abs(qv_j - qv_r).max():.3e}",
            flush=True,
        )
    ref.close(); jx.close()


if __name__ == "__main__":
    main()
