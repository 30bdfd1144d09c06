"""Per-step deviation profile for the exact configs test_env_parity.py
asserts (full registered episodes, seeds 7/11/23, action stream
RandomState(1000+seed)) — prints max obs/reward error and flag mismatches
at every step so the tiered tolerances can be calibrated from data.

Usage: python devtools/measure_parity_full.py [env_id] [steps] [seed]
"""

import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import gymnasium as gym
import numpy as np

sys.modules.setdefault("gym", types.ModuleType("gym"))
from dm_control import mujoco as _dmj  # noqa: E402

_dmj.Physics.render = lambda self, height=480, width=640, **kw: np.zeros(
    (height, width, 3), np.uint8
)
import gym_so100  # noqa: E402,F401  (reference package)
import gym_so100_tpu  # noqa: E402,F401


def run(env_id, steps, seed):
    ref = gym.make(f"gym_so100/{env_id}", obs_type="so100_state")
    jx = gym.make(f"gym_so100_tpu/{env_id}", obs_type="so100_state")
    obs_r, _ = ref.reset(seed=seed)
    obs_j, _ = jx.reset(seed=seed)
    print(f"== {env_id} seed {seed}: reset err {np.abs(obs_j - obs_r).max():.2e}")
    rng = np.random.RandomState(1000 + seed)
    acts = rng.uniform(-1, 1, size=(steps, 6)).astype(np.float32)
    rews_r, rews_j = [], []
    for i, a in enumerate(acts):
        obs_r, rew_r, term_r, trunc_r, info_r = ref.step(a)
        obs_j, rew_j, term_j, trunc_j, info_j = jx.step(a)
        err = np.abs(obs_j - obs_r).max()
        rerr = abs(float(rew_j) - float(rew_r))
        rews_r.append(float(rew_r))
        rews_j.append(float(rew_j))
        flags = ""
        if term_j != term_r:
            flags += "  TERM-MISMATCH"
        if info_j["is_success"] != info_r["is_success"]:
            flags += "  SUCCESS-MISMATCH"
        if i % 10 == 0 or err > 1e-4 and i < 200 or flags:
            print(f"step {i:3d} obs_err {err:.3e} rew_err {rerr:.3e}{flags}")
        if term_r or trunc_r:
            break
    mr, mj = np.mean(rews_r), np.mean(rews_j)
    print(f"mean reward ref {mr:.4f} jax {mj:.4f} |d| {abs(mr-mj):.4f}")
    ref.close()
    jx.close()


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    else:
        for env_id, steps, seed in [
            ("SO100TouchCube-v0", 300, 7),
            ("SO100TouchCube-v0", 300, 11),
            ("SO100TouchCube-v0", 300, 23),
            ("SO100CubeToBin-v0", 700, 7),
        ]:
            run(env_id, steps, seed)
