"""Verification drive (see .claude/skills/verify): exercise the public
library surface end-to-end on the real TPU with the lanes pipeline.

Checks:
1. batched env rollout: cube settles at z ~= 0.02 on the table,
   arm joints servo toward ctrl targets within ~1 s of sim time;
2. rewards/obs finite, auto-reset functioning over 60 control steps;
3. single-env gymnasium surface steps (host adapter).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.parallel.batch import BatchedEnv

XML = "/root/repo/gym_so100_tpu/assets/so100_transfer_cube.xml"

m, _ = build_model(XML, max_contacts=24)
m = m.astype(jnp.float32)
B = 64
env = BatchedEnv(m, "so100_cube_to_bin", num_envs=B, hull_contacts=True)
es = env.reset(jax.random.PRNGKey(0))

# hold a fixed target: joints toward 0.3 of range, gripper open
acts = jnp.tile(jnp.asarray([[0.2, -0.3, 0.25, 0.1, -0.2, 0.5]], jnp.float32), (B, 1))
for i in range(60):  # 1.2 s sim time
    es, obs, rew, term, trunc, info = env.step(es, acts)
obs = np.asarray(obs)
qpos = np.asarray(es.physics.qpos)

cube_z = qpos[:, 8]
print("cube z: mean %.4f  min %.4f  max %.4f (expect ~0.02)" %
      (cube_z.mean(), cube_z.min(), cube_z.max()))
assert np.isfinite(obs).all(), "non-finite obs"
assert np.isfinite(np.asarray(rew)).all(), "non-finite rewards"
assert 0.015 < np.median(cube_z) < 0.03, "cube not resting on table"

# arm servo check: joint 0 target = 0.2 * range scale
from gym_so100_tpu.envs import constants

target = np.asarray(constants.unnormalize_actions(np.asarray(acts[0])))
err = np.abs(qpos[:, :6] - target[None, :]).mean(axis=0)
print("servo |qpos - target| per joint:", np.round(err, 3))
assert (err[:5] < 0.25).all(), "arm not tracking ctrl targets"

# gymnasium single-env surface
import gymnasium as gym
import gym_so100_tpu  # noqa: F401

e = gym.make("gym_so100_tpu/SO100TouchCube-v0", obs_type="so100_state")
o, _ = e.reset(seed=3)
for _ in range(5):
    o, r, te, tr, inf = e.step(np.zeros(6, np.float32))
print("gym env obs[:4]:", np.round(np.asarray(o[:4]), 4), "reward", float(r))
assert np.isfinite(np.asarray(o)).all()
e.close()
print("VERIFY OK")
