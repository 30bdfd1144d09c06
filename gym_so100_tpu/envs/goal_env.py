"""GoalEnv (HER) adapter: SO100GoalEnv drop-in.

Mirrors /root/reference/gym_so100/env.py:188-409: dict obs {observation,
achieved_goal, desired_goal} where observation = flattened pixels/255 ++
agent_pos (env.py:267-270), achieved_goal = cube site position
(env.py:336-339), sparse 0/-1 reward with distance_threshold=0.01 handling
both single and HER-batched goal arrays (env.py:341-353), the 5000-total-step
goal curriculum (near-cube goals first, then bin interior, env.py:322-334),
internal 300-step truncation with TimeLimit.truncated info (env.py:398-403),
terminated = success (env.py:405).  The per-10-step progress prints are
logging, not semantics, and are dropped.
"""

from __future__ import annotations

import numpy as np

import gymnasium as gym
from gymnasium import spaces

import jax
import jax.numpy as jnp

from . import constants as C
from . import core
from .gym_env import ASSETS_XML, SO100Env


def compute_reward_jnp(achieved_goal, desired_goal, distance_threshold=0.01):
    """Pure-jnp sparse goal reward; broadcasts over leading batch dims (the
    HER relabeling contract, env.py:341-353)."""
    d = jnp.linalg.norm(achieved_goal - desired_goal, axis=-1)
    return jnp.where(d < distance_threshold, 0.0, -1.0).astype(jnp.float32)


class SO100GoalEnv(gym.Env):
    metadata = {"render_modes": ["rgb_array"], "render_fps": 50}

    def __init__(
        self,
        render_mode="rgb_array",
        observation_width=640,
        observation_height=480,
        visualization_width=640,
        visualization_height=480,
        xml_path=ASSETS_XML,
        dtype=None,
    ):
        super().__init__()
        self.max_episode_steps = 300
        self.current_step = 0
        self.total_steps = 0
        self.render_mode = render_mode
        self.observation_width = observation_width
        self.observation_height = observation_height
        self.visualization_width = visualization_width
        self.visualization_height = visualization_height

        # inner classic env drives physics/pixels
        self._inner = SO100Env(
            task="so100_cube_to_bin",
            obs_type="so100_pixels_agent_pos",
            observation_width=observation_width,
            observation_height=observation_height,
            visualization_width=visualization_width,
            visualization_height=visualization_height,
            xml_path=xml_path,
            dtype=dtype,
        )

        goal_dim = 3
        pixels_flat = observation_height * observation_width * 3
        obs_size = pixels_flat + len(C.SO100_JOINTS)
        self.observation_space = spaces.Dict(
            {
                "observation": spaces.Box(-np.inf, np.inf, (obs_size,), np.float32),
                "achieved_goal": spaces.Box(-np.inf, np.inf, (goal_dim,), np.float32),
                "desired_goal": spaces.Box(-np.inf, np.inf, (goal_dim,), np.float32),
            }
        )
        self.action_space = spaces.Box(-1, 1, (len(C.SO100_ACTIONS),), np.float32)

        self.bin_goal_space = spaces.Box(
            low=np.array([C.bin_min[0] + 0.005, C.bin_min[1] + 0.005, 0.01]),
            high=np.array([C.bin_max[0] - 0.005, C.bin_max[1] - 0.005, 0.05]),
            dtype=np.float32,
        )
        self.distance_threshold = 0.01

    # -- helpers -------------------------------------------------------------

    def render(self):
        return self._inner.render()

    def _flatten_observation(self, base_obs):
        pixels = base_obs["pixels"].reshape(-1).astype(np.float32) / 255.0
        return np.concatenate([pixels, base_obs["agent_pos"].astype(np.float32)])

    def _achieved_goal(self):
        es = self._inner._es
        d = core.fwd.smooth.kinematics(self._inner._m, es.physics)
        return np.asarray(
            d.site_xpos[self._inner._ids.cube_site], np.float32
        )

    def _sample_goal(self):
        if self.total_steps < 5000:
            lifted = spaces.Box(
                low=np.array(
                    [self.box_pose[0] - 0.03, self.box_pose[1] - 0.03, 0.01]
                ),
                high=np.array(
                    [self.box_pose[0] + 0.03, self.box_pose[1] + 0.03, 0.05]
                ),
                dtype=np.float32,
            )
            return lifted.sample()
        return self.bin_goal_space.sample()

    def compute_reward(self, achieved_goal, desired_goal, info):
        return np.asarray(
            compute_reward_jnp(
                jnp.asarray(achieved_goal), jnp.asarray(desired_goal),
                self.distance_threshold,
            )
        )[()]

    def _is_success(self, achieved_goal, desired_goal):
        return bool(
            np.linalg.norm(achieved_goal - desired_goal) < self.distance_threshold
        )

    def _goal_obs(self, base_obs):
        return {
            "observation": self._flatten_observation(base_obs),
            "achieved_goal": self._achieved_goal(),
            "desired_goal": self.goal.copy(),
        }

    # -- gym API -------------------------------------------------------------

    def reset(self, seed=None, options=None):
        super().reset(seed=seed)
        self.current_step = 0
        self.box_pose = C.sample_so100_box_pose_np(seed)
        base_obs, _ = self._inner.reset(
            seed=seed, options={"box_pose": self.box_pose}
        )
        self.goal = self._sample_goal()
        return self._goal_obs(base_obs), {"is_success": False}

    def step(self, action):
        action = np.asarray(action)
        assert action.ndim == 1
        base_obs, _, _, _, _ = self._inner.step(action)
        observation = self._goal_obs(base_obs)
        info = {"is_success": False}
        reward = self.compute_reward(
            observation["achieved_goal"], observation["desired_goal"], info
        )
        success = self._is_success(
            observation["achieved_goal"], observation["desired_goal"]
        )
        info["is_success"] = success
        self.current_step += 1
        self.total_steps += 1
        truncated = False
        if self.current_step >= self.max_episode_steps:
            truncated = True
            info["TimeLimit.truncated"] = True
        return observation, float(reward), success, truncated, info

    def close(self):
        self._inner.close()
