"""Random-rollout example with video, mirroring the reference
/root/reference/scripts/example.py (1000 random steps at 64x48, mp4 of the
pixel observations) on the TPU-native env + rasterizer."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import imageio  # noqa: E402
import numpy as np  # noqa: E402

import gymnasium as gym  # noqa: E402
import gym_so100_tpu  # noqa: E402,F401


def main(steps=300, out="example_rollout.mp4"):
    env = gym.make(
        "gym_so100_tpu/SO100TouchCube-v0",
        obs_type="so100_pixels_agent_pos",
        observation_width=64,
        observation_height=48,
    )
    obs, info = env.reset(seed=42)
    frames = [obs["pixels"]]
    for i in range(steps):
        action = env.action_space.sample()
        obs, reward, terminated, truncated, info = env.step(action)
        frames.append(obs["pixels"])
        if terminated or truncated:
            obs, info = env.reset()
    imageio.mimsave(out, np.stack(frames), fps=50)
    print(f"wrote {out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
