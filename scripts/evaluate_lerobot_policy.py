"""Evaluate a pretrained LeRobot policy (ACT / Diffusion / PI0FAST / SmolVLA)
on the TPU-native env.

CLI counterpart of /root/reference/scripts/evaluate_lerobot_policy.py:11-153
over the interop module (policy loading, obs-dict construction, optional
gym<->LeRobot unit conversion, rollout + video + reward stats).

  python scripts/evaluate_lerobot_policy.py act lerobot/act_so100 \
      --episodes 5 --video eval.mp4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import gymnasium as gym  # noqa: E402
import gym_so100_tpu  # noqa: E402,F401
from gym_so100_tpu.interop import lerobot as interop  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["act", "diffusion", "pi0fast", "smolvla"])
    p.add_argument("path_or_repo")
    p.add_argument("--task", default="SO100CubeToBin-v0")
    p.add_argument("--episodes", type=int, default=5)
    p.add_argument("--video", default=None)
    p.add_argument(
        "--no-unit-conversion", action="store_true",
        help="skip the gym<->LeRobot +-100 unit conversion "
        "(evaluate_lerobot_policy.py:77-117)",
    )
    p.add_argument("--task-text", default="Put the red cube into the bin")
    p.add_argument("--obs-width", type=int, default=640)
    p.add_argument("--obs-height", type=int, default=480)
    args = p.parse_args()

    policy = interop.load_pretrained_policy(args.kind, args.path_or_repo)
    env = gym.make(
        f"gym_so100_tpu/{args.task}",
        obs_type="so100_pixels_agent_pos",
        observation_width=args.obs_width,
        observation_height=args.obs_height,
    )
    stats = interop.rollout_policy(
        policy, env,
        episodes=args.episodes,
        lerobot_units=not args.no_unit_conversion,
        task_text=args.task_text if args.kind in ("pi0fast", "smolvla") else None,
        video_path=args.video,
    )
    print(f"mean return {np.mean(stats['returns']):.2f}  "
          f"success rate {np.mean(stats['successes']):.2f}")


if __name__ == "__main__":
    main()
