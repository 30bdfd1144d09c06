"""Convert recorded demo pickles to a LeRobotDataset (optionally push).

CLI counterpart of /root/reference/scripts/upload_lerobot_demos.py:104-222
(same feature schema: top video, 6-dim state/action in LeRobot units,
next.reward, next.success := reward >= 4, seed, timestamp) over the interop
module.

  python scripts/upload_lerobot_demos.py demos/*.pkl --repo-id user/so100 \
      --push
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gym_so100_tpu.interop import lerobot as interop  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("demos", nargs="+", help="demo pickle files")
    p.add_argument("--repo-id", required=True)
    p.add_argument("--fps", type=int, default=50)
    p.add_argument("--push", action="store_true",
                   help="push_to_hub after conversion")
    p.add_argument("--task-text", default="Put the red cube into the bin")
    args = p.parse_args()

    ds = interop.demos_to_lerobot_dataset(
        args.demos, args.repo_id, fps=args.fps, push=args.push,
        task_text=args.task_text,
    )
    print(f"dataset {args.repo_id}: {ds.num_episodes} episodes, "
          f"{ds.num_frames} frames" + ("  (pushed)" if args.push else ""))


if __name__ == "__main__":
    main()
