"""Record teleoperation demonstrations to the reference's pickle format.

Terminal-based port of /root/reference/scripts/record_teleop.py: joint-space
teleop with keyboard (or gamepad when HID hardware exists), episodes saved
as a pickle list of {observations, actions, rewards, infos} dicts — the
exact format the BC trainer and LeRobot uploader consume
(record_teleop.py:158-494).  The reference's live cv2 camera window is
replaced by --watch: a browser MJPEG stream of the on-device rasterizer
(open http://localhost:<port> while recording; browser keydowns drive the
same teleop/endcode keys as the terminal).  Add --video to also write an
mp4 per episode."""

import argparse
import os
import pickle
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import gymnasium as gym  # noqa: E402
import gym_so100_tpu  # noqa: E402,F401
from gym_so100_tpu.envs.constants import SO100_START_ARM_POSE, normalize_so100  # noqa: E402
from gym_so100_tpu.teleop.input import (  # noqa: E402
    GamepadControllerHID,
    KeyboardController,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="SO100CubeToBin-v0")
    p.add_argument("--out", default="demos.pkl")
    p.add_argument("--episodes", type=int, default=10)
    p.add_argument("--video", action="store_true")
    p.add_argument("--gamepad", action="store_true")
    p.add_argument(
        "--watch", type=int, nargs="?", const=8000, default=None,
        metavar="PORT",
        help="stream the camera view to a browser while recording "
        "(the reference's live cv2 window, record_teleop.py:158-494)",
    )
    args = p.parse_args()

    env = gym.make(f"gym_so100_tpu/{args.task}", obs_type="so100_state")
    demos = []

    def flush(*_):
        if demos:
            with open(args.out, "wb") as f:
                pickle.dump(demos, f)
            print(f"\nsaved {len(demos)} episodes to {args.out}")
        sys.exit(0)

    signal.signal(signal.SIGINT, flush)

    ctrl_cls = GamepadControllerHID if args.gamepad else KeyboardController
    with ctrl_cls() as ctl:
        server = None
        if args.watch is not None:
            from gym_so100_tpu.render.mjpeg import MjpegServer

            server = MjpegServer(
                port=args.watch, fps=15.0,
                title="gym_so100_tpu — recording",
                help_text="a/z s/x d/c f/v g/b h/n: joints; 1=success "
                "2=failure 3=rerecord q=quit",
                key_handler=getattr(ctl, "inject", None),
            ).start()
            print(f"watch: http://localhost:{server.port}")
        print("keys: a/z s/x d/c f/v g/b h/n joints; 1=success 2=failure "
              "3=rerecord q=quit")
        for ep in range(args.episodes):
            obs, info = env.reset(seed=ep)
            state = np.asarray(normalize_so100(SO100_START_ARM_POSE), np.float32)
            episode = dict(observations=[obs], actions=[], rewards=[], infos=[])
            frames = []
            ctl.episode_end_status = None
            while ctl.episode_end_status is None and ctl.running:
                ctl.update()
                if hasattr(ctl, "joint_deltas"):
                    state = np.clip(state + np.asarray(ctl.joint_deltas), -1, 1)
                obs, reward, term, trunc, info = env.step(state)
                episode["observations"].append(obs)
                episode["actions"].append(state.copy())
                episode["rewards"].append(reward)
                episode["infos"].append(info)
                if args.video or server is not None:
                    frame = np.asarray(env.render())
                    if args.video:
                        frames.append(frame)
                    if server is not None:
                        server.publish(frame)
                print(
                    f"\rep {ep} t={len(episode['actions'])} r={reward:+.3f} ",
                    end="", flush=True,
                )
                time.sleep(0.02)
                if term or trunc:
                    break
            if not ctl.running:
                break
            if ctl.episode_end_status == "rerecord_episode":
                print(f"\nrerecording episode {ep}")
                continue
            episode["success"] = ctl.episode_end_status == "success"
            demos.append(episode)
            if args.video and frames:
                import imageio

                imageio.mimsave(f"teleop_ep{ep}.mp4", np.stack(frames), fps=50)
    flush()


if __name__ == "__main__":
    main()
