"""End-effector mocap teleop: keys move the weld target, the constraint
solver does implicit IK.

Terminal port of /root/reference/scripts/teleop_ee.py (which drives
mujoco.viewer; this image has no display): wasd/rf translate the mocap
target, q/e yaw it, o/p open/close the gripper via ctrl[5]
(teleop_ee.py:44-120).  --video writes frames from the rasterizer."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gym_so100_tpu.envs.gym_env import _cached_model  # noqa: E402
from gym_so100_tpu.ops import forward as fwd  # noqa: E402
from gym_so100_tpu.ops import quat as quat_ops  # noqa: E402
from gym_so100_tpu.teleop.input import KeyboardController  # noqa: E402

from gym_so100_tpu.envs.gym_env import ASSETS_DIR  # noqa: E402

EE_XML = os.path.join(ASSETS_DIR, "so100_transfer_cube_ee.xml")
STEP = 0.004  # m per tick
ROT = 0.05   # rad per tick


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default=None)
    p.add_argument("--seconds", type=float, default=60.0)
    args = p.parse_args()

    m, aux = _cached_model(EE_XML, "float32")
    ee = m.site_id("ee_site")
    step = jax.jit(lambda s: fwd.n_steps(m, s, 10))
    kin = jax.jit(lambda s: fwd.smooth.kinematics(m, s).site_xpos[ee])

    s = fwd.make_state(m, dtype=jnp.float32)
    # start the target at the ee
    s = s.replace(mocap_pos=jnp.asarray(np.asarray(kin(s))[None]))
    frames = []
    renderer = None
    if args.video:
        from gym_so100_tpu.render.rasterizer import Renderer

        renderer = Renderer(m, aux)

    print("wasd: xy move, r/f: up/down, q/e: yaw, o/p: gripper, x: quit")
    # KeyboardController is used only as the cbreak-mode context manager;
    # its update() must NOT run here — it owns a different keymap (q=quit,
    # x=joint key) that would shadow this script's documented bindings.
    import select
    import sys as _sys

    with KeyboardController() as ctl:
        t_end = time.time() + args.seconds
        running = True
        while time.time() < t_end and running:
            dp = np.zeros(3, np.float32)
            dyaw = 0.0
            grip = None
            keys = ""
            while select.select([_sys.stdin], [], [], 0)[0]:
                keys += _sys.stdin.read(1)
            for ch in keys:
                if ch == "w":
                    dp[1] += STEP
                elif ch == "s":
                    dp[1] -= STEP
                elif ch == "a":
                    dp[0] -= STEP
                elif ch == "d":
                    dp[0] += STEP
                elif ch == "r":
                    dp[2] += STEP
                elif ch == "f":
                    dp[2] -= STEP
                elif ch == "q":
                    dyaw += ROT
                elif ch == "e":
                    dyaw -= ROT
                elif ch == "o":
                    grip = 1.75
                elif ch == "p":
                    grip = -0.174
                elif ch == "x":
                    running = False
            mp = s.mocap_pos + jnp.asarray(dp)[None]
            mq = s.mocap_quat
            if dyaw:
                rot = jnp.asarray(
                    [np.cos(dyaw / 2), 0, 0, np.sin(dyaw / 2)], jnp.float32
                )
                mq = quat_ops.mul(rot[None], mq)
            ctrl = s.ctrl
            if grip is not None:
                ctrl = ctrl.at[5].set(grip)
            s = s.replace(mocap_pos=mp, mocap_quat=mq, ctrl=ctrl)
            s = step(s)
            eep = np.asarray(kin(s))
            print(f"\ree {eep.round(3)} target {np.asarray(mp[0]).round(3)}  ",
                  end="", flush=True)
            if renderer is not None:
                frames.append(np.asarray(renderer.render(s, 240, 320, "top")))
            time.sleep(0.02)
    if args.video and frames:
        import imageio

        imageio.mimsave(args.video, np.stack(frames), fps=50)
        print(f"\nwrote {args.video}")


if __name__ == "__main__":
    main()
