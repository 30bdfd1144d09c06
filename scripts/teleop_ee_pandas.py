"""End-effector mocap teleop for the Franka Panda EE scene.

Terminal port of /root/reference/scripts/teleop_ee_pandas.py:109-144 (which
drives mujoco.viewer; this image has no display): wasd/rf translate the weld
target, q/e yaw it, o/p open/close the gripper via ctrl[7], x quits.  The
constraint solver does implicit IK through the mocap weld
(franka_emika_panda/panda_ee.xml equality/weld); the general-actuator affine
gain/bias tables and the finger-coupling joint equality compile natively.
Prints the model diagnostics dump the reference script shows on startup.
"""

import argparse
import os
import select
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gym_so100_tpu.envs.gym_env import ASSETS_DIR, _cached_model  # noqa: E402
from gym_so100_tpu.ops import forward as fwd  # noqa: E402
from gym_so100_tpu.ops import quat as quat_ops  # noqa: E402
from gym_so100_tpu.teleop.input import KeyboardController  # noqa: E402

EE_XML = os.path.join(ASSETS_DIR, "pandas_transfer_cube_ee.xml")
STEP = 0.004  # m per tick
ROT = 0.05    # rad per tick
GRIP_OPEN = 0.4
GRIP_CLOSE = -0.4


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default=None)
    p.add_argument("--seconds", type=float, default=60.0)
    args = p.parse_args()

    m, aux = _cached_model(EE_XML, "float32")
    # model diagnostics (the reference dumps these, teleop_ee_pandas.py:109-144)
    print(f"model: {m.nbody} bodies, {m.nv} dofs, {m.nu} actuators, "
          f"{m.ngeom} geoms")
    print("actuators:", list(m.names_actuator))
    print("joints:", list(m.names_joint))

    ee = m.site_id("ee_site")
    step = jax.jit(lambda s: fwd.n_steps(m, s, 10))
    kin = jax.jit(lambda s: fwd.smooth.kinematics(m, s).site_xpos[ee])

    kq, kc = aux["keyframes"]["home"]
    s = fwd.make_state(m, qpos=kq, ctrl=kc, dtype=jnp.float32)
    s = s.replace(mocap_pos=jnp.asarray(np.asarray(kin(s))[None]))
    frames = []
    renderer = None
    if args.video:
        from gym_so100_tpu.render.rasterizer import Renderer

        renderer = Renderer(m, aux)

    print("wasd: xy move, r/f: up/down, q/e: yaw, o/p: gripper, x: quit")
    with KeyboardController():
        t_end = time.time() + args.seconds
        running = True
        while time.time() < t_end and running:
            dp = np.zeros(3, np.float32)
            dyaw = 0.0
            grip = None
            keys = ""
            while select.select([sys.stdin], [], [], 0)[0]:
                keys += sys.stdin.read(1)
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
                    grip = GRIP_OPEN
                elif ch == "p":
                    grip = GRIP_CLOSE
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
                ctrl = ctrl.at[7].set(grip)  # gripper (teleop_ee_pandas.py)
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
