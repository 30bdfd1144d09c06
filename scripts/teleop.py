"""Joint-space keyboard teleop (terminal counterpart of the reference's
mujoco-viewer loop, /root/reference/scripts/teleop.py:13-66).

Keys nudge a normalized [-1, 1] pose per joint (a/z s/x d/c f/v g/b h/n, as
in the recorder's KeyJointController); the pose is unnormalized to radians
and applied as the position-servo ctrl each 0.02 s control step.  No display
in this image, so state prints to the terminal; --video writes rasterizer
frames.

  python scripts/teleop.py --seconds 60 --video teleop.mp4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gym_so100_tpu.envs import constants as C  # noqa: E402
from gym_so100_tpu.envs.gym_env import ASSETS_XML, _cached_model  # noqa: E402
from gym_so100_tpu.ops import forward as fwd  # noqa: E402
from gym_so100_tpu.teleop.input import KeyboardController  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default=None)
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--step", type=float, default=0.05,
                   help="normalized pose delta per key press")
    args = p.parse_args()

    m, aux = _cached_model(ASSETS_XML, "float32")
    step = jax.jit(lambda s: fwd.n_steps(m, s, C.N_SUBSTEPS))

    pose = np.asarray(
        C.normalize_so100(jnp.asarray(C.SO100_START_ARM_POSE)), np.float32
    )
    s = fwd.make_state(
        m, ctrl=jnp.asarray(C.SO100_START_ARM_POSE, jnp.float32),
        dtype=jnp.float32,
    )
    frames = []
    renderer = None
    if args.video:
        from gym_so100_tpu.render.rasterizer import Renderer

        renderer = Renderer(m, aux)

    print("keys: a/z s/x d/c f/v g/b h/n nudge joints 1-6, q quits")
    with KeyboardController(step=args.step) as ctl:
        t_end = time.time() + args.seconds
        while time.time() < t_end and ctl.running:
            ctl.update()
            if any(ctl.joint_deltas):
                pose = np.clip(pose + np.asarray(ctl.joint_deltas), -1, 1)
            ctrl = np.asarray(C.unnormalize_so100(jnp.asarray(pose)))
            s = s.replace(ctrl=jnp.asarray(ctrl, jnp.float32))
            s = step(s)
            q = np.asarray(s.qpos[:6])
            print(f"\rqpos {np.round(q, 3)}  ctrl {np.round(ctrl, 3)}   ",
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
