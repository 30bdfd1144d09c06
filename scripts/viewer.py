"""Interactive browser viewer: the headless-native `mujoco.viewer` analog.

The reference's interactive viewers (/root/reference/scripts/teleop.py:63,
teleop_ee.py:117) call `mujoco.viewer.launch_passive`, which needs GLFW and
a display.  This is the TPU-native equivalent for headless hosts: a tiny
stdlib HTTP server streams the on-device rasterizer as MJPEG to any
browser, and key presses in the page drive the same normalized joint
targets as scripts/teleop.py (the host only orchestrates; physics and
rendering stay jitted on the accelerator).

    python scripts/viewer.py --port 8000            # joint-space SO100
    python scripts/viewer.py --ee                   # EE mocap scene
    open http://localhost:8000

Keys (joint mode, teleop.py's map): a/z s/x d/c f/v g/b h/n nudge joints
1-6; 0 re-centers.  EE mode: arrows/+- move the weld target, o/p gripper.
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--ee", action="store_true", help="EE mocap-weld scene")
    p.add_argument("--camera", default="top")
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--fps", type=float, default=15.0)
    args = p.parse_args()

    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from gym_so100_tpu.envs import constants as C  # noqa: E402
    from gym_so100_tpu.envs.gym_env import ASSETS_DIR, _cached_model  # noqa: E402
    from gym_so100_tpu.ops import forward as fwd  # noqa: E402
    from gym_so100_tpu.render.rasterizer import Renderer  # noqa: E402

    xml = os.path.join(
        ASSETS_DIR,
        "so100_transfer_cube_ee.xml" if args.ee else "so100_transfer_cube.xml",
    )
    m, aux = _cached_model(xml, "float32")
    renderer = Renderer(m, aux)
    step = jax.jit(lambda s: fwd.n_steps(m, s, C.N_SUBSTEPS))

    lock = threading.Lock()
    state = {"pose": np.zeros(6, np.float32)}  # normalized joint targets
    start = np.asarray(C.normalize_so100(np.asarray(C.SO100_START_ARM_POSE)))
    state["pose"][:] = start
    s = fwd.make_state(m, dtype=jnp.float32)
    if args.ee:
        from gym_so100_tpu.ops import smooth  # noqa: E402

        d0 = fwd.smooth.kinematics(m, s)
        ee = m.site_id("ee_site")
        s = s.replace(mocap_pos=jnp.asarray(np.asarray(d0.site_xpos[ee]))[None])
    state["s"] = s

    KEYMAP = {  # scripts/teleop.py key -> (joint, sign)
        "a": (0, +1), "z": (0, -1), "s": (1, +1), "x": (1, -1),
        "d": (2, +1), "c": (2, -1), "f": (3, +1), "v": (3, -1),
        "g": (4, +1), "b": (4, -1), "h": (5, +1), "n": (5, -1),
    }
    EE_KEYS = {  # teleop_ee.py arrows/+- -> mocap delta
        "ArrowUp": (2, +0.01), "ArrowDown": (2, -0.01),
        "ArrowRight": (0, +0.01), "ArrowLeft": (0, -0.01),
        "+": (1, +0.01), "-": (1, -0.01), "=": (1, +0.01),
    }

    def on_key(key):
        with lock:
            s = state["s"]
            if args.ee:
                if key in EE_KEYS:
                    ax, dlt = EE_KEYS[key]
                    mp = np.asarray(s.mocap_pos)
                    mp[0][ax] += dlt
                    state["s"] = s.replace(mocap_pos=jnp.asarray(mp))
                elif key in ("o", "p"):
                    ctrl = np.asarray(s.ctrl)
                    ctrl[5] += 0.05 if key == "o" else -0.05
                    state["s"] = s.replace(ctrl=jnp.asarray(ctrl))
            else:
                if key in KEYMAP:
                    j, sg = KEYMAP[key]
                    state["pose"][j] = float(
                        np.clip(state["pose"][j] + sg * 0.05, -1, 1)
                    )
                elif key == "0":
                    state["pose"][:] = start

    from gym_so100_tpu.render.mjpeg import MjpegServer  # noqa: E402

    server = MjpegServer(
        port=args.port, fps=args.fps,
        title=(
            f"gym_so100_tpu — "
            f"{'EE mocap' if args.ee else 'joint-space'} viewer "
            f"(camera: {args.camera})"
        ),
        help_text=("arrows/+-: move target, o/p: gripper" if args.ee
                   else "a/z s/x d/c f/v g/b h/n: joints, 0: home"),
        key_handler=on_key,
    )

    def sim_loop():
        dt = 1.0 / args.fps
        while True:
            t0 = time.time()
            with lock:
                s = state["s"]
                if not args.ee:
                    ctrl = np.asarray(
                        C.unnormalize_so100(state["pose"]), np.float32
                    )
                    s = s.replace(ctrl=jnp.asarray(ctrl))
            s2 = step(s)
            frame = np.asarray(
                renderer.render(s2, args.height, args.width, args.camera)
            )
            with lock:
                state["s"] = s2
            server.publish(frame)
            time.sleep(max(0.0, dt - (time.time() - t0)))

    threading.Thread(target=sim_loop, daemon=True).start()
    print(f"viewer: http://localhost:{args.port}  (ctrl-c to quit)", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
