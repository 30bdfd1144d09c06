"""Full SO100 scene trajectory parity vs MuJoCo oracle."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mujoco
from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd

XML = "/root/reference/gym_so100/assets/so100_transfer_cube.xml"
mjm = mujoco.MjModel.from_xml_path(XML)
mjd = mujoco.MjData(mjm)
t0 = time.time()
m, aux = build_model(XML, max_contacts=24)
print(f"build: {time.time()-t0:.1f}s; hull verts packed: {m.mesh_verts.shape}")

step = jax.jit(lambda s: fwd.step(m, s)[0])

def run(tag, qpos0, ctrl, nsteps):
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = qpos0; mjd.ctrl[:] = ctrl
    s = fwd.make_state(m, qpos=qpos0, ctrl=ctrl)
    t0 = time.time()
    worst = 0.0
    for i in range(nsteps):
        mujoco.mj_step(mjm, mjd)
        s = step(s)
        dq = np.abs(np.asarray(s.qpos) - mjd.qpos).max()
        worst = max(worst, dq)
        if i in (0, 10, 50, nsteps-1):
            print(f"  [{tag}] {i}: max|dq| {dq:.3e} mj_ncon {mjd.ncon} ({time.time()-t0:.0f}s)")
    print(f"  [{tag}] worst {worst:.3e}")

home = np.array(mjm.key_qpos[0])
START = [0.0, -3.32, 3.14, 1.11, 0.0, 0.0]  # SO100_START_ARM_POSE arm part
# 1: keyframe home pose, hold ctrl at arm pose, cube settles on table
run("hold", home, home[:6], 100)
# 2: servo to a different target (arm swings, cube on table)
tgt = [0.3, -1.5, 1.0, 0.2, -0.1, 0.5]
run("servo", home, tgt, 200)
