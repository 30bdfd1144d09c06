"""Dev probe: full contact step parity vs MuJoCo on a cube+table scene."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mujoco

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd

XML = """
<mujoco>
  <option cone="elliptic" impratio="10"/>
  <worldbody>
    <body name="tbl"><geom name="g1" type="box" size="0.6 0.4 0.015" pos="0 0 -0.015"
        friction="1 0.005 0.0001" solimp="0.9 0.95 0.001" solref="0.02 1"/></body>
    <body name="cube" pos="0 0 0.1"><freejoint name="cubejoint"/>
      <inertial pos="0 0 0" mass="0.05" diaginertia="1.3e-5 1.3e-5 1.3e-5"/>
      <geom name="g2" type="box" size="0.02 0.02 0.02" condim="4"
        solimp="2 1 0.01" solref="0.01 1" friction="1 0.005 0.0001"/></body>
  </worldbody>
</mujoco>
"""
path = "/tmp/twobox.xml"
open(path, "w").write(XML)

mjm = mujoco.MjModel.from_xml_path(path)
mjd = mujoco.MjData(mjm)
m, aux = build_model(path, max_contacts=8)
# add frictionloss test later; this scene has none on the free joint

step = jax.jit(lambda s: fwd.step(m, s)[0])

def run(tag, qpos, qvel, nsteps, atol_q=1e-6):
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = qpos; mjd.qvel[:] = qvel
    s = fwd.make_state(m, qpos=qpos, qvel=qvel)
    worst = 0.0
    for i in range(nsteps):
        mujoco.mj_step(mjm, mjd)
        s = step(s)
        dq = np.abs(np.asarray(s.qpos) - mjd.qpos).max()
        worst = max(worst, dq)
        if i in (0, 1, 4, nsteps//2, nsteps-1):
            print(f"  [{tag}] step {i}: max|dqpos| {dq:.3e}  z_mj {mjd.qpos[2]:.6f} z_jx {float(s.qpos[2]):.6f} ncon_mj {mjd.ncon}")
    print(f"  [{tag}] worst {worst:.3e}")
    return worst

print("== drop from 5cm, settle ==")
run("drop", [0,0,0.05,1,0,0,0], np.zeros(6), 120)

print("== resting + slide (vx=0.3) ==")
run("slide", [0,0,0.0199,1,0,0,0], [0.3,0.1,0,0,0,0], 100)

print("== spin on table (wz=5) ==")
run("spin", [0,0,0.0199,1,0,0,0], [0,0,0,0,0,5.0], 100)

print("== tossed with rotation ==")
qv = [0.2,-0.1,0.1, 2.0, 3.0, 1.0]
run("toss", [0,0,0.06,1,0,0,0], qv, 150)
