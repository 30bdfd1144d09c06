"""Dev probe: box-box narrowphase vs MuJoCo oracle on assorted poses."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mujoco
from gym_so100_tpu.ops.collision.boxbox import box_box

# standalone two-box model for controlled experiments
XML = """
<mujoco>
  <option cone="elliptic" impratio="10"/>
  <worldbody>
    <body name="b1"><geom name="g1" type="box" size="0.6 0.4 0.015" pos="0 0 -0.015"/></body>
    <body name="b2" pos="0 0 0.1"><freejoint/>
      <inertial pos="0 0 0" mass="0.05" diaginertia="1e-5 1e-5 1e-5"/>
      <geom name="g2" type="box" size="0.02 0.02 0.02" condim="4"/></body>
  </worldbody>
</mujoco>
"""
m = mujoco.MjModel.from_xml_string(XML)
d = mujoco.MjData(m)

def compare(qpos, label):
    d.qpos[:] = qpos
    mujoco.mj_forward(m, d)
    p1 = jnp.asarray(d.geom_xpos[0]); R1 = jnp.asarray(d.geom_xmat[0].reshape(3,3)); s1 = jnp.asarray(m.geom_size[0])
    p2 = jnp.asarray(d.geom_xpos[1]); R2 = jnp.asarray(d.geom_xmat[1].reshape(3,3)); s2 = jnp.asarray(m.geom_size[1])
    out = box_box(p1, R1, s1, p2, R2, s2)
    act = np.asarray(out["active"])
    print(f"== {label}: oracle ncon={d.ncon} mine={act.sum()}")
    oc = sorted([(round(d.contact[c].pos[0],4), round(d.contact[c].pos[1],4), round(d.contact[c].pos[2],4), round(d.contact[c].dist,7)) for c in range(d.ncon)])
    mc = sorted([(round(float(out["pos"][k,0]),4), round(float(out["pos"][k,1]),4), round(float(out["pos"][k,2]),4), round(float(out["depth"][k]),7)) for k in range(8) if act[k]])
    for c in oc: print("  o", c, "n", np.round(np.array(d.contact[0].frame)[:3],3) if d.ncon else None)
    for c in mc: print("  m", c, "n", np.round(np.asarray(out["normal"]),3))

# flat rest, slight penetration
compare([0.1, 0.05, 0.0199, 1,0,0,0], "flat rest")
# rotated 45 deg about z (face-face still)
q45 = [np.cos(np.pi/8),0,0,np.sin(np.pi/8)]
compare([0.1, 0.05, 0.0195] + q45, "rot45 z")
# tilted about x by 30 deg -> edge contact with table top
qx = [np.cos(np.pi/12),np.sin(np.pi/12),0,0]
compare([0.1, 0.05, 0.024] + qx, "tilt30 x edge")
# corner contact: tilt about x and y
from scipy.spatial.transform import Rotation as R
q = R.from_euler('xy', [25, 25], degrees=True).as_quat()  # xyzw
compare([0.1, 0.05, 0.028, q[3], q[0], q[1], q[2]], "corner")
# deep penetration
compare([0.1, 0.05, 0.015, 1,0,0,0], "deep flat")
# separated
compare([0.1, 0.05, 0.05, 1,0,0,0], "separated")
