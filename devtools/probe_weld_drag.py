"""Diagnose test_oracle_weld.py::test_weld_slow_drag_tracks_target.

Runs the IDENTICAL mocap drag schedule (200 substeps, +2e-4 m z per substep)
through (a) MuJoCo mj_step on the reference EE scene and (b) our fwd.step,
and prints the final EE z lag of each.  Decides whether the 0.0254 m JAX lag
is a dynamics discrepancy or the oracle behaves the same.
"""

import numpy as np
import mujoco
import jax
import jax.numpy as jnp

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd

XML = "/root/reference/gym_so100/assets/so100_transfer_cube_ee.xml"

mjm = mujoco.MjModel.from_xml_path(XML)
mjd = mujoco.MjData(mjm)
m, _ = build_model(XML, max_contacts=24)
mujoco.mj_resetDataKeyframe(mjm, mjd, 0)
mujoco.mj_forward(mjm, mjd)

mj_ee = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_SITE, "ee_site")
ee_id = m.site_id("ee_site")

mjd.mocap_pos[0] = mjd.site_xpos[mj_ee]
q = np.zeros(4)
mujoco.mju_mat2Quat(q, mjd.site_xmat[mj_ee])
mjd.mocap_quat[0] = q

s = fwd.make_state(
    m, qpos=np.array(mjd.qpos), qvel=np.array(mjd.qvel), ctrl=np.array(mjd.ctrl)
).replace(
    mocap_pos=jnp.asarray(np.array(mjd.mocap_pos)),
    mocap_quat=jnp.asarray(np.array(mjd.mocap_quat)),
)

step = jax.jit(lambda s: fwd.step(m, s)[0])
kin = jax.jit(lambda s: fwd.smooth.kinematics(m, s).site_xpos[ee_id])

mp = np.array(mjd.mocap_pos)
traj_mj, traj_jx = [], []
for i in range(200):
    mp[0][2] += 2e-4
    mjd.mocap_pos[0] = mp[0]
    mujoco.mj_step(mjm, mjd)
    s = s.replace(mocap_pos=jnp.asarray(mp))
    s = step(s)
    if i % 25 == 24 or i == 199:
        mujoco.mj_forward(mjm, mjd)
        ee_mj = float(mjd.site_xpos[mj_ee][2])
        ee_jx = float(np.asarray(kin(s))[2])
        tgt = float(mp[0][2])
        print(
            f"i={i:3d} target_z={tgt:.4f}  mj_z={ee_mj:.4f} (lag {tgt-ee_mj:+.4f})"
            f"  jax_z={ee_jx:.4f} (lag {tgt-ee_jx:+.4f})  ncon_mj={mjd.ncon}"
        )
