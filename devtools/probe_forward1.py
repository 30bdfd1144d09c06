"""Single-state forward parity: qacc + efc rows vs mj_forward."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mujoco

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth, constraint as cns, solver as slv
from gym_so100_tpu.ops.collision import narrowphase

np.set_printoptions(precision=8, suppress=True, linewidth=250)
path = "/tmp/twobox.xml"
mjm = mujoco.MjModel.from_xml_path(path)
mjd = mujoco.MjData(mjm)
m, aux = build_model(path, max_contacts=8)

def compare(qpos, qvel, label, verbose=False):
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = qpos; mjd.qvel[:] = qvel
    mujoco.mj_forward(mjm, mjd)
    s = fwd.make_state(m, qpos=qpos, qvel=qvel)
    d = fwd.forward(m, s)
    dq = np.abs(np.asarray(d.qacc) - mjd.qacc).max()
    print(f"[{label}] max|dqacc| {dq:.3e}  niter_jx {int(d.solver_niter)} mj_niter {mjd.solver_niter[0]}")
    if dq > 1e-6 or verbose:
        print("  qacc_mj", mjd.qacc)
        print("  qacc_jx", np.asarray(d.qacc))
        print("  mj ncon", mjd.ncon, "nefc", mjd.nefc)
        act = np.asarray(d.contact.active)
        print("  jx ncon", act.sum())
        for c in range(mjd.ncon):
            con = mjd.contact[c]
            print("   mj con", con.geom1, con.geom2, "dist", f"{con.dist:.6e}", "pos", np.round(con.pos,6))
        for k in range(len(act)):
            if act[k]:
                print("   jx con", int(d.contact.geom1[k]), int(d.contact.geom2[k]),
                      "dist", f"{float(d.contact.dist[k]):.6e}", "pos", np.round(np.asarray(d.contact.pos[k]),6))
        print("  mj efc_force", mjd.efc_force[:mjd.nefc])
        print("  mj efc_aref", mjd.efc_aref[:mjd.nefc])
        print("  mj efc_D", mjd.efc_D[:mjd.nefc])
        efc = cns.make_efc(m, d, s, d.contact)
        jar = np.asarray(efc.J) @ np.asarray(d.qacc) - np.asarray(efc.aref)
        _, gs, _, gc, _, _ = slv._cost_terms(efc, jnp.asarray(jar))
        force = -np.concatenate([np.asarray(gs), np.asarray(gc).reshape(-1)])
        nz = np.abs(force) > 1e-12
        print("  jx efc_force(act)", force[nz])
        print("  jx efc_aref(act)", np.asarray(efc.aref)[nz])
        print("  jx efc_D(act)", np.asarray(efc.D)[nz])
    return dq

# resting, touching
compare([0,0,0.0199,1,0,0,0], [0,0,0,0,0,0], "rest")
# sliding
compare([0,0,0.0199,1,0,0,0], [0.3,0.1,0,0,0,0], "slide")
# impact (falling onto surface, penetrating)
compare([0,0,0.01995,1,0,0,0], [0,0,-0.9,0,0,0], "impact")
# spinning
compare([0,0,0.0199,1,0,0,0], [0,0,0,0,0,5.0], "spin")
# separating
compare([0,0,0.0199,1,0,0,0], [0,0,0.5,0,0,0], "separate")
# tilted contact
from scipy.spatial.transform import Rotation as R
q = R.from_euler('x', 20, degrees=True).as_quat()
compare([0,0,0.024, q[3],q[0],q[1],q[2]], [0.1,0,0,1.0,0,0], "tilted")
