"""Parity tests: collision + constraint solver vs the MuJoCo oracle.

Covers the full mj_step-equivalent pipeline (smooth dynamics -> narrowphase ->
efc assembly -> Newton elliptic-cone solve -> Euler) on (a) an isolated
cube/table scene exercising every contact regime (impact, slide, spin, toss)
and (b) the complete SO100 transfer-cube scene (arm servo + cube resting).

Tolerances are trajectory-level: the solver terminates at MuJoCo's scaled
1e-8 improvement criterion, so matched trajectories agree to ~1e-9 per step.
"""

import dataclasses

import mujoco
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd

XML = "/root/reference/gym_so100/assets/so100_transfer_cube.xml"

TWOBOX = """
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


@pytest.fixture(scope="module")
def twobox(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("xml") / "twobox.xml")
    open(path, "w").write(TWOBOX)
    mjm = mujoco.MjModel.from_xml_path(path)
    m, _ = build_model(path, max_contacts=8)
    return mjm, m


def _rollout_compare(mjm, m, qpos, qvel, nsteps, ctrl=None):
    mjd = mujoco.MjData(mjm)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    if ctrl is not None:
        mjd.ctrl[:] = ctrl
    s = fwd.make_state(m, qpos=qpos, qvel=qvel, ctrl=ctrl)
    step = jax.jit(lambda s: fwd.step(m, s)[0])
    worst = 0.0
    for _ in range(nsteps):
        mujoco.mj_step(mjm, mjd)
        s = step(s)
        worst = max(worst, float(np.abs(np.asarray(s.qpos) - mjd.qpos).max()))
    return worst


@pytest.mark.parametrize(
    "qpos,qvel,nsteps,tol",
    [
        # drop from 5 cm: impact + settle
        ([0, 0, 0.05, 1, 0, 0, 0], [0, 0, 0, 0, 0, 0], 120, 1e-9),
        # resting + tangential slide (friction cone middle zone)
        ([0, 0, 0.0199, 1, 0, 0, 0], [0.3, 0.1, 0, 0, 0, 0], 100, 1e-8),
        # torsional spin on the table (condim 4)
        ([0, 0, 0.0199, 1, 0, 0, 0], [0, 0, 0, 0, 0, 5.0], 100, 1e-9),
        # tumbling toss: edge/corner impacts
        ([0, 0, 0.06, 1, 0, 0, 0], [0.2, -0.1, 0.1, 2.0, 3.0, 1.0], 150, 1e-6),
    ],
    ids=["drop", "slide", "spin", "toss"],
)
def test_twobox_trajectory_parity(twobox, qpos, qvel, nsteps, tol):
    mjm, m = twobox
    worst = _rollout_compare(mjm, m, qpos, qvel, nsteps)
    assert worst < tol, worst


def test_full_scene_trajectory_parity():
    """Complete SO100 scene: servo the arm from the home keyframe while the
    cube settles on the table; lockstep vs mj_step."""
    mjm = mujoco.MjModel.from_xml_path(XML)
    m, _ = build_model(XML, max_contacts=24)
    home = np.array(mjm.key_qpos[0])
    tgt = [0.3, -1.5, 1.0, 0.2, -0.1, 0.5]
    worst = _rollout_compare(mjm, m, home, np.zeros(mjm.nv), 80, ctrl=tgt)
    assert worst < 1e-8, worst


def test_solver_qacc_parity(twobox):
    """Single-state forward: qacc matches mj_forward across contact regimes."""
    mjm, m = twobox
    mjd = mujoco.MjData(mjm)
    cases = [
        ([0, 0, 0.0199, 1, 0, 0, 0], [0, 0, 0, 0, 0, 0]),       # rest
        ([0, 0, 0.01995, 1, 0, 0, 0], [0, 0, -0.9, 0, 0, 0]),    # impact
        ([0, 0, 0.0199, 1, 0, 0, 0], [0, 0, 0, 0, 0, 5.0]),      # spin
        ([0, 0, 0.0199, 1, 0, 0, 0], [0, 0, 0.5, 0, 0, 0]),      # separate
    ]
    forward = jax.jit(lambda s: fwd.forward(m, s).qacc)
    for qpos, qvel in cases:
        mujoco.mj_resetData(mjm, mjd)
        mjd.qpos[:] = qpos
        mjd.qvel[:] = qvel
        mujoco.mj_forward(mjm, mjd)
        qacc = forward(fwd.make_state(m, qpos=qpos, qvel=qvel))
        np.testing.assert_allclose(np.asarray(qacc), mjd.qacc, atol=5e-4)


def test_float32_contact_stability(twobox):
    """f32 (the TPU throughput dtype) must keep the cube on the table."""
    _, m = twobox
    m32 = m.astype(jnp.float32)
    step = jax.jit(lambda s: fwd.n_steps(m32, s, 10))
    s = fwd.make_state(m32, qpos=np.array([0, 0, 0.05, 1, 0, 0, 0]), dtype=jnp.float32)
    for _ in range(50):
        s = step(s)
    z = float(s.qpos[2])
    assert 0.019 < z < 0.021, z
