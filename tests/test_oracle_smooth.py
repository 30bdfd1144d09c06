"""Parity tests: model compilation + smooth dynamics vs the MuJoCo oracle.

MuJoCo here is a *test oracle only* — the framework never imports it outside
tests.  These tests pin the JAX engine's FK / mass matrix / bias / actuation /
integration to the C engine's float64 results on the actual SO100 scene.
"""

import mujoco
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.models.scene import State
from gym_so100_tpu.ops import smooth

XML = "/root/reference/gym_so100/assets/so100_transfer_cube.xml"


@pytest.fixture(scope="module")
def mj():
    m = mujoco.MjModel.from_xml_path(XML)
    return m


@pytest.fixture(scope="module")
def model():
    m, aux = build_model(XML)
    return m, aux


def _random_state(rng, mj_model):
    """Random arm pose within limits + random cube pose, random velocities."""
    qpos = np.zeros(13)
    for i in range(6):
        lo, hi = mj_model.jnt_range[i]
        qpos[i] = rng.uniform(lo + 0.1 * (hi - lo), hi - 0.1 * (hi - lo))
    qpos[6:9] = rng.uniform([-0.3, 0.3, 0.0], [0.0, 0.7, 0.3])
    q = rng.normal(size=4)
    qpos[9:13] = q / np.linalg.norm(q)
    qvel = rng.normal(size=12) * 0.5
    ctrl = rng.uniform(mj_model.actuator_ctrlrange[:, 0], mj_model.actuator_ctrlrange[:, 1])
    return qpos, qvel, ctrl


def _jx_state(model, qpos, qvel, ctrl):
    return State(
        qpos=jnp.asarray(qpos, jnp.float64),
        qvel=jnp.asarray(qvel, jnp.float64),
        ctrl=jnp.asarray(ctrl, jnp.float64),
        mocap_pos=jnp.zeros((model.nmocap, 3)),
        mocap_quat=jnp.zeros((model.nmocap, 4)),
    )


def test_model_constants(mj, model):
    m, aux = model
    assert (m.nq, m.nv, m.nu) == (mj.nq, mj.nv, mj.nu)
    np.testing.assert_allclose(np.asarray(m.qpos0), mj.qpos0, atol=1e-12)
    # actuator gains: kp direct, kv resolved from dampratio by our compiler
    np.testing.assert_allclose(np.asarray(m.actuator_kp), mj.actuator_gainprm[:, 0])
    np.testing.assert_allclose(
        np.asarray(m.actuator_kv), -mj.actuator_biasprm[:, 2], rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(m.dof_invweight0), mj.dof_invweight0, rtol=1e-8
    )
    # body invweight0 for bodies that matter (have mass or geoms); mujoco uses
    # a quirky ipos convention for massless leaf bodies, skip those.
    for name in ["Rotation_Pitch", "Upper_Arm", "Lower_Arm", "Wrist_Pitch_Roll",
                 "Fixed_Jaw", "Moving_Jaw", "box"]:
        bi = m.body_id(name)
        mj_bi = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY, name)
        np.testing.assert_allclose(
            np.asarray(m.body_invweight0)[bi], mj.body_invweight0[mj_bi],
            rtol=1e-8, err_msg=name,
        )
    # timestep / solver options
    assert m.timestep == mj.opt.timestep
    assert m.impratio == mj.opt.impratio
    assert m.cone == "elliptic"


def test_kinematics_parity(mj, model):
    m, _ = model
    d_mj = mujoco.MjData(mj)
    rng = np.random.RandomState(0)
    kin = jax.jit(smooth.kinematics)
    for trial in range(5):
        qpos, qvel, ctrl = _random_state(rng, mj)
        d_mj.qpos[:] = qpos
        mujoco.mj_forward(mj, d_mj)
        d = kin(m, _jx_state(m, qpos, qvel, ctrl))
        for name in ["Base", "Rotation_Pitch", "Upper_Arm", "Lower_Arm",
                     "Wrist_Pitch_Roll", "Fixed_Jaw", "Moving_Jaw", "box",
                     "vx300s_left/camera_focus"]:
            bi = m.body_id(name)
            mj_bi = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY, name)
            np.testing.assert_allclose(
                np.asarray(d.xpos)[bi], d_mj.xpos[mj_bi], atol=1e-12,
                err_msg=f"xpos {name}",
            )
            # quaternions up to sign
            qa = np.asarray(d.xquat)[bi]
            qb = d_mj.xquat[mj_bi]
            assert min(np.abs(qa - qb).max(), np.abs(qa + qb).max()) < 1e-12, name
        for name in ["ee_site", "cube_site", "bin_center"]:
            si = m.site_id(name)
            mj_si = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SITE, name)
            np.testing.assert_allclose(
                np.asarray(d.site_xpos)[si], d_mj.site_xpos[mj_si], atol=1e-12,
                err_msg=f"site {name}",
            )


def test_mass_matrix_parity(mj, model):
    m, _ = model
    d_mj = mujoco.MjData(mj)
    rng = np.random.RandomState(1)
    for trial in range(5):
        qpos, qvel, ctrl = _random_state(rng, mj)
        d_mj.qpos[:] = qpos
        mujoco.mj_forward(mj, d_mj)
        M_mj = np.zeros((mj.nv, mj.nv))
        try:
            mujoco.mj_fullM(mj, M_mj, d_mj.qM)
        except TypeError:  # mujoco >= 3.10 signature (m, d, dst)
            mujoco.mj_fullM(mj, d_mj, M_mj)
        s = _jx_state(m, qpos, qvel, ctrl)
        d = smooth.kinematics(m, s)
        d, cinr = smooth.com_quantities(m, d)
        d = smooth.crba(m, d, cinr)
        np.testing.assert_allclose(np.asarray(d.qM), M_mj, atol=1e-10)


def test_bias_and_actuation_parity(mj, model):
    m, _ = model
    d_mj = mujoco.MjData(mj)
    rng = np.random.RandomState(2)
    for trial in range(5):
        qpos, qvel, ctrl = _random_state(rng, mj)
        d_mj.qpos[:] = qpos
        d_mj.qvel[:] = qvel
        d_mj.ctrl[:] = ctrl
        mujoco.mj_forward(mj, d_mj)
        s = _jx_state(m, qpos, qvel, ctrl)
        d = smooth.forward_smooth(m, s)
        np.testing.assert_allclose(
            np.asarray(d.qfrc_bias), d_mj.qfrc_bias, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(d.qfrc_actuator), d_mj.qfrc_actuator, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(d.qacc_smooth), d_mj.qacc_smooth, atol=1e-7
        )


def test_smooth_trajectory_parity(mj, model):
    """100 substeps with constraints disabled: pure smooth dynamics match."""
    m, _ = model
    mj2 = mujoco.MjModel.from_xml_path(XML)
    mj2.opt.disableflags |= (
        mujoco.mjtDisableBit.mjDSBL_CONSTRAINT | mujoco.mjtDisableBit.mjDSBL_CONTACT
    )
    d_mj = mujoco.MjData(mj2)
    qpos = np.array(mj.qpos0)
    qpos[:6] = [0.0, -0.96, 1.16, 0.0, 0.0, 0.02239]
    qpos[6:9] = [-0.2, 0.45, 0.3]  # cube in the air (no contact relevant)
    d_mj.qpos[:] = qpos
    d_mj.ctrl[:] = [0.3, -1.5, 1.0, 0.2, -0.1, 0.5]

    s = _jx_state(m, qpos, np.zeros(12), np.asarray(d_mj.ctrl))

    @jax.jit
    def substep(s):
        d = smooth.forward_smooth(m, s)
        return smooth.integrate(m, s, d.qacc_smooth)

    for i in range(100):
        mujoco.mj_step(mj2, d_mj)
        s = substep(s)
    np.testing.assert_allclose(np.asarray(s.qpos), d_mj.qpos, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s.qvel), d_mj.qvel, atol=1e-8)
