"""Fast smoke tier (<60 s): unit math + one tiny physics substep.

Run with `pytest -m "not slow"` — everything compile-heavy or
full-trajectory is marked slow in its own module; this file is the quick
gate.  Mirrors the reference's unit-test shape (tests/test_constants.py:6-35
— pure-function scaling tests) plus a minimal two-box contact substep so the
physics pipeline itself gets exercised in the quick tier.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gym_so100_tpu.envs import constants as C


# -- action scaling (reference constants.py:44-96 semantics) ----------------


def test_unnormalize_endpoints_and_midpoint():
    lo = np.asarray(C.JOINT_RANGES[:, 0], np.float64)
    hi = np.asarray(C.JOINT_RANGES[:, 1], np.float64)
    np.testing.assert_allclose(C.unnormalize_so100(-np.ones(6)), lo, atol=1e-12)
    np.testing.assert_allclose(C.unnormalize_so100(np.ones(6)), hi, atol=1e-12)
    np.testing.assert_allclose(
        C.unnormalize_so100(np.zeros(6)), (lo + hi) / 2, atol=1e-12
    )


def test_unnormalize_clips_out_of_range():
    lo = np.asarray(C.JOINT_RANGES[:, 0], np.float64)
    hi = np.asarray(C.JOINT_RANGES[:, 1], np.float64)
    np.testing.assert_allclose(C.unnormalize_so100(-5 * np.ones(6)), lo)
    np.testing.assert_allclose(C.unnormalize_so100(5 * np.ones(6)), hi)


def test_normalize_roundtrip():
    rng = np.random.RandomState(0)
    a = rng.uniform(-1, 1, 6)
    np.testing.assert_allclose(
        C.normalize_so100(C.unnormalize_so100(a)), a, atol=1e-12
    )


def test_lerobot_unit_roundtrip():
    # radians -> LeRobot +-100 units -> [-1,1] normalized -> radians
    rng = np.random.RandomState(1)
    q = C.unnormalize_so100(rng.uniform(-1, 1, 6))
    back = C.unnormalize_so100(
        C.normalize_lerobot_to_gym_so100(C.normalize_gym_so100_to_lerobot(q))
    )
    np.testing.assert_allclose(back, q, atol=1e-10)


def test_spawn_sampler_matches_reference_randomstate_stream():
    """sample_so100_box_pose reproduces the reference's exact RandomState
    stream (utils.py:18-29): fresh RandomState(seed) per call, uniform
    x in [-0.25,-0.15], y in [0.3,0.6], z=0.05, identity quat."""
    for seed in (0, 7, 123):
        got = C.sample_so100_box_pose_np(seed)
        rs = np.random.RandomState(seed)
        x = rs.uniform(-0.25, -0.15)
        y = rs.uniform(0.3, 0.6)
        np.testing.assert_allclose(got, [x, y, 0.05, 1, 0, 0, 0], atol=1e-15)


# -- quaternion math ---------------------------------------------------------


def test_quat_ops_against_numpy():
    from gym_so100_tpu.ops import quat as Q

    rng = np.random.RandomState(2)
    q = rng.randn(4)
    q = q / np.linalg.norm(q)
    v = rng.randn(3)
    R = np.asarray(Q.to_mat(jnp.asarray(q)))
    # rotation matrix is orthonormal with det 1
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(R) - 1) < 1e-12
    # rotate == matrix multiply
    np.testing.assert_allclose(
        np.asarray(Q.rotate(jnp.asarray(q), jnp.asarray(v))), R @ v, atol=1e-12
    )


# -- normalizer (VecNormalize-equivalent Welford update) ---------------------


def test_normalizer_matches_batch_moments():
    from gym_so100_tpu.agents.sac import Normalizer

    rng = np.random.RandomState(3)
    data = rng.randn(512, 5).astype(np.float32) * 3 + 1
    n = Normalizer.create(5)
    for i in range(0, 512, 64):
        n = n.update(jnp.asarray(data[i : i + 64]))
    np.testing.assert_allclose(np.asarray(n.mean), data.mean(0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(n.var), data.var(0), rtol=1e-3)


# -- one tiny physics substep (smallest compile in the suite) ----------------

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


def test_tiny_physics_substep(tmp_path):
    from gym_so100_tpu.models.builder import build_model
    from gym_so100_tpu.ops import forward as fwd

    path = str(tmp_path / "twobox.xml")
    open(path, "w").write(TWOBOX)
    m, _ = build_model(path, max_contacts=8)
    s = fwd.make_state(m, qpos=[0, 0, 0.0199, 1, 0, 0, 0])
    s2, d = jax.jit(lambda s: fwd.step(m, s))(s)
    # resting cube: finite state, contact found, gravity balanced
    assert np.isfinite(np.asarray(s2.qpos)).all()
    assert bool(jnp.any(d.contact.active))
    assert abs(float(s2.qvel[2])) < 1e-3
