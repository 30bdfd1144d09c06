"""Batched Cartesian (mocap-weld) control: batched == single, IK tracks.

The weld-row physics is pinned against the MuJoCo oracle in
test_oracle_weld.py; this file pins the *batched* EE-control surface
(BASELINE config 4: "batched constraint-driven Cartesian control"):

* CartesianBatchedEnv.step must equal per-env application of the same
  mocap/gripper update through the single-env physics path (vmap
  consistency, f64);
* under vmap, every env lane's ee_site must track its own mocap target
  (implicit IK through the weld, like scripts/teleop_ee.py but parallel).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from gym_so100_tpu.envs import constants as C
from gym_so100_tpu.envs import core
from gym_so100_tpu.envs.ee_env import CartesianBatchedEnv
from gym_so100_tpu.envs.gym_env import ASSETS_DIR
from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth

import os

EE_XML = os.path.join(ASSETS_DIR, "so100_transfer_cube_ee.xml")


@pytest.fixture(scope="module")
def model64():
    m, _ = build_model(EE_XML, max_contacts=16)
    return m


def test_batched_matches_single(model64):
    """Batched EE stepping == the same update through the single-env
    (vmapped AoS) physics path, per lane.

    Tolerance tiers: ONE substep after the action is applied matches to
    1e-10 (the lanes/AoS pipelines differ only in float op order); a full
    3-control-step rollout is compared at 5e-3 — the stiff 6-row weld
    amplifies op-order roundoff through the Newton solver's termination
    test (a 1e-14 cost difference can end the solve one iteration
    earlier), the same chaotic mechanism measured for the MuJoCo-parity
    horizon (devtools/measure_lockstep.py).  This test runs on the RAW
    reference weld (weld_gain=False): path equivalence is the claim here,
    and the gained weld's stiffer dynamics shrink the comparable horizon
    below one control step (the tracking test covers the gained weld)."""
    m = model64
    env = CartesianBatchedEnv(m, num_envs=4, weld_gain=False)
    es = env.reset(jax.random.PRNGKey(0))
    acts = jax.random.uniform(
        jax.random.PRNGKey(1), (4, 4), m.qpos0.dtype, -1, 1
    )

    # tier 1: one substep, strict
    s_act = jax.jit(jax.vmap(env.apply_action))(es.physics, acts)
    s1_ref, _ = jax.jit(jax.vmap(lambda s: fwd.step(m, s)))(s_act)
    s1_bat, _ = jax.jit(lambda s: fwd.step_batched(m, s))(s_act)
    np.testing.assert_allclose(
        np.asarray(s1_bat.qpos), np.asarray(s1_ref.qpos), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(s1_bat.qvel), np.asarray(s1_ref.qvel), atol=1e-8
    )

    # tier 2: full control steps, chaotic-amplification tolerance
    def single(s, a):
        s = env.apply_action(s, a)
        s = fwd.n_steps(m, s, C.N_SUBSTEPS)
        return s

    for i in range(3):
        s_ref = jax.jit(jax.vmap(single))(es.physics, acts)
        es, obs, rew, term, trunc, info = env.step(es, acts)
        np.testing.assert_allclose(
            np.asarray(es.physics.qpos), np.asarray(s_ref.qpos),
            atol=5e-3, err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            np.asarray(es.physics.mocap_pos), np.asarray(s_ref.mocap_pos),
            atol=0,
        )
    assert info["ee_err"].shape == (4,)


def test_vmap_ik_tracking(model64):
    """Per-env mocap targets: each lane's ee_site follows ITS OWN target
    through the weld (constraint-solver IK), batched."""
    m = model64.astype(jnp.float32)
    B = 8
    env = CartesianBatchedEnv(m, num_envs=B)
    es = env.reset(jax.random.PRNGKey(2))

    # distinct per-env direction commands: lane b moves along dir[b] for
    # 10 steps of 5 mm, then holds for 15 steps to settle
    rng = np.random.RandomState(0)
    dirs = rng.uniform(-1, 1, (B, 3))
    dirs[:, 2] = np.abs(dirs[:, 2])            # stay above the table
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    start = np.asarray(es.physics.mocap_pos[:, 0])

    move = jnp.concatenate(
        [jnp.asarray(dirs * 0.5, jnp.float32), jnp.zeros((B, 1), jnp.float32)],
        axis=1,
    )
    hold = jnp.zeros((B, 4), jnp.float32)
    for _ in range(10):
        es, obs, rew, term, trunc, info = env.step(es, move)
    for _ in range(15):
        es, obs, rew, term, trunc, info = env.step(es, hold)

    target = np.asarray(es.physics.mocap_pos[:, 0])
    moved = np.linalg.norm(target - start, axis=1)
    np.testing.assert_allclose(moved, 0.05, atol=1e-5)  # 10 x 0.5 x 0.01

    d = jax.vmap(lambda s1: smooth.kinematics(m, s1))(es.physics)
    ee = np.asarray(d.site_xpos[:, env.ids.ee_site])
    err = np.linalg.norm(ee - target, axis=1)
    # gained weld (env default): a 5 cm per-lane move settles well inside
    # 2.5 cm of its own target (probed: ~1.3 cm after 10 holds; the RAW
    # reference weld barely moves the arm at all — MuJoCo lags ~3.6 cm
    # behind a 4 cm drag, test_oracle_weld.py:72)
    assert np.all(err < 0.025), err
    # each lane moved TOWARD its own commanded direction
    disp = ee - np.asarray(
        jax.vmap(lambda s1: smooth.kinematics(m, s1))(
            env.reset(jax.random.PRNGKey(2)).physics
        ).site_xpos[:, env.ids.ee_site]
    )
    along = np.sum(disp * dirs, axis=1)
    assert np.all(along > 0.02), along
    # and lanes moved toward DIFFERENT targets (not a broadcast artifact)
    assert np.ptp(target, axis=0).max() > 0.03
