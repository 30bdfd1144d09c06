"""Learner smoke tests: SAC math, replay/HER buffers, end-to-end train step."""

import pytest

pytestmark = pytest.mark.slow


import numpy as np

import jax
import jax.numpy as jnp

from gym_so100_tpu.agents.her import HerBuffer
from gym_so100_tpu.agents.sac import SAC, SACConfig, Normalizer, ReplayBuffer


def test_replay_buffer_ring():
    buf = ReplayBuffer.create(10, 3, 2)
    o = jnp.arange(12.0).reshape(4, 3)
    a = jnp.ones((4, 2))
    r = jnp.arange(4.0)
    d = jnp.zeros(4, bool)
    buf = buf.add_batch(o, a, r, o, d)
    assert int(buf.size) == 4 and int(buf.ptr) == 4
    for _ in range(3):
        buf = buf.add_batch(o, a, r, o, d)
    assert int(buf.size) == 10  # capped at capacity
    batch = buf.sample(jax.random.PRNGKey(0), 32)
    assert batch["obs"].shape == (32, 3)


def test_normalizer_matches_numpy():
    rng = np.random.RandomState(0)
    data = rng.randn(500, 4) * 3 + 1
    n = Normalizer.create(4)
    for i in range(0, 500, 100):
        n = n.update(jnp.asarray(data[i : i + 100], jnp.float32))
    np.testing.assert_allclose(np.asarray(n.mean), data.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(n.var), data.var(0), rtol=1e-2)


def test_sac_update_improves_critic():
    cfg = SACConfig(obs_dim=3, act_dim=2, batch_size=64, buffer_size=1000)
    sac = SAC(cfg)
    st = sac.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    # synthetic transitions: reward = -|obs|^2, simple contraction dynamics
    obs = rng.randn(256, 3).astype(np.float32)
    act = rng.uniform(-1, 1, (256, 2)).astype(np.float32)
    nxt = 0.9 * obs
    rew = -(obs**2).sum(-1).astype(np.float32)
    done = np.zeros(256, bool)

    step = jax.jit(sac.train_step)
    losses = []
    for i in range(30):
        st, m = step(
            st, jnp.asarray(obs), jnp.asarray(act), jnp.asarray(rew),
            jnp.asarray(nxt), jnp.asarray(done),
        )
        losses.append(float(m["critic_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # critic fits the value surface
    # actions remain in bounds
    a = sac.act(st, jnp.asarray(obs[:5]), jax.random.PRNGKey(2))
    assert np.all(np.abs(np.asarray(a)) <= 1.0)


def test_her_future_relabeling():
    buf = HerBuffer.create(episodes=4, T=10, obs_dim=5, act_dim=2)
    T = 10
    obs = jnp.tile(jnp.arange(T, dtype=jnp.float32)[:, None], (1, 5))
    act = jnp.zeros((T, 2))
    # achieved goal moves linearly; desired goal unreachable
    agoal = jnp.tile(jnp.arange(T, dtype=jnp.float32)[:, None], (1, 3)) * 0.1
    dgoal = jnp.asarray([99.0, 99, 99])
    buf = buf.add_episode(obs, act, obs, agoal, dgoal, T)
    assert int(buf.n_eps) == 1
    batch = buf.sample(jax.random.PRNGKey(0), 128, her_ratio=1.0)
    # with full relabeling to future achieved goals, a decent fraction of
    # rewards must be 0 (goal == achieved when fut == t)
    assert float((batch["rew"] == 0).mean()) > 0.05
    assert batch["obs"].shape == (128, 8)
    # no relabeling -> all rewards -1 (desired goal unreachable)
    batch = buf.sample(jax.random.PRNGKey(1), 128, her_ratio=0.0)
    assert float((batch["rew"] == -1).mean()) == 1.0


def test_trainer_smoke():
    """Few env-batch steps of the full rollout+update path on CPU."""
    from gym_so100_tpu.agents.train import TrainConfig, Trainer
    from gym_so100_tpu.envs.gym_env import ASSETS_XML, _cached_model

    m, _ = _cached_model(
        ASSETS_XML, "float32"
    )
    t = Trainer(
        m,
        TrainConfig(num_envs=4, total_steps=24, learning_starts=8, log_every=3),
        SACConfig(),
    )
    lines = []
    st = t.train(seed=0, progress=lines.append)
    assert int(st.buffer.size) > 0
    assert lines and np.isfinite(lines[-1]["mean_reward"])
