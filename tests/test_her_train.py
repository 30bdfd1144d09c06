"""End-to-end SAC+HER smoke: episode collection, relabeling, learning signal.

Covers the reference's train_sac_her.py capability slice
(SO100GoalEnv + HerReplayBuffer future strategy) on the batched on-device
pipeline: episodes flush into the HER buffer, future-relabeled samples have
nonzero success (relabeled goals are by construction reachable), and the
critic actually trains.
"""

import pytest

pytestmark = pytest.mark.slow


import numpy as np

import jax
import jax.numpy as jnp

from gym_so100_tpu.agents.sac import SACConfig
from gym_so100_tpu.agents.train_her import GOAL_DIM, HERConfig, HERTrainer
from gym_so100_tpu.envs.gym_env import ASSETS_XML
from gym_so100_tpu.models.builder import build_model


def test_her_end_to_end():
    m, _ = build_model(ASSETS_XML, max_contacts=24)
    m = m.astype(jnp.float32)
    cfg = HERConfig(
        num_envs=4,
        total_steps=4 * 40,
        learning_starts=0,
        her_episodes=8,
        max_episode_steps=10,   # short episodes so flushes happen in-test
        curriculum_steps=10_000,
        hull_contacts=False,
    )
    trainer = HERTrainer(
        m, cfg,
        SACConfig(obs_dim=15 + GOAL_DIM, act_dim=6, buffer_size=1,
                  batch_size=32),
    )
    ts = trainer.init(seed=0)
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(40):
        key, sub = jax.random.split(key)
        ts, rew, succ, metrics = trainer._rollout(ts, sub)
        if metrics:
            losses.append(float(metrics["critic_loss"]))

    # episodes flushed (4 envs x 40 steps / 10-step episodes -> ring full)
    assert int(ts.her.n_eps) == 8
    assert int(ts.her.ptr) >= 8
    lens = np.asarray(ts.her.ep_len)
    assert (lens >= 1).all() and (lens <= 10).all()

    # future-relabeling produces reachable goals: a large sampled batch must
    # contain strictly more zero-reward (success) transitions than the
    # original sparse goals would ever yield under random actions
    batch = ts.her.sample(jax.random.PRNGKey(3), 512, her_ratio=1.0)
    frac_success = float((batch["rew"] >= 0).mean())
    assert frac_success > 0.02, frac_success
    nohER = ts.her.sample(jax.random.PRNGKey(3), 512, her_ratio=0.0)
    assert float((nohER["rew"] >= 0).mean()) <= frac_success

    # the learner consumed relabeled batches and produced finite losses
    assert len(losses) > 0 and np.isfinite(losses).all()

    # SAC step counter advanced only after the buffer had episodes
    assert int(ts.sac.step) > 0
