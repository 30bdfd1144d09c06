"""Learner sharding: SPMD env+learner on a mesh == single-device training.

SURVEY §2.4 item 2: the SAC learner runs on the same mesh as the env batch
(params replicated, env axis sharded, gradient psums inserted by the XLA
partitioner).  These tests assert the sharded program computes the same
updates as the unsharded one on the virtual 8-device CPU mesh.
"""

import pytest

pytestmark = pytest.mark.slow


import numpy as np

import jax
import jax.numpy as jnp

from gym_so100_tpu.agents.sac import SACConfig
from gym_so100_tpu.agents.train import TrainConfig, Trainer
from gym_so100_tpu.envs.gym_env import ASSETS_XML
from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.parallel import dist


def _run(mesh, steps=3):
    m, _ = build_model(ASSETS_XML, max_contacts=24)
    m = m.astype(jnp.float32)
    B = 8
    trainer = Trainer(
        m,
        TrainConfig(num_envs=B, hull_contacts=False),
        SACConfig(buffer_size=64, batch_size=16),
        mesh=mesh,
    )
    st = trainer.sac.init(jax.random.PRNGKey(0))
    es = trainer.env.reset(jax.random.PRNGKey(1))
    if mesh is not None:
        st = dist.replicate(st, mesh)
        es = dist.shard_env(es, mesh)
    obs = trainer._initial_obs(es)
    for _ in range(steps):
        st, es, obs, rew, metrics = trainer._rollout(st, es, obs)
    return st, metrics


def test_mesh_update_equivalence():
    assert jax.device_count() >= 8, "conftest must provide the virtual mesh"
    st1, m1 = _run(mesh=None)
    st8, m8 = _run(mesh=dist.env_mesh(8))

    p1 = jax.tree_util.tree_leaves(st1.actor_params)
    p8 = jax.tree_util.tree_leaves(st8.actor_params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="sharded actor update != single-device update",
        )
    # the scalar loss is an f32 mean whose reduction ORDER differs between
    # the single-device sum and the 8-shard psum (observed delta ~0.3% after
    # 3 chaotic env+update steps); the parameter check above at 2e-5 is the
    # real equivalence assertion
    np.testing.assert_allclose(
        float(m1["critic_loss"]), float(m8["critic_loss"]), rtol=2e-2
    )
    assert int(st8.step) == 3


def test_env_mesh_helpers():
    mesh = dist.env_mesh(4)
    assert mesh.devices.shape == (4,)
    x = jnp.zeros((8, 3))
    xs = dist.shard_env(x, mesh)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("env", None)
    xr = dist.replicate(x, mesh)
    assert xr.sharding.spec == jax.sharding.PartitionSpec()
    # single-process init_distributed is a no-op
    assert dist.init_distributed() is False
