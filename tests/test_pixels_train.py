"""Batched pixel-observation training path (reference flagship trainer).

The reference trains SAC on so100_pixels_agent_pos through SubprocVecEnv +
VecTransposeImage + MultiInputPolicy (/root/reference/scripts/train_sac.py:
294-337).  Here: the batched env renders on-device (vmapped rasterizer),
the CNN+state SAC consumes {"pixels", "agent_pos"} dicts, and the replay
buffer stores uint8 frames.
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


def test_pixels_bc_fit_and_transfer():
    """BC on the pixels dict obs (reference train_bc.py:159-353): fits a few
    synthetic pixel transitions through the NatureCNN encoder and transfers
    the weights into the pixels SAC actor parameter-for-parameter."""
    from gym_so100_tpu.agents import bc
    from gym_so100_tpu.agents.sac import SAC

    H, W, N = 24, 32, 32
    rng = np.random.RandomState(0)
    obs = {
        "pixels": rng.randint(0, 255, (N, H, W, 3), dtype=np.uint8),
        "agent_pos": rng.randn(N, 6).astype(np.float32),
    }
    act = np.tanh(rng.randn(N, 6)).astype(np.float32)
    losses = []
    actor, params = bc.train_bc(
        obs, act, epochs=8, batch_size=16, seed=0,
        progress=lambda l: losses.append(l["bc_loss"]),
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # it learns

    sac = SAC(SACConfig(obs_dim=6, pixels=(H, W), buffer_size=16, batch_size=4))
    st = sac.init(jax.random.PRNGKey(0))
    st2 = bc.transfer_to_sac(sac, st, params)
    # transferred actor acts on env-style dict obs, in bounds
    a = sac.act(
        st2,
        {
            "pixels": jnp.asarray(obs["pixels"][:3]),
            "agent_pos": jnp.asarray(obs["agent_pos"][:3]),
        },
        jax.random.PRNGKey(1),
    )
    assert a.shape == (3, 6) and np.all(np.abs(np.asarray(a)) <= 1.0)
    # mismatched architectures are rejected, not silently mis-assigned
    sac_flat = SAC(SACConfig(obs_dim=15))
    st_flat = sac_flat.init(jax.random.PRNGKey(0))
    try:
        bc.transfer_to_sac(sac_flat, st_flat, params)
        assert False, "expected ValueError on architecture mismatch"
    except ValueError:
        pass


def test_pixels_final_obs_is_terminal_frame_at_truncation():
    """At a truncation boundary the returned obs is the FRESH episode's first
    frame while info["final_obs"] carries the true terminal frame — they must
    differ (the pre-fix code put the post-autoreset frame in final_obs, so
    truncated episodes bootstrapped from the next episode's reset state)."""
    from gym_so100_tpu.parallel.batch import BatchedEnv

    m, aux = build_model(ASSETS_XML, max_contacts=24)
    m = m.astype(jnp.float32)
    env = BatchedEnv(
        m, "so100_touch_cube", num_envs=2, max_episode_steps=2,
        obs_mode="pixels_agent_pos", obs_height=24, obs_width=32,
        render_aux=aux,
    )
    es = env.reset(jax.random.PRNGKey(0))
    acts = jnp.full((2, 6), 0.3, jnp.float32)  # move the arm so frames differ
    es, obs, rew, term, trunc, info = env.step(es, acts)
    es, obs, rew, term, trunc, info = env.step(es, acts)  # t=2 -> truncated
    assert bool(jnp.all(trunc))
    # terminal agent_pos is the moved arm, not the reset pose
    assert not np.allclose(
        np.asarray(info["final_obs"]["agent_pos"]),
        np.asarray(obs["agent_pos"]), atol=1e-4,
    )
    # terminal frame != reset frame
    assert np.abs(
        np.asarray(info["final_obs"]["pixels"], np.int32)
        - np.asarray(obs["pixels"], np.int32)
    ).max() > 0


def test_pixels_sac_end_to_end():
    m, aux = build_model(ASSETS_XML, max_contacts=24)
    m = m.astype(jnp.float32)
    H, W, B = 24, 32, 2
    trainer = Trainer(
        m,
        TrainConfig(
            num_envs=B, hull_contacts=False, obs="pixels_agent_pos",
            obs_height=H, obs_width=W, render_aux=aux,
            learning_starts=0,
        ),
        SACConfig(obs_dim=6, pixels=(H, W), buffer_size=64, batch_size=8),
    )
    st = trainer.sac.init(jax.random.PRNGKey(0))
    es = trainer.env.reset(jax.random.PRNGKey(1))
    obs = trainer._initial_obs(es)

    # obs space matches the reference dict obs (env.py:50-66) at training res
    assert obs["pixels"].shape == (B, H, W, 3)
    assert obs["pixels"].dtype == jnp.uint8
    assert obs["agent_pos"].shape == (B, 6)
    # the render actually contains scene content, not just sky
    frame = np.asarray(obs["pixels"][0])
    assert len(np.unique(frame.reshape(-1, 3), axis=0)) > 3

    losses = []
    for _ in range(3):
        st, es, obs, rew, metrics = trainer._rollout(st, es, obs)
        losses.append(float(metrics["critic_loss"]))
    assert np.isfinite(losses).all()
    assert int(st.step) == 3
    # buffer stored uint8 frames
    assert st.buffer.obs["pixels"].dtype == jnp.uint8
    assert int(st.buffer.size) == 3 * B
