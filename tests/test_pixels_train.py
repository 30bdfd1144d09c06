"""Batched pixel-observation training path (reference flagship trainer).

The reference trains SAC on so100_pixels_agent_pos through SubprocVecEnv +
VecTransposeImage + MultiInputPolicy (/root/reference/scripts/train_sac.py:
294-337).  Here: the batched env renders on-device (vmapped rasterizer),
the CNN+state SAC consumes {"pixels", "agent_pos"} dicts, and the replay
buffer stores uint8 frames.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gym_so100_tpu.agents.sac import SACConfig
from gym_so100_tpu.agents.train import TrainConfig, Trainer
from gym_so100_tpu.envs.gym_env import ASSETS_XML
from gym_so100_tpu.models.builder import build_model


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
