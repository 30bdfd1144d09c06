"""Evaluate a trained SAC checkpoint: rollouts, reward stats, video.

Counterpart of the reference's eval machinery (train_sac.py:22-157
EvaluationVideoCallback and scripts/evaluate_lerobot_policy.py's rollout
loop) for natively trained policies."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import gymnasium as gym  # noqa: E402
import gym_so100_tpu  # noqa: E402,F401
from gym_so100_tpu.agents.sac import SACConfig  # noqa: E402
from gym_so100_tpu.agents.train import TrainConfig, Trainer  # noqa: E402
from gym_so100_tpu.envs.gym_env import ASSETS_XML, _cached_model  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--task", default="SO100CubeToBin-v0")
    p.add_argument("--episodes", type=int, default=5)
    p.add_argument("--video", default=None)
    args = p.parse_args()

    m, _ = _cached_model(ASSETS_XML, "float32")
    # rebuild the exact SACConfig the checkpoint was trained with (sidecar
    # written by Trainer.save) so restored pytree shapes match; fall back to
    # defaults for pre-sidecar checkpoints
    cfg = Trainer.load_config(args.checkpoint) or SACConfig()
    trainer = Trainer(m, TrainConfig(num_envs=1), cfg)
    st = trainer.restore(args.checkpoint)

    env = gym.make(
        f"gym_so100_tpu/{args.task}", obs_type="so100_state",
        dtype=jnp.float32,
    )
    act = jax.jit(
        lambda obs: trainer.sac.act(st, obs, jax.random.PRNGKey(0), deterministic=True)
    )
    rets, succ, frames = [], 0, []
    for ep in range(args.episodes):
        obs, info = env.reset(seed=ep)
        total = 0.0
        while True:
            a = np.asarray(act(jnp.asarray(obs)))
            obs, r, term, trunc, info = env.step(a)
            total += r
            if args.video and ep == 0:
                frames.append(np.asarray(env.render()))
            if term or trunc:
                succ += int(info.get("is_success", False))
                break
        rets.append(total)
        print(f"episode {ep}: return {total:.2f} success {info['is_success']}")
    print(f"mean return {np.mean(rets):.2f}  success rate {succ/args.episodes:.2f}")
    if args.video and frames:
        import imageio

        imageio.mimsave(args.video, np.stack(frames), fps=50)
        print(f"wrote {args.video}")


if __name__ == "__main__":
    main()
