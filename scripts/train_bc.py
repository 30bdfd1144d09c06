"""Behavior-cloning CLI: demos -> BC policy -> eval/video -> SAC fine-tune.

Counterpart of /root/reference/scripts/train_bc.py (imitation-library BC at
train_bc.py:159-279, BC->SAC weight transfer + fine-tune at :282-353, eval +
video at :356-452) over the native Flax BC trainer.

  python scripts/train_bc.py demos/*.pkl --epochs 50 --eval-episodes 5 \
      --video bc_eval.mp4 --finetune-steps 50000 --checkpoint-dir runs/bc
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import gymnasium as gym  # noqa: E402
import gym_so100_tpu  # noqa: E402,F401
from gym_so100_tpu.agents import bc  # noqa: E402
from gym_so100_tpu.agents.sac import SACConfig  # noqa: E402
from gym_so100_tpu.agents.train import TrainConfig, Trainer  # noqa: E402
from gym_so100_tpu.envs.gym_env import ASSETS_XML, _cached_model  # noqa: E402


def evaluate(actor, params, episodes, task, video=None, pixels=None):
    """Deterministic rollouts with the BC policy; mirrors the reference's
    eval + video loop (train_bc.py:356-452).  `pixels`: (H, W) to evaluate
    the pixels-dict policy on the pixel obs type."""
    if pixels:
        env = gym.make(
            f"gym_so100_tpu/{task}", obs_type="so100_pixels_agent_pos",
            observation_height=pixels[0], observation_width=pixels[1],
            dtype=jnp.float32,
        )

        def _prep(o):
            return {
                "pixels": jnp.asarray(o["pixels"], jnp.float32) / 255.0,
                "agent_pos": jnp.asarray(o["agent_pos"], jnp.float32),
            }
    else:
        env = gym.make(
            f"gym_so100_tpu/{task}", obs_type="so100_state", dtype=jnp.float32
        )
        _prep = jnp.asarray
    act_fn = jax.jit(lambda o: jnp.tanh(actor.apply(params, o)[0]))
    rets, succ, frames = [], 0, []
    for ep in range(episodes):
        obs, info = env.reset(seed=ep)
        total = 0.0
        while True:
            a = np.asarray(act_fn(_prep(obs)))
            obs, r, term, trunc, info = env.step(a)
            total += float(r)
            if video and ep == 0:
                frames.append(np.asarray(env.render()))
            if term or trunc:
                succ += int(info.get("is_success", False))
                break
        rets.append(total)
        print(f"eval episode {ep}: return {total:.2f} "
              f"success {info.get('is_success', False)}")
    print(f"eval: mean return {np.mean(rets):.2f} "
          f"success rate {succ/episodes:.2f}")
    if video and frames:
        import imageio

        imageio.mimsave(video, np.stack(frames), fps=50)
        print(f"wrote {video}")
    return float(np.mean(rets))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("demos", nargs="+", help="demo pickle files")
    p.add_argument("--task", default="SO100CubeToBin-v0")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--eval-episodes", type=int, default=5)
    p.add_argument("--video", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--finetune-steps", type=int, default=0,
        help="continue with SAC fine-tuning from the BC weights "
        "(train_bc.py:282-353)",
    )
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument(
        "--pixels", action="store_true",
        help="train on the pixels dict obs through the NatureCNN encoder "
        "(the reference's MultiInputActorCriticPolicy BC, train_bc.py:159-279)",
    )
    p.add_argument("--obs-height", type=int, default=48)
    p.add_argument("--obs-width", type=int, default=64)
    args = p.parse_args()

    obs, act = bc.load_demo_transitions(args.demos, pixels=args.pixels)
    n = act.shape[0]
    print(f"loaded {n} transitions from {len(args.demos)} file(s)")
    actor, params = bc.train_bc(
        obs, act, epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        seed=args.seed,
        progress=lambda l: print(json.dumps(l), flush=True),
    )

    if args.eval_episodes:
        hw = None
        if args.pixels:
            hw = tuple(obs["pixels"].shape[1:3])
        evaluate(actor, params, args.eval_episodes,
                 {"SO100CubeToBin-v0": "SO100CubeToBin-v0"}.get(
                     args.task, args.task),
                 video=args.video, pixels=hw)

    if args.finetune_steps or args.checkpoint_dir:
        task_key = {
            "SO100TouchCube-v0": "so100_touch_cube",
            "SO100TouchCubeSparse-v0": "so100_touch_cube_sparse",
            "SO100CubeToBin-v0": "so100_cube_to_bin",
        }.get(args.task, "so100_cube_to_bin")
        m, aux = _cached_model(ASSETS_XML, "float32")
        if args.pixels:
            hw = tuple(obs["pixels"].shape[1:3])
            tcfg = TrainConfig(
                task=task_key, num_envs=args.num_envs,
                total_steps=args.finetune_steps,
                checkpoint_dir=args.checkpoint_dir,
                obs="pixels_agent_pos", obs_height=hw[0], obs_width=hw[1],
                render_aux=aux,
            )
            scfg = SACConfig(obs_dim=obs["agent_pos"].shape[-1], pixels=hw)
        else:
            tcfg = TrainConfig(
                task=task_key, num_envs=args.num_envs,
                total_steps=args.finetune_steps,
                checkpoint_dir=args.checkpoint_dir,
            )
            scfg = SACConfig(obs_dim=obs.shape[-1])
        trainer = Trainer(m, tcfg, scfg)
        st = trainer.sac.init(jax.random.PRNGKey(args.seed))
        st = bc.transfer_to_sac(trainer.sac, st, params)
        if args.finetune_steps:
            print(f"SAC fine-tune for {args.finetune_steps} env steps")
            st = trainer.train(
                seed=args.seed,
                progress=lambda l: print(json.dumps(l), flush=True),
                init_state=st,
            )
        if args.checkpoint_dir:
            path = trainer.save(st, args.checkpoint_dir, args.finetune_steps)
            print(f"saved {path}")


if __name__ == "__main__":
    main()
