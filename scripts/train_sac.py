"""Train SAC on the batched TPU envs.

CLI replacement for /root/reference/scripts/train_sac.py — same knobs where
they are meaningful (task, num_envs, total steps, checkpoints, resume), but
the env fan-out is a vmapped on-device batch instead of SubprocVecEnv
processes.

  python scripts/train_sac.py --task so100_cube_to_bin --num-envs 256 \
      --total-steps 1000000 --checkpoint-dir runs/sac
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from gym_so100_tpu.agents.sac import SACConfig  # noqa: E402
from gym_so100_tpu.agents.train import (  # noqa: E402
    REFERENCE_STAGES,
    TrainConfig,
    Trainer,
)
from gym_so100_tpu.envs.gym_env import ASSETS_XML, _cached_model  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="so100_cube_to_bin")
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--total-steps", type=int, default=1_000_000)
    p.add_argument("--learning-starts", type=int, default=1_000)
    p.add_argument("--utd", type=int, default=1,
                   help="gradient updates per env-batch step")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--buffer-size", type=int, default=50_000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=50_000)
    p.add_argument("--resume", default=None, help="checkpoint path to restore")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--hull-contacts", action=argparse.BooleanOptionalAction, default=True,
        help="full contact set (default; --no-hull-contacts for the reduced "
        "box-only quick mode)",
    )
    p.add_argument(
        "--obs", default="state", choices=["state", "pixels_agent_pos"],
        help="pixels_agent_pos trains the MultiInputPolicy-equivalent "
        "CNN+state SAC on on-device renders (ref train_sac.py:294-337)",
    )
    p.add_argument("--obs-height", type=int, default=48)
    p.add_argument("--obs-width", type=int, default=64)
    p.add_argument("--eval-every", type=int, default=0,
                   help="env steps between deterministic evals (0 = off)")
    p.add_argument("--eval-episodes", type=int, default=8)
    p.add_argument("--video-dir", default=None,
                   help="write eval_<step>.mp4 here during evals")
    p.add_argument(
        "--stages", action="store_true",
        help="use the reference's 3-stage entropy/LR curriculum "
        "(train_sac.py:429-482)",
    )
    p.add_argument(
        "--tensorboard-dir", default=None,
        help="write TensorBoard scalars here in addition to stdout JSON "
        "(the reference logs to ['tensorboard', 'stdout'], train_sac.py:323)",
    )
    args = p.parse_args()

    m, aux = _cached_model(ASSETS_XML, "float32")
    pixels = args.obs == "pixels_agent_pos"
    sac_cfg = SACConfig(
        lr=args.lr, buffer_size=args.buffer_size, batch_size=args.batch_size,
        obs_dim=6 if pixels else 15,
        pixels=(args.obs_height, args.obs_width) if pixels else (),
    )
    if args.resume:
        # rebuild from the saved sidecar so restored pytree shapes match
        saved = Trainer.load_config(args.resume)
        if saved is not None:
            sac_cfg = saved
    trainer = Trainer(
        m,
        TrainConfig(
            task=args.task,
            num_envs=args.num_envs,
            total_steps=args.total_steps,
            learning_starts=args.learning_starts,
            utd=args.utd,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            hull_contacts=args.hull_contacts,
            stages=REFERENCE_STAGES if args.stages else (),
            obs=args.obs,
            obs_height=args.obs_height,
            obs_width=args.obs_width,
            render_aux=aux if (pixels or args.video_dir) else None,
            eval_every=args.eval_every,
            eval_episodes=args.eval_episodes,
            video_dir=args.video_dir,
        ),
        sac_cfg,
    )
    init_state = None
    if args.resume:
        init_state = trainer.restore(args.resume)
        print(f"resumed from {args.resume} at step {int(init_state.step)}")
    from gym_so100_tpu.agents.metrics import MetricLogger  # noqa: E402

    logger = MetricLogger(args.tensorboard_dir)
    try:
        trainer.train(seed=args.seed, progress=logger, init_state=init_state)
    finally:
        logger.close()


if __name__ == "__main__":
    main()
