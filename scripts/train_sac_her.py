"""Train SAC+HER on the batched goal-conditioned TPU envs.

CLI replacement for /root/reference/scripts/train_sac_her.py (SO100GoalEnv +
SAC with HerReplayBuffer(n_sampled_goal=4, goal_selection_strategy="future"),
lr 1e-4, batch 256, learning_starts 1000, train_sac_her.py:220-254).  The
goal curriculum (near-cube goals for the first 5000 total steps, then the
bin interior) runs inside the jitted env step.

  python scripts/train_sac_her.py --num-envs 32 --total-steps 200000
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gym_so100_tpu.agents.sac import SACConfig  # noqa: E402
from gym_so100_tpu.agents.train_her import (  # noqa: E402
    GOAL_DIM,
    HERConfig,
    HERTrainer,
)
from gym_so100_tpu.envs.gym_env import ASSETS_XML, _cached_model  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--total-steps", type=int, default=200_000)
    p.add_argument("--learning-starts", type=int, default=1_000)
    p.add_argument("--lr", type=float, default=1e-4)          # ref :248
    p.add_argument("--batch-size", type=int, default=256)     # ref :250
    p.add_argument("--her-episodes", type=int, default=256)
    p.add_argument("--her-ratio", type=float, default=0.8)    # n_sampled_goal=4
    p.add_argument("--utd", type=int, default=1,
                   help="gradient updates per env-batch step")
    p.add_argument("--curriculum-steps", type=int, default=5_000)
    p.add_argument(
        "--near-cube-only", action="store_true",
        help="keep the near-cube goal curriculum for the whole run (the "
        "demonstration regime; default switches to bin goals after "
        "--curriculum-steps like the reference, env.py:244-249)",
    )
    p.add_argument("--distance-threshold", type=float, default=0.01,
                   help="success radius in meters (reference env.py:241)")
    p.add_argument(
        "--goal-min-dist", type=float, default=0.0,
        help="push sampled goals at least this far from the cube's rest "
        "site so no episode succeeds without moving the cube (0 = the "
        "reference behavior, where ~3%% of near-cube goals are zero-skill "
        "freebies; demonstration lever, see HERConfig.goal_min_dist)",
    )
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=20_000)
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--hull-contacts", action=argparse.BooleanOptionalAction, default=True,
        help="full contact set (default; --no-hull-contacts for the reduced "
        "box-only quick mode)",
    )
    p.add_argument(
        "--tensorboard-dir", default=None,
        help="write TensorBoard scalars in addition to stdout JSON "
        "(the reference logs to ['tensorboard', 'stdout'], "
        "train_sac_her.py:234)",
    )
    args = p.parse_args()

    m, _ = _cached_model(ASSETS_XML, "float32")
    trainer = HERTrainer(
        m,
        HERConfig(
            num_envs=args.num_envs,
            total_steps=args.total_steps,
            learning_starts=args.learning_starts,
            her_episodes=args.her_episodes,
            her_ratio=args.her_ratio,
            utd=args.utd,
            curriculum_steps=(1 << 30) if args.near_cube_only else args.curriculum_steps,
            distance_threshold=args.distance_threshold,
            goal_min_dist=args.goal_min_dist,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            hull_contacts=args.hull_contacts,
        ),
        SACConfig(
            obs_dim=15 + GOAL_DIM, act_dim=6, lr=args.lr,
            buffer_size=1, batch_size=args.batch_size,
        ),
    )
    init_state = None
    if args.resume:
        init_state = trainer.restore(args.resume)
        print(f"resumed from {args.resume}")
    from gym_so100_tpu.agents.metrics import MetricLogger

    logger = MetricLogger(args.tensorboard_dir)
    trainer.train(
        seed=args.seed,
        progress=logger,
        init_state=init_state,
    )


if __name__ == "__main__":
    main()
