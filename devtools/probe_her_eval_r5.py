"""Evaluate a trained SAC+HER checkpoint against a random-action control.

The training-window success_rate conflates exploration noise, episode
staging, and goal churn; this probe answers the capability question
directly: under the SAME goal distribution, does the deterministic
trained policy reach goals more often than random actions?

  python devtools/probe_her_eval_r5.py --ckpt devtools/r5_ckpt_her/her_ckpt_N \
      [--episodes-per-lane 3] [--num-envs 256] [--goal-min-dist 0.02]

Prints one JSON line with per-episode success rates and final cube-goal
distances for both policies.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from gym_so100_tpu.agents.train_her import HERConfig, HERTrainer
from gym_so100_tpu.envs.gym_env import ASSETS_XML, _cached_model


def rollout(trainer, ts, key, steps, deterministic):
    """Roll the batched goal env; returns per-episode success bookkeeping."""
    B = trainer.cfg.num_envs
    genv = trainer.reset(key)
    ep_done = 0
    ep_succ = 0
    final_dists = []
    obs_fn = jax.jit(trainer._obs)
    act_fn = jax.jit(
        lambda st, o, k: trainer.sac.act(st, o, k, deterministic=True)
    )
    step_fn = jax.jit(trainer._goal_step)
    for t in range(steps):
        key, k1 = jax.random.split(key)
        obs, _ = obs_fn(genv.es)
        if deterministic:
            obs_goal = jnp.concatenate([obs, genv.goal], -1)
            acts = act_fn(ts.sac, obs_goal, k1)
        else:
            acts = jax.random.uniform(k1, (B, 6), jnp.float32, -1, 1)
        goal_before = genv.goal  # pre-resample goal for done-lane distances
        genv, _next_obs, agoal, _rew, succ, done, _t2 = step_fn(genv, acts)
        nd = int(jnp.sum(done))
        if nd:
            ep_done += nd
            ep_succ += int(jnp.sum(succ))
            d = jnp.linalg.norm(agoal - goal_before, axis=-1)
            final_dists.extend(np.asarray(d[np.asarray(done)]).tolist())
    return ep_done, ep_succ, final_dists


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--episodes-per-lane", type=int, default=3)
    p.add_argument("--goal-min-dist", type=float, default=0.02)
    p.add_argument("--distance-threshold", type=float, default=0.01)
    p.add_argument("--utd", type=int, default=16)
    p.add_argument("--her-episodes", type=int, default=256)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    m, _ = _cached_model(ASSETS_XML, "float32")
    trainer = HERTrainer(
        m,
        HERConfig(
            num_envs=args.num_envs,
            curriculum_steps=1 << 30,          # near-cube goals (eval regime)
            distance_threshold=args.distance_threshold,
            goal_min_dist=args.goal_min_dist,
            utd=args.utd,
            her_episodes=args.her_episodes,
        ),
    )
    ts = trainer.restore(args.ckpt)
    steps = 300 * args.episodes_per_lane

    d_done, d_succ, d_dists = rollout(
        trainer, ts, jax.random.PRNGKey(args.seed), steps, deterministic=True
    )
    r_done, r_succ, r_dists = rollout(
        trainer, ts, jax.random.PRNGKey(args.seed), steps, deterministic=False
    )
    out = {
        "policy_episodes": d_done,
        "policy_successes": d_succ,
        "policy_ep_success_rate": round(d_succ / max(d_done, 1), 4),
        "policy_final_dist_median": round(float(np.median(d_dists)), 4)
        if d_dists else None,
        "random_episodes": r_done,
        "random_successes": r_succ,
        "random_ep_success_rate": round(r_succ / max(r_done, 1), 4),
        "random_final_dist_median": round(float(np.median(r_dists)), 4)
        if r_dists else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
