"""Hindsight experience replay, on-device.

Replaces the reference's SB3 HerReplayBuffer(n_sampled_goal=4,
goal_selection_strategy="future") (train_sac_her.py:220-254).  The buffer
stores whole episodes of goal-conditioned transitions; sampling relabels a
fraction of transitions with achieved goals from the episode's future and
recomputes rewards with the pure-jnp `compute_reward` — the same batched
contract SO100GoalEnv.compute_reward exposes (env.py:341-353)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..envs.goal_env import compute_reward_jnp


def _pytree(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@dataclass(frozen=True)
class HerBuffer:
    """Episode-structured ring buffer for goal-conditioned transitions.

    Layout: (episodes, T, ...) with a write cursor over episodes; complete
    episodes only (the env layer guarantees fixed episode length via its
    truncation limit, matching the reference GoalEnv's 300)."""

    obs: jnp.ndarray          # (E, T, obs_dim)
    act: jnp.ndarray          # (E, T, act_dim)
    next_obs: jnp.ndarray     # (E, T, obs_dim)
    agoal: jnp.ndarray        # (E, T, 3) achieved goal after the step
    dgoal: jnp.ndarray        # (E, 3) desired goal of the episode
    ep_len: jnp.ndarray       # (E,) int32
    ptr: jnp.ndarray          # () int32 episode cursor
    n_eps: jnp.ndarray        # () int32 episodes stored

    @staticmethod
    def create(episodes, T, obs_dim, act_dim, dtype=jnp.float32):
        z = jnp.zeros
        return HerBuffer(
            obs=z((episodes, T, obs_dim), dtype),
            act=z((episodes, T, act_dim), dtype),
            next_obs=z((episodes, T, obs_dim), dtype),
            agoal=z((episodes, T, 3), dtype),
            dgoal=z((episodes, 3), dtype),
            ep_len=z((episodes,), jnp.int32),
            ptr=jnp.zeros((), jnp.int32),
            n_eps=jnp.zeros((), jnp.int32),
        )

    def add_episode(self, obs, act, next_obs, agoal, dgoal, length):
        E = self.obs.shape[0]
        i = self.ptr % E
        return HerBuffer(
            obs=self.obs.at[i].set(obs),
            act=self.act.at[i].set(act),
            next_obs=self.next_obs.at[i].set(next_obs),
            agoal=self.agoal.at[i].set(agoal),
            dgoal=self.dgoal.at[i].set(dgoal),
            ep_len=self.ep_len.at[i].set(length),
            ptr=self.ptr + 1,
            n_eps=jnp.minimum(self.n_eps + 1, E),
        )

    def sample(self, key, batch_size, her_ratio=0.8, distance_threshold=0.01):
        """Sample transitions; `her_ratio` of them get future-relabeled goals
        (n_sampled_goal=4 in SB3 corresponds to ratio 4/5)."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ne = jnp.maximum(self.n_eps, 1)
        ep = jax.random.randint(k1, (batch_size,), 0, ne)
        tl = jnp.maximum(self.ep_len[ep], 1)
        # per-row bounds via randint(0, 2^30) % bound: jax.random.randint
        # takes only scalar bounds, so the modulo supplies the per-episode
        # range.  The modulo bias is (tl / 2^30) relative — ~3e-7 at the
        # T=300 episode cap, orders below any statistical effect here.
        t = jax.random.randint(k2, (batch_size,), 0, 1 << 30) % tl
        # future strategy: goal index uniform in [t, ep_len)
        fut = t + jax.random.randint(k3, (batch_size,), 0, 1 << 30) % jnp.maximum(
            tl - t, 1
        )
        relabel = jax.random.uniform(k4, (batch_size,)) < her_ratio
        goal = jnp.where(
            relabel[:, None], self.agoal[ep, fut], self.dgoal[ep]
        )
        agoal = self.agoal[ep, t]
        rew = compute_reward_jnp(agoal, goal, distance_threshold)
        done = jnp.linalg.norm(agoal - goal, axis=-1) < distance_threshold
        # goal-conditioned obs: concat(obs, goal) — the learner treats the
        # goal as part of the observation
        obs = jnp.concatenate([self.obs[ep, t], goal], -1)
        next_obs = jnp.concatenate([self.next_obs[ep, t], goal], -1)
        return dict(
            obs=obs, act=self.act[ep, t], rew=rew, next_obs=next_obs, done=done
        )


_pytree(HerBuffer)
