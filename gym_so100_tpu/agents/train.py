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
    # stage curriculum: tuple of (end_steps, target_entropy, lr) applied when
    # total env steps < end_steps * num_envs, mirroring the reference's
    # StageBasedTraining boundaries (train_sac.py:429-482).  Empty = constant
    # hyperparameters.  Use REFERENCE_STAGES for the reference's schedule.
    stages: tuple = ()


# the reference's 3-stage entropy/LR curriculum (train_sac.py:440-442,452-481)
REFERENCE_STAGES = (
    (40_000, -2.0, 1e-4),   # stage 1: high exploration
    (65_000, -3.0, 1e-4),   # stage 2: balanced
    (85_000, -7.0, 5e-5),   # stage 3: exploitation
)


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
        es2, next_obs, rew, term, trunc, info = self.env._step_impl(es, acts)
        st = dataclasses.replace(st, key=key)
        # boundary transitions bootstrap from the episode's true terminal obs
        buffer = st.buffer.add_batch(obs, acts, rew, info["final_obs"], term)
        normalizer = st.normalizer.update(obs)
        st = dataclasses.replace(st, buffer=buffer, normalizer=normalizer)
        return st, es2, next_obs, rew

    def _rollout_impl(self, st: SACState, es, obs):
        key, k1 = jax.random.split(st.key)
        acts = self.sac.act(st, obs, k1)
        es2, next_obs, rew, term, trunc, info = self.env._step_impl(es, acts)
        st = dataclasses.replace(st, key=key)
        st, metrics = self.sac.train_step(
            st, obs, acts, rew, info["final_obs"], term
        )
        return st, es2, next_obs, rew, metrics

    def _apply_stage(self, st: SACState, env_steps):
        """Set (target_entropy, lr_scale) for the stage containing env_steps.

        Host-side between jitted steps; writing into the state pytree keeps
        the jitted update un-retraced (the reference instead calls
        model.learn once per stage, train_sac.py:452-481)."""
        stages = self.tcfg.stages
        if not stages:
            return st
        te, lr = stages[-1][1], stages[-1][2]
        for end, s_te, s_lr in reversed(stages):
            if env_steps < end * self.tcfg.num_envs:
                te, lr = s_te, s_lr
        if getattr(self, "_cur_stage", None) == (te, lr):
            return st
        self._cur_stage = (te, lr)
        return dataclasses.replace(
            st,
            target_entropy=jnp.asarray(te, jnp.float32),
            lr_scale=jnp.asarray(lr / self.sac.cfg.lr, jnp.float32),
        )

    def train(self, seed=0, progress=print, init_state: SACState | None = None):
        t = self.tcfg
        st = init_state if init_state is not None else self.sac.init(
            jax.random.PRNGKey(seed)
        )
        es = self.env.reset(jax.random.PRNGKey(seed + 1))
        # initial obs from a fresh position pass
        obs = self._initial_obs(es)
        steps = int(st.step)  # resumes continue the step count
        t0 = time.time()
        rew_acc = []
        while steps * t.num_envs < t.total_steps:
            st = self._apply_stage(st, steps * t.num_envs)
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
        import json

        import orbax.checkpoint as ocp

        os.makedirs(path, exist_ok=True)
        # SACConfig sidecar so restore can rebuild matching pytree shapes
        # (buffer/batch sizes vary per run; cf. the reference persisting
        # VecNormalize + replay buffer next to the model, train_sac.py:406-426)
        with open(os.path.join(path, "sac_config.json"), "w") as f:
            json.dump(dataclasses.asdict(self.sac.cfg), f)
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

    @staticmethod
    def load_config(ckpt_path) -> SACConfig | None:
        """Read the SACConfig sidecar written next to a checkpoint."""
        import json

        cfg_file = os.path.join(os.path.dirname(os.path.abspath(ckpt_path)),
                                "sac_config.json")
        if not os.path.exists(cfg_file):
            return None
        with open(cfg_file) as f:
            raw = json.load(f)
        raw["features"] = tuple(raw.get("features", (256, 256)))
        return SACConfig(**raw)
