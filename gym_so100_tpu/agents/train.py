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
    # full contact set by default — policies train against the same physics
    # the reference's MuJoCo engine exposes (arm-mesh + incidental pairs);
    # set False only for quick state-obs experiments on reduced contacts
    hull_contacts: bool = True
    # obs type: "state" (flat 15-dim) or "pixels_agent_pos" (the reference
    # flagship trainer's obs, train_sac.py:294-337) at obs_height x obs_width
    obs: str = "state"
    obs_height: int = 48
    obs_width: int = 64
    render_aux: object = None       # aux dict from build_model (pixels mode)
    # periodic in-training evaluation (the reference's
    # EvaluationVideoCallback, train_sac.py:22-157: deterministic rollouts,
    # mp4 of the first episode, best-model checkpoint)
    eval_every: int = 0             # env steps between evals; 0 = off
    eval_episodes: int = 8
    video_dir: str | None = None    # write eval_<step>.mp4 here
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
    """SAC trainer; pass `mesh` to run envs + learner SPMD over a device
    mesh (env batch sharded on the "env" axis, learner replicated; the XLA
    partitioner inserts the gradient psums — SURVEY §2.4 item 2)."""

    def __init__(
        self, model, tcfg: TrainConfig, sac_cfg: SACConfig | None = None,
        mesh=None,
    ):
        self.tcfg = tcfg
        self.mesh = mesh
        pixels = tcfg.obs == "pixels_agent_pos"
        self.env = BatchedEnv(
            model, tcfg.task, tcfg.num_envs, hull_contacts=tcfg.hull_contacts,
            obs_mode=tcfg.obs, obs_height=tcfg.obs_height,
            obs_width=tcfg.obs_width, render_aux=tcfg.render_aux,
        )
        if sac_cfg is None:
            sac_cfg = (
                SACConfig(obs_dim=6, pixels=(tcfg.obs_height, tcfg.obs_width))
                if pixels else SACConfig()
            )
        self.sac = SAC(sac_cfg)
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
        normalizer = st.normalizer.update(
            obs["agent_pos"] if self.sac.cfg.pixels else obs
        )
        st = dataclasses.replace(st, buffer=buffer, normalizer=normalizer)
        return st, es2, next_obs, rew, jnp.max(info["ncon"])

    def _rollout_impl(self, st: SACState, es, obs):
        key, k1 = jax.random.split(st.key)
        acts = self.sac.act(st, obs, k1)
        es2, next_obs, rew, term, trunc, info = self.env._step_impl(es, acts)
        st = dataclasses.replace(st, key=key)
        st, metrics = self.sac.train_step(
            st, obs, acts, rew, info["final_obs"], term
        )
        # update-to-data ratio: utd gradient updates per env-batch step
        # (the reference's SB3 loop does gradient_steps == env steps per
        # worker; utd recovers a comparable ratio at large num_envs)
        for _ in range(self.tcfg.utd - 1):
            key, sub = jax.random.split(st.key)
            st = dataclasses.replace(st, key=key)
            batch = st.buffer.sample(sub, self.sac.cfg.batch_size)
            st, metrics = self.sac.update(st, batch)
        # contact-buffer saturation watch: max active narrowphase candidates
        # this step; values at/above model.max_contacts mean the fixed K
        # buffer clipped real contacts (ADVICE r3: make overflow observable)
        metrics = dict(metrics, ncon_max=jnp.max(info["ncon"]))
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
        if self.mesh is not None:
            from ..parallel import dist

            st = dist.replicate(st, self.mesh)
            es = dist.shard_env(es, self.mesh)
        # initial obs from a fresh position pass
        obs = self._initial_obs(es)
        # resumes continue the step count; st.step counts SAC gradient
        # updates, which run utd per env-batch step (at utd 8 a resume
        # previously restarted 8x too far along and exited immediately)
        steps = int(st.step) // max(1, t.utd)
        start_steps = steps  # sps measures THIS process, not restored work
        t0 = time.time()
        rew_acc = []
        ncon_peak = 0
        while steps * t.num_envs < t.total_steps:
            st = self._apply_stage(st, steps * t.num_envs)
            if steps * t.num_envs < t.learning_starts:
                st, es, obs, rew, ncon = self._rollout_warm(st, es, obs)
                metrics = {}
            else:
                st, es, obs, rew, metrics = self._rollout(st, es, obs)
                ncon = metrics.pop("ncon_max", 0)
            steps += 1
            rew_acc.append(rew)
            if steps % t.log_every == 0:
                ncon_peak = max(ncon_peak, int(ncon))
                mean_rew = float(jnp.stack(rew_acc).mean())
                rew_acc = []
                line = {
                    "env_steps": steps * t.num_envs,
                    "mean_reward": round(mean_rew, 4),
                    "sps": round(
                        (steps - start_steps) * t.num_envs
                        / (time.time() - t0), 1
                    ),
                    "ncon_peak": ncon_peak,
                }
                for k, v in metrics.items():
                    line[k] = round(float(v), 4)
                progress(line)
            if (
                t.checkpoint_dir
                and steps % max(1, t.checkpoint_every // t.num_envs) == 0
            ):
                self.save(st, t.checkpoint_dir, steps * t.num_envs)
            if t.eval_every and steps % max(1, t.eval_every // t.num_envs) == 0:
                self._run_eval(st, steps * t.num_envs, progress)
        return st

    def evaluate(self, st: SACState, seed=0):
        """Deterministic-policy evaluation on a fresh env batch (the
        reference's EvaluationVideoCallback rollout, train_sac.py:60-105,
        batched on-device instead of a single DummyVecEnv).  Returns
        (mean_return, success_rate, frames) — frames only when
        tcfg.video_dir is set (first env lane, top camera)."""
        t = self.tcfg
        env = self.env
        es = env.reset(jax.random.PRNGKey(seed + 12345))
        obs = self._initial_obs(es)
        act_fn = jax.jit(
            lambda st, obs: self.sac.act(
                st, obs, jax.random.PRNGKey(0), deterministic=True
            )
        )
        B = t.num_envs
        returns = np.zeros(B)
        finished = np.zeros(B, bool)
        success = np.zeros(B, bool)
        frames = []
        renderer = env._renderer
        if t.video_dir and renderer is None and t.render_aux is not None:
            from ..render.rasterizer import Renderer

            renderer = self._eval_renderer = getattr(
                self, "_eval_renderer", Renderer(self.env.m, t.render_aux)
            )
        for _ in range(env.max_episode_steps):
            acts = act_fn(st, obs)
            es, obs, rew, term, trunc, info = env.step(es, acts)
            done = np.asarray(term | trunc)
            returns += np.asarray(rew) * ~finished
            success |= np.asarray(term) & ~finished
            if t.video_dir and renderer is not None and not finished[0]:
                s0 = jax.tree_util.tree_map(lambda a: a[0], es.physics)
                frames.append(np.asarray(renderer.render(s0, 240, 320, "top")))
            finished |= done
            if finished.all():
                break
        k = max(1, min(t.eval_episodes, B))
        return float(returns[:k].mean()), float(success[:k].mean()), frames

    def _run_eval(self, st, env_steps, progress):
        mean_ret, succ_rate, frames = self.evaluate(st)
        progress({
            "eval_at": env_steps,
            "eval_mean_return": round(mean_ret, 3),
            "eval_success_rate": round(succ_rate, 3),
        })
        t = self.tcfg
        if t.video_dir and frames:
            import imageio

            os.makedirs(t.video_dir, exist_ok=True)
            path = os.path.join(t.video_dir, f"eval_{env_steps}.mp4")
            imageio.mimsave(path, np.stack(frames), fps=50)
        if mean_ret > getattr(self, "_best_eval", -np.inf):
            self._best_eval = mean_ret
            if t.checkpoint_dir:
                best = os.path.join(t.checkpoint_dir, "best")
                self.save(st, best, env_steps)
        return mean_ret

    def _initial_obs(self, es):
        env = self.env

        @jax.jit
        def f(es):
            if env._renderer is not None:
                pix = jax.vmap(
                    lambda s1: env._renderer._render_impl(
                        s1, env.obs_height, env.obs_width,
                        env._renderer._cam["top"],
                    )
                )(es.physics)
                return {
                    "pixels": pix,
                    "agent_pos": es.physics.qpos[:, :6].astype(jnp.float32),
                }

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
