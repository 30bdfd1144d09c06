"""End-to-end SAC+HER training: batched goal-conditioned envs on-device.

TPU-native counterpart of /root/reference/scripts/train_sac_her.py:220-254
(SO100GoalEnv + SAC(HerReplayBuffer(n_sampled_goal=4, strategy="future"),
lr 1e-4, batch 256, learning_starts 1000)).  Differences by design:

* the GoalEnv runs *batched inside jit* — goal sampling and the reference's
  5000-total-step curriculum (near-cube goals first, then bin interior,
  env.py:244-249,322-334) are pure functions of the env state;
* episodes are staged per env lane and flushed into the episode-structured
  `HerBuffer` at termination, so future-strategy relabeling happens
  on-device at sample time (agents/her.py);
* the goal-conditioned observation for the learner is concat(state_obs,
  goal) — the state analog of the reference's flattened pixels‖agent_pos
  observation (env.py:267-270).
"""

from __future__ import annotations

import dataclasses
import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..envs import constants as C
from ..envs import core
from ..envs.goal_env import compute_reward_jnp
from ..parallel.batch import BatchedEnv
from .her import HerBuffer
from .sac import SAC, SACConfig, SACState, _pytree


GOAL_DIM = 3
T_MAX = 300  # reference GoalEnv internal episode limit (env.py:200)


@dataclass(frozen=True)
class GoalEnvState:
    """Batched goal-conditioned env state."""

    es: core.EnvState          # batched physics env state
    goal: jnp.ndarray          # (B, 3)
    t: jnp.ndarray             # (B,) int32 step-in-episode
    total: jnp.ndarray         # () int32 total env steps (curriculum clock)


_pytree(GoalEnvState)


@dataclass(frozen=True)
class HERTrainState:
    sac: SACState
    her: HerBuffer
    genv: GoalEnvState
    # per-env episode staging
    st_obs: jnp.ndarray        # (B, T, obs_dim)
    st_act: jnp.ndarray        # (B, T, act_dim)
    st_next: jnp.ndarray       # (B, T, obs_dim)
    st_agoal: jnp.ndarray      # (B, T, 3)


_pytree(HERTrainState)


@dataclass
class HERConfig:
    num_envs: int = 32
    total_steps: int = 200_000
    learning_starts: int = 1_000       # train_sac_her.py:251
    her_episodes: int = 256            # episode capacity (r5: 64 -> 256; the
                                       # ref's 2000-transition buffer churned
                                       # successful episodes out too fast)
    her_ratio: float = 0.8             # n_sampled_goal=4 -> 4/5 relabeled
    utd: int = 1                       # gradient updates per env-batch step
    distance_threshold: float = 0.01   # env.py:241
    curriculum_steps: int = 5_000      # env.py:244-249
    log_every: int = 50
    checkpoint_dir: str | None = None
    checkpoint_every: int = 20_000
    hull_contacts: bool = True     # full contact set, same as TrainConfig
    max_episode_steps: int = T_MAX
    goal_min_dist: float = 0.0     # minimum distance between a sampled goal
                                   # and the cube's REST site estimate: with
                                   # 0 (the reference behavior) ~3% of
                                   # near-cube goals land within the success
                                   # threshold of where the cube settles on
                                   # its own, and those zero-skill episodes
                                   # ARE the r4 "random baseline" success
                                   # floor.  >0 pushes such goals radially
                                   # out so every success requires moving
                                   # the cube (demonstration lever, not a
                                   # reference semantic).


def _sample_goal(key, box_pose, total, curriculum_steps, dtype,
                 goal_min_dist=0.0):
    """Goal curriculum (env.py:244-249,322-334): first `curriculum_steps`
    TOTAL env steps sample within +-0.03 xy of the cube spawn, z in
    [0.01, 0.05]; afterwards the bin interior box.  `goal_min_dist` > 0
    additionally pushes goals that land within that radius of the cube's
    rest site estimate radially outward (see HERConfig.goal_min_dist)."""
    u = jax.random.uniform(key, (3,), dtype)
    near_lo = jnp.stack([box_pose[0] - 0.03, box_pose[1] - 0.03,
                         jnp.asarray(0.01, dtype)])
    near_hi = jnp.stack([box_pose[0] + 0.03, box_pose[1] + 0.03,
                         jnp.asarray(0.05, dtype)])
    bin_lo = jnp.asarray(
        [C.bin_min[0] + 0.005, C.bin_min[1] + 0.005, 0.01], dtype
    )
    bin_hi = jnp.asarray(
        [C.bin_max[0] - 0.005, C.bin_max[1] - 0.005, 0.05], dtype
    )
    early = total < curriculum_steps
    lo = jnp.where(early, near_lo, bin_lo)
    hi = jnp.where(early, near_hi, bin_hi)
    g = lo + u * (hi - lo)
    if goal_min_dist > 0.0:
        # cube rest site: spawn xy + the (0.01, 0.01, 0.01) site offset,
        # z = cube half-extent 0.02 + 0.01 once settled on the table
        rest = jnp.stack([box_pose[0] + 0.01, box_pose[1] + 0.01,
                          jnp.asarray(0.03, dtype)])
        delta = g - rest
        dist = jnp.linalg.norm(delta)
        g = jnp.where(
            dist < goal_min_dist,
            rest + delta * (goal_min_dist / jnp.maximum(dist, 1e-6)),
            g,
        )
    return g


class HERTrainer:
    """SAC+HER on batched goal envs; one jitted step = rollout + stage +
    flush-on-done + gradient update."""

    def __init__(self, model, cfg: HERConfig, sac_cfg: SACConfig | None = None):
        self.cfg = cfg
        self.env = BatchedEnv(
            model, "so100_cube_to_bin", cfg.num_envs,
            hull_contacts=cfg.hull_contacts,
        )
        base_obs = 15  # state obs vector (box, bin, ee, qpos), env.py:137-146
        self.obs_dim = base_obs
        self.sac = SAC(
            sac_cfg
            or SACConfig(obs_dim=base_obs + GOAL_DIM, act_dim=6, lr=1e-4,
                         buffer_size=1, batch_size=256)
        )
        self._rollout = jax.jit(self._rollout_impl)
        self._warmup = jax.jit(lambda ts, key: self._step_impl(ts, key, None))

    # -- goal env mechanics ---------------------------------------------------

    def reset(self, key) -> GoalEnvState:
        k1, k2 = jax.random.split(key)
        es = self.env.reset(k1)
        dtype = es.box_pose.dtype
        keys = jax.random.split(k2, self.cfg.num_envs)
        goal = jax.vmap(
            lambda k, bp: _sample_goal(
                k, bp, jnp.int32(0), self.cfg.curriculum_steps, dtype,
                self.cfg.goal_min_dist,
            )
        )(keys, es.box_pose)
        B = self.cfg.num_envs
        return GoalEnvState(
            es=es,
            goal=goal.astype(jnp.float32),
            t=jnp.zeros((B,), jnp.int32),
            total=jnp.zeros((), jnp.int32),
        )

    def _obs(self, es):
        """State obs vector from the current physics state (kinematics)."""
        from ..ops import smooth

        d = jax.vmap(lambda s1: smooth.kinematics(self.env.m, s1))(es.physics)
        o = jax.vmap(
            lambda d1, s1: core.observations(self.env.m, d1, s1, self.env.ids)
        )(d, es.physics)
        obs = self.env._obs_vector(o)
        agoal = d.site_xpos[:, self.env.ids.cube_site].astype(jnp.float32)
        return obs, agoal

    def _goal_step(self, genv: GoalEnvState, actions):
        """One goal-conditioned env step with autoreset + goal resampling."""
        cfg = self.cfg
        es2, obs, _task_rew, _term, d = core.step_batched(
            self.env.m, genv.es, actions, self.env.ids, self.env.task
        )
        next_obs = self.env._obs_vector(obs)
        agoal = d.site_xpos[:, self.env.ids.cube_site].astype(jnp.float32)
        reward = compute_reward_jnp(agoal, genv.goal, cfg.distance_threshold)
        success = reward >= 0.0
        t2 = genv.t + 1
        truncated = t2 >= cfg.max_episode_steps
        done = success | truncated

        # autoreset + fresh goal for done lanes
        fresh = jax.vmap(lambda k: core.reset(self.env.m, k))(es2.key)
        es3 = jax.tree_util.tree_map(
            lambda f, c: jnp.where(
                jnp.reshape(done, done.shape + (1,) * (f.ndim - 1)), f, c
            ),
            fresh, es2,
        )
        gk = jax.vmap(lambda k: jax.random.split(k)[1])(es3.key)
        dtype = es3.box_pose.dtype
        new_goal = jax.vmap(
            lambda k, bp: _sample_goal(
                k, bp, genv.total, cfg.curriculum_steps, dtype,
                cfg.goal_min_dist,
            )
        )(gk, es3.box_pose).astype(jnp.float32)
        goal2 = jnp.where(done[:, None], new_goal, genv.goal)
        genv2 = GoalEnvState(
            es=es3,
            goal=goal2,
            t=jnp.where(done, 0, t2),
            total=genv.total + cfg.num_envs,
        )
        return genv2, next_obs, agoal, reward, success, done, t2

    # -- train step -----------------------------------------------------------

    def _step_impl(self, ts: HERTrainState, key, _policy_obs_goal):
        """Shared warmup path: random actions, stage + flush, no update."""
        return self._do_step(ts, key, learn=False)

    def _rollout_impl(self, ts: HERTrainState, key):
        return self._do_step(ts, key, learn=True)

    def _do_step(self, ts: HERTrainState, key, learn):
        cfg = self.cfg
        B = cfg.num_envs
        k_act, k_sample = jax.random.split(key)

        obs, _ = self._obs(ts.genv.es)
        obs_goal = jnp.concatenate([obs, ts.genv.goal], -1)
        # running obs normalization over the goal-conditioned observation
        # (the analog of train.py:101-104; SAC._norm_obs consumes it)
        ts = dataclasses.replace(
            ts, sac=dataclasses.replace(
                ts.sac, normalizer=ts.sac.normalizer.update(obs_goal)
            )
        )
        if learn:
            acts = self.sac.act(ts.sac, obs_goal, k_act)
        else:
            acts = jax.random.uniform(k_act, (B, 6), jnp.float32, -1, 1)

        t_before = ts.genv.t  # (B,) index where this transition lands
        genv2, next_obs, agoal, reward, success, done, t_after = (
            self._goal_step(ts.genv, acts)
        )

        # stage the transition at [b, t_before[b]]
        def put(buf, val):
            return jax.vmap(lambda row, t, v: row.at[t].set(v))(
                buf, t_before, val
            )

        st_obs = put(ts.st_obs, obs)
        st_act = put(ts.st_act, acts)
        st_next = put(ts.st_next, next_obs)
        st_agoal = put(ts.st_agoal, agoal)

        # flush finished episodes into the HER buffer (sequential over lanes
        # to keep ring-pointer order deterministic)
        def flush(her, b):
            def do(her):
                return her.add_episode(
                    st_obs[b], st_act[b], st_next[b], st_agoal[b],
                    ts.genv.goal[b], t_after[b],
                )

            her = jax.lax.cond(done[b], do, lambda h: h, her)
            return her, None

        her, _ = jax.lax.scan(flush, ts.her, jnp.arange(B))

        sac = ts.sac
        metrics = {}
        if learn:
            zero = jnp.zeros((), jnp.float32)

            # utd gradient updates per env-batch step, as a lax.scan so a
            # high update-to-data ratio (the SB3 reference does ONE update
            # per ENV step — at 256 envs that is utd=256, train_sac_her.py
            # DummyVecEnv default) compiles in constant time instead of
            # unrolling utd SAC updates into the step graph.
            def one_update(s, k_u):
                batch = her.sample(
                    k_u, self.sac.cfg.batch_size, cfg.her_ratio,
                    cfg.distance_threshold,
                )

                def do_update(s):
                    s2, mt = self.sac.update(s, batch)
                    return s2, {
                        k: v.astype(jnp.float32) for k, v in mt.items()
                    }

                return jax.lax.cond(
                    her.n_eps > 0,  # no complete episodes yet -> skip update
                    do_update,
                    lambda s: (
                        s,
                        dict(critic_loss=zero, actor_loss=zero,
                             alpha=jnp.exp(s.log_alpha).astype(jnp.float32),
                             entropy=zero),
                    ),
                    s,
                )

            keys = jax.random.split(k_sample, max(1, cfg.utd))
            sac, mseq = jax.lax.scan(one_update, sac, keys)
            metrics = jax.tree_util.tree_map(lambda x: x[-1], mseq)
        ts2 = HERTrainState(
            sac=sac, her=her, genv=genv2,
            st_obs=st_obs, st_act=st_act, st_next=st_next, st_agoal=st_agoal,
        )
        # diagnostics for the HER pathology modes (PERF/VERDICT r4: success
        # was statistically indistinguishable from random): how far the cube
        # sits from the goal, and whether the policy touches the cube at all
        # — future-strategy relabeling only carries signal in episodes where
        # the achieved goal (cube) actually moves.
        diag = {
            "goal_dist": jnp.linalg.norm(agoal - ts.genv.goal, axis=-1).mean(),
            "cube_moved_frac": (
                jnp.linalg.norm(
                    agoal[:, :2] - ts.genv.es.box_pose[:, :2], axis=-1
                ) > 0.005
            ).astype(jnp.float32).mean(),
            # episode-level capability signal: of the episodes that ENDED
            # this step, how many ended in success (vs truncation) — the
            # per-step success_rate divides by episode length and so
            # understates capability ~300x at full-length episodes
            "ep_done": done.astype(jnp.float32).sum(),
            "ep_succ": success.astype(jnp.float32).sum(),
        }
        metrics = {**metrics, **diag}
        return ts2, reward, success, metrics

    # -- loop -----------------------------------------------------------------

    def init(self, seed=0) -> HERTrainState:
        cfg = self.cfg
        B = cfg.num_envs
        genv = self.reset(jax.random.PRNGKey(seed + 1))
        her = HerBuffer.create(
            cfg.her_episodes, cfg.max_episode_steps, self.obs_dim, 6
        )
        z = jnp.zeros
        return HERTrainState(
            sac=self.sac.init(jax.random.PRNGKey(seed)),
            her=her,
            genv=genv,
            st_obs=z((B, cfg.max_episode_steps, self.obs_dim), jnp.float32),
            st_act=z((B, cfg.max_episode_steps, 6), jnp.float32),
            st_next=z((B, cfg.max_episode_steps, self.obs_dim), jnp.float32),
            st_agoal=z((B, cfg.max_episode_steps, GOAL_DIM), jnp.float32),
        )

    def train(self, seed=0, progress=print, init_state=None):
        cfg = self.cfg
        ts = init_state if init_state is not None else self.init(seed)
        key = jax.random.PRNGKey(seed + 2)
        steps = 0
        t0 = time.time()
        succ_acc, rew_acc, epd_acc, eps_acc = [], [], [], []
        while steps * cfg.num_envs < cfg.total_steps:
            key, sub = jax.random.split(key)
            if steps * cfg.num_envs < cfg.learning_starts:
                ts, rew, succ, metrics = self._warmup(ts, sub)
            else:
                ts, rew, succ, metrics = self._rollout(ts, sub)
            steps += 1
            rew_acc.append(rew)
            succ_acc.append(succ)
            epd_acc.append(metrics.pop("ep_done", jnp.zeros(())))
            eps_acc.append(metrics.pop("ep_succ", jnp.zeros(())))
            if steps % cfg.log_every == 0:
                n_done = float(jnp.stack(epd_acc).sum())
                n_succ = float(jnp.stack(eps_acc).sum())
                line = {
                    "env_steps": steps * cfg.num_envs,
                    "mean_reward": round(float(jnp.stack(rew_acc).mean()), 4),
                    "success_rate": round(
                        float(jnp.stack(succ_acc).astype(jnp.float32).mean()), 4
                    ),
                    "ep_success_rate": round(n_succ / max(n_done, 1.0), 4),
                    "episodes_done": int(n_done),
                    "episodes_stored": int(ts.her.n_eps),
                    "sps": round(steps * cfg.num_envs / (time.time() - t0), 1),
                }
                for k, v in metrics.items():
                    line[k] = round(float(v), 4)
                progress(line)
                succ_acc, rew_acc, epd_acc, eps_acc = [], [], [], []
            if (
                cfg.checkpoint_dir
                and steps % max(1, cfg.checkpoint_every // cfg.num_envs) == 0
            ):
                self.save(ts, cfg.checkpoint_dir, steps * cfg.num_envs)
        return ts

    @staticmethod
    def _pack_zero_size(ts):
        """Orbax StandardCheckpointer refuses zero-size arrays (the joint
        scene has no mocap bodies, so es.physics.mocap_* are (0, ...)).
        Swap them for 1-element placeholders on save; restore swaps back
        (their content is vacuously empty, so this is lossless)."""
        return jax.tree_util.tree_map(
            lambda a: jnp.zeros((1,), a.dtype) if a.size == 0 else a, ts
        )

    def save(self, ts: HERTrainState, path, step):
        import orbax.checkpoint as ocp

        os.makedirs(path, exist_ok=True)
        p = os.path.abspath(os.path.join(path, f"her_ckpt_{step}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(p, self._pack_zero_size(ts))
        ckptr.wait_until_finished()
        return p

    def restore(self, path) -> HERTrainState:
        import orbax.checkpoint as ocp

        target = self.init(0)
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(path), self._pack_zero_size(target)
        )
        return jax.tree_util.tree_map(
            lambda t, r: t if t.size == 0 else r, target, restored
        )
