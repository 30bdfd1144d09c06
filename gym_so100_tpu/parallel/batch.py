"""Batched lockstep env execution: vmap within a chip, shard_map across a mesh.

TPU-native replacement for the reference's SubprocVecEnv process fan-out
(/root/reference/scripts/train_sac.py:294-310, pickled pipes carrying obs
dicts): here the env batch is a single pytree with a leading env axis,
stepped by one fused XLA computation.  Auto-reset semantics follow
Gymnasium's vector env convention (reset obs returned on the step after
done), with truncation at the registered episode limits
(gym_so100/__init__.py:7,17,27).

Scaling story: `BatchedEnv.step` is vmapped; `shard()` places the env axis
on a `jax.sharding.Mesh` so the same jitted function runs SPMD across chips
(ICI) and hosts (DCN) with zero code change — XLA partitions the batch, and
no collectives are needed in the env step itself (embarrassingly parallel;
the learner introduces them).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..envs import constants as C
from ..envs import core
from ..models.scene import Model

EPISODE_LIMITS = {
    "so100_touch_cube": 300,
    "so100_touch_cube_sparse": 300,
    "so100_cube_to_bin": 700,
}


class BatchedEnv:
    """Functional batched env bound to (model, task).

    Usage:
        env = BatchedEnv(model, "so100_cube_to_bin", num_envs=4096)
        es = env.reset(jax.random.PRNGKey(0))
        es, obs, reward, terminated, truncated, info = env.step(es, actions)
    """

    def __init__(
        self, m: Model, task: str, num_envs: int, max_episode_steps=None,
        hull_contacts=True, obs_mode="state", obs_height=48, obs_width=64,
        render_aux=None,
    ):
        """obs_mode "state" -> flat (15,) state vector (env.py:137-146);
        "pixels_agent_pos" -> {"pixels": (H, W, 3) uint8 top-camera render,
        "agent_pos": (6,) qpos} (env.py:50-66) rendered on-device by the
        batched rasterizer (requires `render_aux` from build_model)."""
        if not hull_contacts:
            # reduced-contact mode: drop arm-mesh collision pairs.  The task
            # physics (cube vs table/pads/bin — all box pairs) is unaffected;
            # what is lost are incidental arm-link/table and jaw-shell/cube
            # contacts.  Training and the bench default to the FULL contact
            # set (the gather-elimination lanes pipeline made hulls-on fast;
            # PERF_NOTES "round 3"); this flag remains for quick experiments.
            import dataclasses

            m = dataclasses.replace(
                m, pairs=dataclasses.replace(m.pairs, hull_box=(), hull_hull=())
            )
        self.m = m
        self.task = task
        self.num_envs = num_envs
        self.max_episode_steps = max_episode_steps or EPISODE_LIMITS[task]
        self.ids = core.TaskIds.from_model(m)
        self.obs_mode = obs_mode
        self.obs_height = obs_height
        self.obs_width = obs_width
        self._renderer = None
        if obs_mode == "pixels_agent_pos":
            if render_aux is None:
                raise ValueError(
                    "pixels obs mode needs render_aux (the aux dict from "
                    "build_model)"
                )
            import os as _os

            from ..render.rasterizer import Renderer

            # obs-resolution frames (64x48 default) don't resolve the
            # 700-tri/mesh detail the interactive viewer uses; 100/mesh
            # (896 scene tris) is visually indistinguishable from 200 at
            # this scale (arm silhouette, cube, bin all intact) and
            # benches 1476 vs 654 env-steps/s @ 1024 envs
            # (GST_OBS_TRIS overrides; the committed pixel learning
            # artifact was trained at 200)
            self._renderer = Renderer(
                m, render_aux, tri_chunk=128,
                max_tris_per_mesh=int(_os.environ.get("GST_OBS_TRIS", "100")),
            )
        elif obs_mode != "state":
            raise ValueError(f"unknown obs_mode {obs_mode!r}")
        self._step = jax.jit(self._step_impl)
        self._reset = jax.jit(self._reset_impl)

    # -- implementation -----------------------------------------------------

    def _reset_impl(self, key):
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(lambda k: core.reset(self.m, k))(keys)

    def _obs_vector(self, obs):
        """Flat state observation (box, bin, ee, qpos) as in env.py:137-146."""
        return jnp.concatenate(
            [obs["box_position"], obs["bin_position"], obs["ee_position"],
             obs["qpos"]],
            axis=-1,
        ).astype(jnp.float32)

    def _step_impl(self, es, actions):
        from ..ops import smooth

        es2, obs, reward, terminated, d = core.step_batched(
            self.m, es, actions, self.ids, self.task
        )
        truncated = es2.t >= self.max_episode_steps
        done = terminated | truncated

        # The whole autoreset branch (fresh-state sampling, its second
        # kinematics/render pass, the merge) is gated on any(done): on the
        # overwhelming majority of steps no lane resets and the branch is
        # skipped at runtime (it used to cost ~4-6 ms/step at B=4096
        # unconditionally, PERF_NOTES round-4 item 4).  Determinism is
        # unaffected: the branch choice only changes the content of done
        # lanes, and key advancement lives in step_batched.
        def merge_fresh(es2):
            fresh = jax.vmap(lambda k: core.reset(self.m, k))(es2.key)
            es3 = jax.tree_util.tree_map(
                lambda f, c: jnp.where(
                    jnp.reshape(done, done.shape + (1,) * (f.ndim - 1)), f, c
                ),
                fresh, es2,
            )
            return fresh, es3

        if self._renderer is not None:
            # pixels obs: the TRUE terminal frame of the pre-autoreset
            # state goes to info["final_obs"] (truncated episodes bootstrap
            # from the frame they actually ended in); the returned obs at
            # done lanes is the fresh episode's first frame (Gymnasium
            # convention) — rendered only on steps where some lane resets.
            def render(ph):
                return jax.vmap(
                    lambda s1: self._renderer._render_impl(
                        s1, self.obs_height, self.obs_width,
                        self._renderer._cam["top"],
                    )
                )(ph)

            final_obs = {
                "pixels": render(es2.physics),
                "agent_pos": es2.physics.qpos[:, :6].astype(jnp.float32),
            }

            def with_reset(es2):
                _, es3 = merge_fresh(es2)
                return es3, {
                    "pixels": render(es3.physics),
                    "agent_pos": es3.physics.qpos[:, :6].astype(jnp.float32),
                }

            es3, obs_out = jax.lax.cond(
                jnp.any(done), with_reset, lambda es2: (es2, final_obs), es2
            )
            return es3, obs_out, reward, terminated, truncated, {
                "final_obs": final_obs, "ncon": d.ncon,
            }

        final_obs = self._obs_vector(obs)

        # Gymnasium autoreset convention: at episode boundaries the returned
        # obs is the FRESH episode's first observation (so the policy's next
        # action is computed from the state it will act in); the terminal
        # obs goes to info["final_obs"] for correct bootstrapping of the
        # boundary transition.  Sites only -> kinematics suffices, no
        # collision pass.
        def with_reset(es2):
            fresh, es3 = merge_fresh(es2)
            d0 = jax.vmap(lambda s1: smooth.kinematics(self.m, s1))(
                fresh.physics
            )
            reset_obs = self._obs_vector(
                jax.vmap(
                    lambda d1, s1: core.observations(self.m, d1, s1, self.ids)
                )(d0, fresh.physics)
            )
            return es3, jnp.where(done[:, None], reset_obs, final_obs)

        es3, obs_out = jax.lax.cond(
            jnp.any(done), with_reset, lambda es2: (es2, final_obs), es2
        )
        # info["ncon"]: active narrowphase candidates per env BEFORE the
        # deepest-K cull — ncon > max_contacts means the fixed buffer
        # saturated and shallow contacts were dropped (observable, not
        # silent; trainers log the running max)
        return es3, obs_out, reward, terminated, truncated, {
            "final_obs": final_obs, "ncon": d.ncon,
        }

    # -- public API ----------------------------------------------------------

    def reset(self, key):
        return self._reset(key)

    def step(self, es, actions):
        """Returns (state, obs (B, 15) f32, reward (B,), terminated (B,),
        truncated (B,), info) — obs at episode boundaries is the new
        episode's first observation; info["final_obs"] carries the terminal
        one (Gymnasium vector autoreset convention)."""
        return self._step(es, actions)

    # -- sharding -------------------------------------------------------------

    def shard(self, es, mesh, axis="env"):
        """Place the env-state batch on `mesh` along `axis`; subsequent jitted
        steps run SPMD with the batch partitioned across devices."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x):
            spec = P(axis, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map(put, es)
