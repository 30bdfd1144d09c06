"""Batched Cartesian (end-effector) control: mocap weld as implicit IK.

TPU-native re-architecture of the reference's EE teleop capability
(/root/reference/scripts/teleop_ee.py:44-120): there, key presses nudge
`data.mocap_pos` / `data.ctrl[5]` on ONE env and MuJoCo's site weld
(so100_transfer_cube_ee.xml -> so_arm100_ee.xml, weld mocap_target_site <->
ee_site, solref "0.02 1" solimp "0.9 0.95 0.001") pulls the arm — the
constraint solver is the IK.  Here the same weld rows run *batched*: the
action is a per-env Cartesian mocap delta (+ gripper), the 6-row site-weld
equality constraints assemble under the lanes pipeline
(ops/constraint_lanes.make_efc_from_lanes -> constraint.equality_rows), and
thousands of envs track independent targets in one jitted XLA step.

The weld physics itself is oracle-pinned in tests/test_oracle_weld.py; the
batched==single and vmapped IK-tracking behavior here is pinned in
tests/test_ee_batched.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import Model
from ..ops import forward as fwd
from ..ops import smooth
from . import constants as C
from . import core

# reference teleop nudges: 0.01 m per mocap step, 0.05 per gripper step
# (teleop_ee.py:54-62,102-104); actions in [-1, 1] scale up to these
POS_SCALE = 0.01
GRIP_SCALE = 0.05
JAW_RANGE = (float(C.JOINT_RANGES[5, 0]), float(C.JOINT_RANGES[5, 1]))


class CartesianBatchedEnv:
    """Batched EE-space env over the mocap-weld scene.

    Action: (B, 4) float in [-1, 1] — mocap xyz delta (x POS_SCALE metres)
    and gripper ctrl delta (x GRIP_SCALE, clipped to the jaw joint range).
    The arm position actuators hold ctrl[:5] = 0 exactly as the reference
    teleop does; the weld constraint drags the arm after the target.

    Usage:
        m, _ = build_model(".../so100_transfer_cube_ee.xml")
        env = CartesianBatchedEnv(m.astype(jnp.float32), num_envs=1024)
        es = env.reset(jax.random.PRNGKey(0))
        es, obs, reward, terminated, truncated, info = env.step(es, acts)
    """

    def __init__(self, m: Model, num_envs: int, task: str = "so100_touch_cube",
                 max_episode_steps: int = 300, orientation_mode: str = "follow",
                 weld_gain: bool = True):
        """weld_gain: stiffen the weld on this env's model copy (solimp
        0.95/0.995, solref timeconst 0.01) so the target actually drags
        the arm — with the raw XML weld (solimp 0.9/0.95, solref 0.02)
        MuJoCo itself lags ~3.6 cm behind a 4 cm drag (gravity wins; the
        oracle-anchored measurement is in tests/test_oracle_weld.py:72),
        which is unusable as a control interface.  False keeps the
        reference scene's weld untouched.

        orientation_mode:
        * "follow" (default): the mocap quat tracks the CURRENT ee
          orientation each control step, so the weld's 3 rotation rows
          only damp wrist motion and its 3 translation rows do a feasible
          3-constraints-on-5-DoF position IK.  Holding a fixed target
          orientation while translating is 6 constraints on 5 arm DoF —
          generically infeasible, and the least-squares compromise costs
          ~4 cm of position error per 5 cm commanded.
        * "fixed": the reset orientation is held (the raw reference teleop
          behavior; orientation-constrained, position error expected)."""
        if not m.eq_site1:
            raise ValueError(
                "CartesianBatchedEnv needs a scene with a mocap weld "
                "(so100_transfer_cube_ee.xml); the joint-space scene has no "
                "equality rows to drive"
            )
        if orientation_mode not in ("follow", "fixed"):
            raise ValueError(orientation_mode)
        if weld_gain:
            import dataclasses

            import numpy as np

            si = np.array(np.asarray(m.eq_solimp), copy=True)
            si[:, 0] = 0.95
            si[:, 1] = 0.995
            sr = np.array(np.asarray(m.eq_solref), copy=True)
            sr[:, 0] = 0.01
            m = dataclasses.replace(
                m,
                eq_solimp=jnp.asarray(si, m.eq_solimp.dtype),
                eq_solref=jnp.asarray(sr, m.eq_solref.dtype),
            )
        self.m = m
        self.task = task
        self.num_envs = num_envs
        self.max_episode_steps = max_episode_steps
        self.orientation_mode = orientation_mode
        self.ids = core.TaskIds.from_model(m)
        self._step = jax.jit(self._step_impl)
        self._reset = jax.jit(self._reset_impl)

    # -- single-env transforms (vmapped/batched below) -----------------------

    def reset_one(self, key) -> core.EnvState:
        """Episode init: arm+cube as core.reset, mocap target ON the ee
        site — position AND orientation — so the 6-row weld starts at zero
        error (scripts/teleop_ee.py similarly starts the target at the
        ee; leaving the XML mocap orientation would make the weld yank
        the wrist with ~1e3 rad/s^2 torques on the first substep)."""
        from ..ops import quat as quat_ops

        es = core.reset(self.m, key)
        d = smooth.kinematics(self.m, es.physics)
        dtype = es.physics.mocap_pos.dtype
        s = es.physics.replace(
            mocap_pos=d.site_xpos[self.ids.ee_site][None].astype(dtype),
            mocap_quat=quat_ops.from_mat(
                d.site_xmat[self.ids.ee_site]
            )[None].astype(dtype),
        )
        return core.EnvState(
            physics=s, t=es.t, key=es.key, box_pose=es.box_pose
        )

    def apply_action(self, s, action):
        """Mocap delta + gripper ctrl delta -> new physics State.

        Single-env pure transform (vmapped by the batched step).  The arm
        servos (ctrl[:5]) track the CURRENT joint positions, so the kp=50
        position actuators act as pure dampers and the weld is free to
        place the arm (the reference teleop leaves ctrl at its default,
        which makes the actuators fight the weld); in "follow" mode the
        mocap orientation snaps to the current ee orientation (see
        __init__)."""
        from ..ops import quat as quat_ops

        a = jnp.clip(jnp.asarray(action), -1.0, 1.0).astype(s.qpos.dtype)
        mocap = s.mocap_pos + (a[None, :3] * POS_SCALE)
        jaw = jnp.clip(
            s.ctrl[5] + a[3] * GRIP_SCALE, JAW_RANGE[0], JAW_RANGE[1]
        )
        ctrl = jnp.concatenate(
            [s.qpos[:5], jaw[None]], axis=-1
        ).astype(s.ctrl.dtype)
        mq = s.mocap_quat
        if self.orientation_mode == "follow":
            dd = smooth.kinematics(self.m, s)
            mq = quat_ops.from_mat(
                dd.site_xmat[self.ids.ee_site]
            )[None].astype(mq.dtype)
        return s.replace(mocap_pos=mocap, ctrl=ctrl, mocap_quat=mq)

    # -- batched implementation ----------------------------------------------

    def _reset_impl(self, key):
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.reset_one)(keys)

    def _step_impl(self, es, actions):
        s = jax.vmap(self.apply_action)(es.physics, actions)
        s, ncon = fwd.n_steps_batched(self.m, s, C.N_SUBSTEPS)
        d = jax.vmap(lambda s1: smooth.kinematics(self.m, s1))(s)
        tg, tt = core._pair_contact_flags_batched(self.m, d, self.ids)
        reward, success = jax.vmap(
            lambda d1, f1, f2: core.task_reward(
                self.m, d1, self.ids, self.task, flags=(f1, f2)
            )
        )(d, tg, tt)
        obs = jax.vmap(
            lambda d1, s1: core.observations(self.m, d1, s1, self.ids)
        )(d, s)
        es2 = core.EnvState(
            physics=s, t=es.t + 1, key=es.key, box_pose=es.box_pose
        )
        terminated = reward == 4.0
        truncated = es2.t >= self.max_episode_steps
        ee_err = jnp.linalg.norm(
            d.site_xpos[:, self.ids.ee_site] - s.mocap_pos[:, 0], axis=-1
        )
        info = {"ncon": ncon, "ee_err": ee_err}
        obs_vec = jnp.concatenate(
            [obs["box_position"], obs["bin_position"], obs["ee_position"],
             obs["qpos"]],
            axis=-1,
        ).astype(jnp.float32)
        return es2, obs_vec, reward, terminated, truncated, info

    # -- public API ----------------------------------------------------------

    def reset(self, key):
        return self._reset(key)

    def step(self, es, actions):
        """Returns (state, obs (B, 15) f32, reward (B,), terminated (B,),
        truncated (B,), info with per-env "ee_err" weld tracking error and
        "ncon" contact-candidate watch)."""
        return self._step(es, actions)
