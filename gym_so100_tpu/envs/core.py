"""Functional env core: (state, action, key) -> (state, obs, reward, done).

The TPU-native replacement for the reference's dm_control task/env stack
(/root/reference/gym_so100/tasks/single_arm.py + env.py): pure jit/vmap-able
transforms over an EnvState pytree.  Task semantics (contact predicates,
staged rewards, success) replicate the reference exactly — validated against
it in tests/test_env_parity.py:

* touch_gripper: any contact between `red_box` and the 8 finger-pad geoms
  (single_arm.py:160-180);
* touch_table: red_box/table contact (single_arm.py:182);
* bin AABB from the `bin_center` site with hw 0.06, h 0.03, cube_half 0.01
  (single_arm.py:64-80 — note the reference uses cube_half=0.01 although the
  cube's real half size is 0.02; reproduced faithfully);
* TouchCube staged distance shaping + touch bonus + (-0.2) step penalty,
  success=4 when touching within 0.05 (single_arm.py:191-215);
* TouchCubeSparse: 4 or -0.2 (single_arm.py:246-285);
* CubeToBin ladder 1/2/2.5/3/4 (single_arm.py:363-380).

The in-reward progress prints (single_arm.py:211,367-376) are logging, not
semantics, and are dropped (impossible under jit).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.scene import Data, Model, State
from ..ops import forward as fwd
from . import constants as C

TASKS = ("so100_touch_cube", "so100_touch_cube_sparse", "so100_cube_to_bin")


@dataclass(frozen=True)
class EnvState:
    physics: State
    t: jnp.ndarray           # () int32 steps taken this episode
    key: jnp.ndarray         # PRNG key for auto-reset randomization
    box_pose: jnp.ndarray    # (7,) cube spawn used at episode start


jax.tree_util.register_dataclass(
    EnvState, data_fields=["physics", "t", "key", "box_pose"], meta_fields=[]
)


@dataclass(frozen=True)
class TaskIds:
    """Static geom/site ids the rewards need (resolved once per model)."""

    cube_geom: int
    table_geom: int
    pad_geoms: tuple
    cube_site: int
    ee_site: int
    bin_site: int

    @staticmethod
    def from_model(m: Model) -> "TaskIds":
        return TaskIds(
            cube_geom=m.geom_id("red_box"),
            table_geom=m.geom_id("table"),
            pad_geoms=tuple(
                m.geom_id(f"{side}_jaw_pad_{i}")
                for side in ("fixed", "moving")
                for i in range(1, 5)
            ),
            cube_site=m.site_id("cube_site"),
            ee_site=m.site_id("ee_site"),
            bin_site=m.site_id("bin_center"),
        )


def reset(m: Model, key, box_pose=None, dtype=None) -> EnvState:
    """Episode init (single_arm.py:299-309): arm to start pose, ctrl to start
    pose, cube free joint to box_pose (sampled if not given)."""
    dtype = dtype or m.qpos0.dtype
    key, sub = jax.random.split(key)
    if box_pose is None:
        box_pose = C.sample_so100_box_pose(sub, dtype=dtype)
    box_pose = jnp.asarray(box_pose, dtype)
    start = jnp.asarray(C.SO100_START_ARM_POSE, dtype)
    qpos = m.qpos0.astype(dtype).at[:6].set(start).at[-7:].set(box_pose)
    s = fwd.make_state(m, qpos=qpos, ctrl=start, dtype=dtype)
    return EnvState(
        physics=s,
        t=jnp.zeros((), jnp.int32),
        key=key,
        box_pose=box_pose,
    )


def _contact_flags(m: Model, d: Data, ids: TaskIds):
    """touch_gripper / touch_table from the fixed Contact buffer."""
    con = d.contact
    g1, g2 = con.geom1, con.geom2
    act = con.active
    pad_mask = jnp.zeros(m.ngeom, bool)
    for p in ids.pad_geoms:
        pad_mask = pad_mask.at[p].set(True)
    cube = ids.cube_geom
    touch_gripper = jnp.any(
        act & ((pad_mask[g1] & (g2 == cube)) | (pad_mask[g2] & (g1 == cube)))
    )
    tbl = ids.table_geom
    touch_table = jnp.any(
        act & (((g1 == cube) & (g2 == tbl)) | ((g1 == tbl) & (g2 == cube)))
    )
    return touch_gripper, touch_table


def _pair_contact_flags_batched(m: Model, d: Data, ids: TaskIds):
    """touch_gripper / touch_table via direct narrowphase on the 9 reward
    pairs (cube vs 8 finger pads, cube vs table) in batch-last lanes form.

    Equivalent to scanning the contact buffer for those geom pairs (the
    single-env `_contact_flags`) but independent of the deepest-K
    selection — matching the reference, which scans every contact
    (single_arm.py:160-182) — and ~7x cheaper than the full collision
    pass the batched position stage used to run just for these flags.
    Returns (touch_gripper (B,), touch_table (B,))."""
    from ..ops.collision import boxbox_lanes

    others = list(ids.pad_geoms) + [ids.table_geom]
    g1 = jnp.asarray(others, jnp.int32)
    cube = ids.cube_geom
    B = d.geom_xpos.shape[0]
    P = len(others)
    gx1 = d.geom_xpos[:, g1, :]                        # (B, P, 3)
    gm1 = d.geom_xmat[:, g1, :, :]
    gxc = d.geom_xpos[:, cube, :]                      # (B, 3)
    gmc = d.geom_xmat[:, cube, :, :]
    sz1 = m.geom_size[g1]                              # (P, 3)
    szc = m.geom_size[cube]
    p1 = tuple(gx1[..., k].T for k in range(3))        # each (P, B)
    R1 = tuple(
        tuple(gm1[..., j, k].T for k in range(3)) for j in range(3)
    )
    s1 = tuple(jnp.broadcast_to(sz1[:, k][:, None], (P, B)) for k in range(3))
    p2 = tuple(jnp.broadcast_to(gxc[:, k][None], (P, B)) for k in range(3))
    R2 = tuple(
        tuple(
            jnp.broadcast_to(gmc[:, j, k][None], (P, B)) for k in range(3)
        )
        for j in range(3)
    )
    s2 = tuple(jnp.broadcast_to(szc[k], (P, B)) for k in range(3))
    out = boxbox_lanes.box_box_lanes(p1, R1, s1, p2, R2, s2)
    touching = out["active"][0]
    for a in out["active"][1:]:
        touching = touching | a                        # (P, B) any slot
    return jnp.any(touching[:-1], axis=0), touching[-1]


def _bin_aabb(d: Data, ids: TaskIds):
    """Reference _precompute_bin_aabb (single_arm.py:64-75)."""
    center = d.site_xpos[ids.bin_site]
    hw, h = 0.06, 0.03
    off = jnp.asarray([hw, hw, 0.0], center.dtype)
    bin_lo = center - off
    bin_hi = center + jnp.asarray([hw, hw, h], center.dtype)
    return bin_lo, bin_hi


def task_reward(m: Model, d: Data, ids: TaskIds, task: str, flags=None):
    """Per-step reward + success for the given task (static switch).

    `flags` optionally supplies precomputed (touch_gripper, touch_table)
    scalars (the batched path derives them from a direct pair narrowphase,
    `_pair_contact_flags_batched`); otherwise they come from the contact
    buffer as in the single-env path."""
    cube_pos = d.site_xpos[ids.cube_site]
    if task == "so100_cube_to_bin":
        # reference casts via get_cube_position -> float32 (single_arm.py:320)
        cube_pos = cube_pos.astype(jnp.float32).astype(cube_pos.dtype)
    ee_pos = d.site_xpos[ids.ee_site]
    dist = jnp.linalg.norm(ee_pos - cube_pos)
    if flags is None:
        touch_gripper, touch_table = _contact_flags(m, d, ids)
    else:
        touch_gripper, touch_table = flags
    bin_lo, bin_hi = _bin_aabb(d, ids)
    dtype = cube_pos.dtype

    if task == "so100_touch_cube":
        r = jnp.zeros((), dtype)
        for thresh, scale in ((0.7, 0.1), (0.5, 0.2), (0.3, 0.5), (0.1, 1.0), (0.05, 2.0)):
            r = jnp.where(
                dist < thresh, jnp.maximum(r, scale * (1 - dist / thresh)), r
            )
        r = r + jnp.where(touch_gripper, 1.0, 0.0)
        success = touch_gripper & (dist < 0.05)
        reward = jnp.where(success, jnp.asarray(4.0, dtype), r - 0.2)
        return reward, success

    if task == "so100_touch_cube_sparse":
        success = touch_gripper & (dist < 0.05)
        reward = jnp.where(success, jnp.asarray(4.0, dtype), jnp.asarray(-0.2, dtype))
        return reward, success

    if task == "so100_cube_to_bin":
        cube_half = 0.01
        over_bin = (
            (bin_lo[0] < cube_pos[0]) & (cube_pos[0] < bin_hi[0])
            & (bin_lo[1] < cube_pos[1]) & (cube_pos[1] < bin_hi[1])
        )
        inside = jnp.all((cube_pos - cube_half > bin_lo) & (cube_pos + cube_half < bin_hi))
        released = inside & ~touch_gripper
        lifted = touch_gripper & ~touch_table
        r = jnp.zeros((), dtype)
        r = jnp.where(touch_gripper, 1.0, r)
        r = jnp.where(lifted, 2.0, r)
        r = jnp.where(over_bin, 2.5, r)
        r = jnp.where(inside, 3.0, r)
        r = jnp.where(released, 4.0, r)
        return r, released

    raise NotImplementedError(task)


def observations(m: Model, d: Data, s: State, ids: TaskIds):
    """Raw obs features (single_arm.py:82-113 minus camera renders, which the
    render layer adds for pixel obs types)."""
    qpos6 = s.qpos[:6]
    qvel6 = s.qvel[:6]
    env_state = s.qpos[6:]
    cube_pos = d.site_xpos[ids.cube_site]
    ee_pos = d.site_xpos[ids.ee_site]
    bin_center = d.site_xpos[ids.bin_site]
    return dict(
        qpos=qpos6,
        qvel=qvel6,
        env_state=env_state,
        box_position=cube_pos,
        bin_position=bin_center,
        ee_position=ee_pos,
    )


def step(m: Model, es: EnvState, action, ids: TaskIds, task: str):
    """One control step: unnormalize action -> 10 substeps -> obs/reward.

    Mirrors env.py:172-182 + the dm_control Environment.step it wraps:
    terminated = (reward == 4); truncation is the adapter's job.
    """
    act6 = C.unnormalize_so100(jnp.asarray(action)[:6].astype(es.physics.qpos.dtype))
    s = es.physics.replace(ctrl=act6)
    s = fwd.n_steps(m, s, C.N_SUBSTEPS)
    # dm_control refreshes position-stage quantities (kinematics + contacts)
    # after the substep loop (mj_step1), so obs/rewards see the
    # post-integration state
    d = fwd.position_stage(m, s)
    reward, success = task_reward(m, d, ids, task)
    obs = observations(m, d, s, ids)
    terminated = reward == 4.0
    es2 = EnvState(
        physics=s, t=es.t + 1, key=es.key, box_pose=es.box_pose
    )
    return es2, obs, reward, terminated, d


def step_batched(m: Model, es: EnvState, actions, ids: TaskIds, task: str):
    """Batched `step`: identical semantics to vmap(step) over a leading env
    axis, but the physics substeps run through fwd.step_batched so the
    collision stage uses the batch-last lanes kernels (the TPU throughput
    path; see ops/collision/boxbox_lanes.py)."""
    from ..ops import smooth

    act6 = C.unnormalize_so100(
        jnp.asarray(actions)[..., :6].astype(es.physics.qpos.dtype)
    )
    s = es.physics.replace(ctrl=act6)
    s, ncon = fwd.n_steps_batched(m, s, C.N_SUBSTEPS)
    # position-stage refresh (mj_step1 semantics): obs/rewards need sites
    # (kinematics) and the reward contact predicates only — the latter run
    # directly on the 9 reward pairs instead of an 11th full collision pass
    # per control step (~7% of step time saved)
    d = jax.vmap(lambda s1: smooth.kinematics(m, s1))(s)
    d = d.replace(ncon=ncon)
    tg, tt = _pair_contact_flags_batched(m, d, ids)
    reward, success = jax.vmap(
        lambda d1, f1, f2: task_reward(m, d1, ids, task, flags=(f1, f2))
    )(d, tg, tt)
    obs = jax.vmap(lambda d1, s1: observations(m, d1, s1, ids))(d, s)
    terminated = reward == 4.0
    es2 = EnvState(
        physics=s, t=es.t + 1, key=es.key, box_pose=es.box_pose
    )
    return es2, obs, reward, terminated, d
