"""Full forward dynamics + integration: the mj_step equivalent.

One `step(m, state)` = the reference's `physics.step()` inner iteration
(/root/reference/gym_so100/env.py step -> dm_control -> mj_step), as a pure
jit/vmap-able function: smooth dynamics -> collision -> constraint assembly ->
Newton solve -> semi-implicit Euler.  `n_substeps` of these make one 0.02 s
control step (dm_control derives 10 substeps from the model's 0.002 s
timestep; cf. env.py:120-127).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..models.scene import Contact, Data, Model, State
from . import constraint as constraint_mod
from . import smooth
from . import solver as solver_mod
from .collision import narrowphase


def forward(m: Model, s: State) -> Data:
    """Forward dynamics: returns Data with qacc (post-constraint)."""
    d = smooth.forward_smooth(m, s)
    con = narrowphase.collide(m, d)
    d = d.replace(contact=con)
    efc = constraint_mod.make_efc(m, d, s, con)
    warm = s.qacc_warmstart
    qacc, qfrc, force, niter = solver_mod.solve(m, d, efc, warm)
    return d.replace(
        qacc=qacc, qfrc_constraint=qfrc, solver_niter=niter
    )


def step(m: Model, s: State) -> tuple[State, Data]:
    """One physics substep (mj_step semantics: forward then Euler)."""
    d = forward(m, s)
    s2 = smooth.integrate(m, s, d.qacc)
    s2 = s2.replace(qacc_warmstart=d.qacc)
    return s2, d


def n_steps(m: Model, s: State, n: int) -> State:
    """n physics substeps under lax.scan (one 0.02 s control step when
    n=10); returns the final State only — callers needing fresh
    position-stage quantities run `position_stage` on it (mj_step1
    semantics)."""

    def body(s, _):
        s2, _ = step(m, s)
        return s2, None

    s_final, _ = jax.lax.scan(body, s, None, length=n)
    return s_final


# ---------------------------------------------------------------------------
# Batched (lanes) variants — the TPU throughput path.  Identical semantics to
# vmap(step) etc., but collision runs in batch-last lanes form
# (narrowphase.collide_batched): profiled on-chip, vmapped box-box is ~97%
# of the whole substep at B=1024 purely through layout padding.
# ---------------------------------------------------------------------------


def forward_batched(m: Model, s: State) -> Data:
    """Batched forward dynamics; `s` leaves have a leading env axis.

    Smooth dynamics and collision run in batch-last lanes form
    (ops/smooth_lanes.py, ops/collision/boxbox_lanes.py); constraint
    assembly + Newton solve stay vmapped AoS.  Stages carry
    jax.named_scope annotations so profiler traces attribute device time."""
    from . import smooth_lanes

    with jax.named_scope("smooth"):
        sl = smooth_lanes.forward_smooth_lanes(m, s)
    qM_lanes = sl.pop("qM_lanes")
    sl.pop("qL", None)
    d = Data(
        geom_xpos=sl["geom_xpos"],
        geom_xmat=sl["geom_xmat"],
        site_xpos=sl["site_xpos"],
        site_xmat=sl["site_xmat"],
        # only the root row is consumed downstream (point_jacobians)
        subtree_com=sl["subtree_com0"][:, None, :],
        cdof=sl["cdof"],
        qM=sl["qM"],
        qacc_smooth=sl["qacc_smooth"],
        qfrc_actuator=sl["qfrc_actuator"],
        qfrc_passive=sl["qfrc_passive"],
        qfrc_bias=sl["qfrc_bias"],
        qfrc_smooth=sl["qfrc_smooth"],
    )
    with jax.named_scope("collide"):
        cl = narrowphase.collide_batched_lanes(m, d)
    # Contact buffer stays in lanes form end-to-end; Data carries only the
    # candidate count (the downstream consumers of contact are constraint
    # assembly — fed ContactLanes directly — and the saturation watch)
    d = d.replace(contact=Contact(
        dist=None, pos=None, frame=None, friction=None, solref=None,
        solimp=None, geom1=None, geom2=None, condim=None, active=None,
        ncand=cl.ncand,
    ))

    with jax.named_scope("efc"):
        from . import constraint_lanes

        efc = constraint_lanes.make_efc_from_lanes(m, d, s, cl)

    with jax.named_scope("solve"):
        from . import solver_lanes

        qacc, qfrc, niter = solver_lanes.solve_lanes(
            m, qM_lanes, d.qacc_smooth, efc, s.qacc_warmstart
        )
    return d.replace(qacc=qacc, qfrc_constraint=qfrc, solver_niter=niter)


def step_batched(m: Model, s: State) -> tuple[State, Data]:
    from . import smooth_lanes

    d = forward_batched(m, s)
    with jax.named_scope("integrate"):
        s2 = smooth_lanes.integrate_lanes(m, s, d.qacc)
    s2 = s2.replace(qacc_warmstart=d.qacc)
    return s2, d


def n_steps_batched(m: Model, s: State, n: int):
    """n physics substeps; returns (final State, ncon (B,) int32) where
    ncon is the max active narrowphase-candidate count over the substeps
    (the contact-buffer saturation watch surfaced as info["ncon"])."""
    # GST_SUBSTEP_UNROLL unrolls the substep scan (measured at B=4096
    # hulls-on: NO throughput change vs the while-loop form — the hot cost
    # is serialized small-table gathers inside the body, not loop-carry
    # staging — but compile time grows ~3x, so the scan stays the default).
    unroll = int(os.environ.get("GST_SUBSTEP_UNROLL", "1"))

    def body(carry, _):
        s, nc = carry
        s2, d = step_batched(m, s)
        return (s2, jnp.maximum(nc, d.contact.ncand)), None

    nc0 = jnp.zeros(s.qpos.shape[:-1], jnp.int32)
    (s_final, ncon), _ = jax.lax.scan(
        body, (s, nc0), None, length=n, unroll=min(unroll, n)
    )
    return s_final, ncon


def position_stage_batched(m: Model, s: State) -> Data:
    d = jax.vmap(lambda s1: smooth.kinematics(m, s1))(s)
    con = narrowphase.collide_batched(m, d)
    return d.replace(contact=con)


def position_stage(m: Model, s: State) -> Data:
    """mj_step1-equivalent position/collision refresh: kinematics + contacts
    for the *current* state, no constraint solve.  dm_control calls this
    after its substep loop so observations and rewards see the
    post-integration state; the env layer mirrors that."""
    d = smooth.kinematics(m, s)
    con = narrowphase.collide(m, d)
    return d.replace(contact=con)


def make_state(m: Model, qpos=None, qvel=None, ctrl=None, dtype=None) -> State:
    dtype = dtype or m.qpos0.dtype
    # mocap bodies start at their XML body pose (mj_resetData semantics)
    mocap_rows = [b for b in range(m.nbody) if m.body_mocapid[b] >= 0]
    if mocap_rows:
        order = sorted(mocap_rows, key=lambda b: m.body_mocapid[b])
        mocap_pos = m.body_pos[jnp.asarray(order)].astype(dtype)
        mocap_quat = m.body_quat[jnp.asarray(order)].astype(dtype)
    else:
        mocap_pos = jnp.zeros((0, 3), dtype)
        mocap_quat = jnp.zeros((0, 4), dtype)
    return State(
        qpos=jnp.asarray(qpos, dtype) if qpos is not None else m.qpos0.astype(dtype),
        qvel=jnp.zeros(m.nv, dtype) if qvel is None else jnp.asarray(qvel, dtype),
        ctrl=jnp.zeros(m.nu, dtype) if ctrl is None else jnp.asarray(ctrl, dtype),
        mocap_pos=mocap_pos,
        mocap_quat=mocap_quat,
        qacc_warmstart=jnp.zeros(m.nv, dtype),
    )
