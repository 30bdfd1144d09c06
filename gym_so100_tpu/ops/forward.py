"""Full forward dynamics + integration: the mj_step equivalent.

One `step(m, state)` = the reference's `physics.step()` inner iteration
(/root/reference/gym_so100/env.py step -> dm_control -> mj_step), as a pure
jit/vmap-able function: smooth dynamics -> collision -> constraint assembly ->
Newton solve -> semi-implicit Euler.  `n_substeps` of these make one 0.02 s
control step (dm_control derives 10 substeps from the model's 0.002 s
timestep; cf. env.py:120-127).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import Data, Model, State
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


def n_steps(m: Model, s: State, n: int) -> tuple[State, Data]:
    """n physics substeps under lax.scan; returns final state and last Data
    (the control-step granularity the env layer consumes)."""

    def body(s, _):
        s2, d = step(m, s)
        return s2, d

    s_final, ds = jax.lax.scan(body, s, None, length=n)
    d_final = jax.tree_util.tree_map(lambda a: a[-1], ds)
    return s_final, d_final


def make_state(m: Model, qpos=None, qvel=None, ctrl=None, dtype=None) -> State:
    dtype = dtype or m.qpos0.dtype
    return State(
        qpos=jnp.asarray(qpos, dtype) if qpos is not None else m.qpos0.astype(dtype),
        qvel=jnp.zeros(m.nv, dtype) if qvel is None else jnp.asarray(qvel, dtype),
        ctrl=jnp.zeros(m.nu, dtype) if ctrl is None else jnp.asarray(ctrl, dtype),
        mocap_pos=jnp.zeros((m.nmocap, 3), dtype),
        mocap_quat=jnp.tile(
            jnp.asarray([1.0, 0, 0, 0], dtype), (m.nmocap, 1)
        ),
        qacc_warmstart=jnp.zeros(m.nv, dtype),
    )
