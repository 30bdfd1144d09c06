"""Impact knife-edge regression probe (PARITY_NOTES.md, round 4).

Drives the reference env to the seed-7 step-56 arm-table impact and
evaluates both engines' forward solves at the knife-edge substep (a
near-singular Hessian with a large slipping pad contact).

BEFORE the descent guard (solver.py/solver_lanes.py): roundoff in the
Cholesky direction made phi'(0) >= 0, the zeroed line search tripped the
improvement-based stop, and the jitted f64 solve stranded qacc 28 away
from MuJoCo with cost 6.5% ABOVE the optimum — even jit-vs-eager of our
own solver disagreed by 28.

AFTER the guard (Jacobi-scaled steepest-descent fallback when the Newton
direction fails to descend), this probe must report jit-vs-eager
agreement at roundoff, both matching MuJoCo to ~1e-5 with scaled cost
spread below solver tolerance.

Usage: python devtools/probe_impact_knife.py
"""

import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

sys.modules.setdefault("gym", types.ModuleType("gym"))
import gymnasium as gym  # noqa: E402
from dm_control import mujoco as _dmj  # noqa: E402

_dmj.Physics.render = lambda self, height=480, width=640, **kw: np.zeros(
    (height, width, 3), np.uint8
)
import mujoco  # noqa: E402

import gym_so100  # noqa: E402,F401
import gym_so100_tpu as pkg  # noqa: E402


def main():
    ref = gym.make("gym_so100/SO100TouchCube-v0", obs_type="so100_state")
    ref.reset(seed=7)
    pr = ref.unwrapped._env.physics
    rng = np.random.RandomState(1007)
    acts = rng.uniform(-1, 1, size=(57, 6)).astype(np.float32)
    for a in acts[:56]:
        ref.step(a)

    from gym_so100_tpu.envs import constants as C
    from gym_so100_tpu.envs.gym_env import _cached_model
    from gym_so100_tpu.ops import constraint as cm
    from gym_so100_tpu.ops import forward as fwd
    from gym_so100_tpu.ops import linalg, smooth
    from gym_so100_tpu.ops import solver as solver_mod
    from gym_so100_tpu.ops.collision import narrowphase

    m, _ = _cached_model(
        os.path.join(os.path.dirname(pkg.__file__), "assets",
                     "so100_transfer_cube.xml"),
        "float64",
    )
    ctrl = np.asarray(C.unnormalize_so100(acts[56].astype(np.float64)))
    pr.set_control(ctrl)
    s = fwd.make_state(
        m, qpos=jnp.asarray(np.array(pr.data.qpos)),
        qvel=jnp.asarray(np.array(pr.data.qvel)), ctrl=jnp.asarray(ctrl),
    )
    s = s.replace(qacc_warmstart=jnp.asarray(np.array(pr.data.qacc_warmstart)))
    step1 = jax.jit(lambda s: fwd.step(m, s))
    for _ in range(6):
        mujoco.mj_step(pr.model.ptr, pr.data.ptr)
        s, _ = step1(s)
    print(
        "knife-edge entry state gap: dq %.2e dv %.2e"
        % (
            np.abs(np.array(pr.data.qpos) - np.asarray(s.qpos)).max(),
            np.abs(np.array(pr.data.qvel) - np.asarray(s.qvel)).max(),
        ),
        flush=True,
    )
    mujoco.mj_forward(pr.model.ptr, pr.data.ptr)
    qacc_mj = jnp.asarray(np.array(pr.data.qacc))

    qacc_eager = fwd.forward(m, s).qacc
    qacc_jit = jax.jit(lambda s: fwd.forward(m, s))(s).qacc
    print(
        "|qacc jit - eager| (OUR solver, same state): %.3e"
        % float(jnp.abs(qacc_jit - qacc_eager).max()),
        flush=True,
    )
    print(
        "|qacc eager - mujoco|: %.3e   |qacc jit - mujoco|: %.3e"
        % (
            float(jnp.abs(qacc_eager - qacc_mj).max()),
            float(jnp.abs(qacc_jit - qacc_mj).max()),
        ),
        flush=True,
    )

    d = smooth.forward_smooth(m, s)
    con = narrowphase.collide(m, d)
    d = d.replace(contact=con)
    efc = cm.make_efc(m, d, s, con)
    M, a0 = d.qM, d.qacc_smooth

    def total_cost(x):
        jar = linalg.matvec(efc.J, x) - efc.aref
        c, *_ = solver_mod._cost_terms(efc, jar)
        dx = x - a0
        return 0.5 * linalg.dot(dx, linalg.matvec(M, dx)) + c

    scale = 1.0 / (float(m.stat_meaninertia) * m.nv)
    for name, q in (("eager", qacc_eager), ("jit", qacc_jit), ("mujoco", qacc_mj)):
        print(f"cost({name:6s}) = {float(total_cost(q)):.12e}", flush=True)
    print(
        "scaled cost spread: %.3e (solver tol 1e-8) across answers up to "
        "%.1f apart in qacc (must be ~tol-level and ~0 after the guard)"
        % (
            scale * float(
                max(total_cost(q) for q in (qacc_eager, qacc_jit, qacc_mj))
                - min(total_cost(q) for q in (qacc_eager, qacc_jit, qacc_mj))
            ),
            float(max(
                jnp.abs(qacc_jit - qacc_eager).max(),
                jnp.abs(qacc_eager - qacc_mj).max(),
            )),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
