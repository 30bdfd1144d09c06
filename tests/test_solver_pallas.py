"""Fused whole-solve Pallas kernel vs the lanes scan path.

The f32 throughput solve (solver_lanes._solve_fused_pallas) runs the ENTIRE
Newton iteration — assembly, Cholesky, line search, masked termination —
inside one Pallas kernel.  It must be numerically equivalent to the lanes
scan path it replaces (which is itself pinned against vmap(solver.solve)
by test_efc_lanes).  On CPU the kernel runs in interpret mode; the
pallas_call boundary semantics are identical.
"""

import functools
import os

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd

XML = "gym_so100_tpu/assets/so100_transfer_cube.xml"
B = 128  # minimum batch that activates the fused path (B % 128 == 0)


@functools.lru_cache(maxsize=1)
def _settled_f32():
    """Settled contact-rich f32 batch at the fused path's minimum width."""
    m, _ = build_model(XML, max_contacts=16)
    m = m.astype(jnp.float32)
    rng = np.random.RandomState(3)
    s1 = fwd.make_state(m, dtype=jnp.float32)
    qpos = np.tile(np.asarray(s1.qpos), (B, 1))
    qpos[:, :6] += rng.uniform(-0.3, 0.3, (B, 6))
    qpos[:, 6:8] += rng.uniform(-0.05, 0.05, (B, 2))
    s = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B, *a.shape)), s1
    )
    s = s.replace(
        qpos=jnp.asarray(qpos, jnp.float32),
        ctrl=jnp.asarray(rng.uniform(-0.5, 0.5, (B, m.nu)), jnp.float32),
    )
    with _knob("0"):
        s = jax.jit(lambda s: fwd.n_steps_batched(m, s, 30)[0])(s)
    return m, s


class _knob:
    def __init__(self, val):
        self.val = val

    def __enter__(self):
        self.old = os.environ.get("GST_PALLAS_SOLVE")
        os.environ["GST_PALLAS_SOLVE"] = self.val

    def __exit__(self, *a):
        if self.old is None:
            os.environ.pop("GST_PALLAS_SOLVE", None)
        else:
            os.environ["GST_PALLAS_SOLVE"] = self.old


def test_fused_solve_matches_scan_path():
    """Same solution quality as the scan path.

    Bit-exact equality is not achievable across the two compilation paths
    (different f32 accumulation order), and the masked-termination rule
    `improvement < tol` sits on that rounding knife edge — so per-lane
    iteration counts may legitimately differ by a few on lanes that hover
    at the threshold.  What must hold: the returned accelerations and
    constraint forces agree to solver-tolerance-level accuracy on the
    overwhelming majority of lanes, and in aggregate."""
    m, s = _settled_f32()
    with _knob("0"):
        d_ref = jax.jit(lambda s: fwd.forward_batched(m, s))(s)
    with _knob("1"):
        d_fus = jax.jit(lambda s: fwd.forward_batched(m, s))(s)

    qr = np.asarray(d_ref.qacc)
    qf = np.asarray(d_fus.qacc)
    rms = float(np.sqrt((qr**2).mean()))
    err = np.abs(qf - qr).max(axis=1) / max(rms, 1.0)   # per-lane
    assert np.quantile(err, 0.95) < 1e-4, err.max()
    assert err.max() < 5e-2, err.max()

    fr = np.asarray(d_ref.qfrc_constraint)
    ff = np.asarray(d_fus.qfrc_constraint)
    frms = float(np.sqrt((fr**2).mean()))
    ferr = np.abs(ff - fr).max(axis=1) / max(frms, 1.0)
    # 5e-3, not 1e-3: under the test env's x64 flag the scan path picks up
    # partial f64 promotion that the f32-only kernel cannot (measured q95
    # 7.6e-4 with x64 off vs 3.6e-3 with it on, same binaries), and qfrc
    # on knife-edge lanes amplifies the different stopping iteration.  The
    # integration-relevant contract is the qacc bound above plus the
    # multistep trajectory test below.
    assert np.quantile(ferr, 0.95) < 5e-3, ferr.max()

    # iteration counts stay in the same regime (no systematic divergence)
    ni_r = np.asarray(d_ref.solver_niter, np.float64)
    ni_f = np.asarray(d_fus.solver_niter, np.float64)
    assert abs(ni_f.mean() - ni_r.mean()) < 0.5
    assert (ni_f != ni_r).mean() < 0.25


def test_fused_solve_multistep_trajectory():
    """10 substeps through the fused solve stay on the scan-path trajectory."""
    m, s = _settled_f32()
    with _knob("0"):
        s_ref, _ = jax.jit(lambda s: fwd.n_steps_batched(m, s, 10))(s)
    with _knob("1"):
        s_fus, _ = jax.jit(lambda s: fwd.n_steps_batched(m, s, 10))(s)
    # knife-edge termination lanes drift at rounding level and contact
    # dynamics amplify; pin the bulk tightly and the tail loosely
    dq = np.abs(np.asarray(s_fus.qpos) - np.asarray(s_ref.qpos)).max(axis=1)
    dv = np.abs(np.asarray(s_fus.qvel) - np.asarray(s_ref.qvel)).max(axis=1)
    assert np.quantile(dq, 0.95) < 1e-4, dq.max()
    assert dq.max() < 2e-2, dq.max()
    assert np.quantile(dv, 0.95) < 1e-2, dv.max()
