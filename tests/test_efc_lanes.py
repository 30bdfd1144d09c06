"""Lanes constraint assembly vs vmap(make_efc): exact row equality.

make_efc_batched recomputes the same Efc in batch-last lanes form; every
row array must match the vmapped AoS reference to roundoff on a settled
(in-contact) batch of states."""

import pytest

pytestmark = pytest.mark.slow


import functools

import jax
import jax.numpy as jnp
import numpy as np

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import constraint as constraint_mod
from gym_so100_tpu.ops import constraint_lanes
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth
from gym_so100_tpu.ops.collision import narrowphase

XML = "gym_so100_tpu/assets/so100_transfer_cube.xml"
B = 4


@functools.lru_cache(maxsize=1)
def _settled():
    """A small settled-in-contact batch, stepped once in f64 (cube resting
    on the table + arm under random ctrl, so contact/limit/floss rows are
    all live).  One compile config; f32 cases cast this state."""
    m, _ = build_model(XML, max_contacts=24)
    rng = np.random.RandomState(0)
    qpos = np.tile(np.asarray(m.qpos0)[None], (B, 1))
    qpos[:, :6] += rng.uniform(-0.1, 0.1, (B, 6))      # arm joints
    qpos[:, 6:8] += rng.uniform(-0.05, 0.05, (B, 2))   # cube x, y
    s1 = fwd.make_state(m)
    s = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B, *a.shape)).astype(jnp.float64),
        s1,
    )
    s = s.replace(
        qpos=jnp.asarray(qpos),
        ctrl=jnp.asarray(rng.uniform(-0.5, 0.5, (B, m.nu))),
    )
    s = jax.jit(lambda s: fwd.n_steps_batched(m, s, 50)[0])(s)
    return m, s


def _efc_pair(dtype):
    m, s = _settled()
    m = m.astype(dtype)
    s = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float64 else a, s
    )
    d = jax.vmap(lambda s1: smooth.forward_smooth(m, s1))(s)
    con = narrowphase.collide_batched(m, d)
    d = d.replace(contact=con)
    ref = jax.vmap(lambda d1, s1, c1: constraint_mod.make_efc(m, d1, s1, c1))(
        d, s, con
    )
    got = constraint_lanes.make_efc_batched(m, d, s, con)
    # sanity: the settled batch must actually have live contact rows
    assert np.asarray(ref.con_active).any()
    return ref, got


def _assert_tree_close(ref, got, rtol, atol):
    for name in ("J", "aref", "D", "R", "pos", "floss",
                 "con_mu", "con_uscale", "con_Dn"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(
            b, a, rtol=rtol, atol=atol, err_msg=f"Efc.{name}"
        )
    for name in ("is_floss", "is_limit", "con_active"):
        assert np.array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        ), f"Efc.{name}"
    assert (ref.neq, ref.nf, ref.nl) == (got.neq, got.nf, got.nl)


def test_efc_lanes_matches_vmap_f64():
    ref, got = _efc_pair(jnp.float64)
    _assert_tree_close(ref, got, rtol=1e-12, atol=1e-12)


def test_efc_lanes_matches_vmap_f32():
    ref, got = _efc_pair(jnp.float32)
    _assert_tree_close(ref, got, rtol=2e-5, atol=2e-5)


def test_step_batched_still_consistent_with_vmap_step():
    """forward_batched (lanes efc) vs vmap(step): same next state."""
    m, s = _settled()
    s_l, _ = jax.jit(lambda s: fwd.step_batched(m, s))(s)
    s_v = jax.jit(jax.vmap(lambda s1: fwd.step(m, s1)[0]))(s)
    np.testing.assert_allclose(
        np.asarray(s_l.qpos), np.asarray(s_v.qpos), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(s_l.qvel), np.asarray(s_v.qvel), rtol=1e-8, atol=1e-8
    )
