"""Lanes smooth dynamics == vmapped AoS smooth dynamics (f64)."""

import pytest

pytestmark = pytest.mark.slow


import numpy as np

import jax
import jax.numpy as jnp

from gym_so100_tpu.envs import core
from gym_so100_tpu.envs.gym_env import ASSETS_XML
from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth, smooth_lanes


def test_forward_smooth_lanes_matches_aos():
    m, _ = build_model(ASSETS_XML, max_contacts=24)
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    es = jax.jit(jax.vmap(lambda k: core.reset(m, k)))(keys)
    s = es.physics
    # perturb into a generic (rotated, moving) configuration
    kq, kv, kc = jax.random.split(jax.random.PRNGKey(6), 3)
    s = s.replace(
        qpos=s.qpos + 0.05 * jax.random.normal(kq, s.qpos.shape),
        qvel=0.3 * jax.random.normal(kv, s.qvel.shape),
        ctrl=0.4 * jax.random.normal(kc, s.ctrl.shape),
    )

    ref = jax.jit(jax.vmap(lambda s1: smooth.forward_smooth(m, s1)))(s)
    out = jax.jit(lambda s1: smooth_lanes.forward_smooth_lanes(m, s1))(s)

    for name, a, b in [
        ("geom_xpos", out["geom_xpos"], ref.geom_xpos),
        ("geom_xmat", out["geom_xmat"], ref.geom_xmat),
        ("site_xpos", out["site_xpos"], ref.site_xpos),
        ("subtree_com0", out["subtree_com0"], ref.subtree_com[:, 0]),
        ("cdof", out["cdof"], ref.cdof),
        ("qM", out["qM"], ref.qM),
        ("qfrc_bias", out["qfrc_bias"], ref.qfrc_bias),
        ("qfrc_actuator", out["qfrc_actuator"], ref.qfrc_actuator),
        ("qacc_smooth", out["qacc_smooth"], ref.qacc_smooth),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-9, rtol=1e-9,
            err_msg=name,
        )

    # integrator equivalence
    qacc = out["qacc_smooth"]
    s_l = jax.jit(lambda s1, a: smooth_lanes.integrate_lanes(m, s1, a))(s, qacc)
    s_a = jax.jit(
        jax.vmap(lambda s1, a: smooth.integrate(m, s1, a))
    )(s, qacc)
    np.testing.assert_allclose(
        np.asarray(s_l.qpos), np.asarray(s_a.qpos), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(s_l.qvel), np.asarray(s_a.qvel), atol=1e-12
    )
