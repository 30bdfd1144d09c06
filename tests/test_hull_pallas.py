"""Fused Pallas hull sweep+H kernel vs the XLA lanes path.

`hull_lanes._sweep_h_pallas` computes the support tables, per-pair overlap
H, depth, and winning-direction normal inside one VMEM-resident kernel.
It must reproduce the XLA lanes path bit-for-bit in structure (same
truncated chains, same argmin-first tie rule); on CPU the kernel runs in
interpret mode.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

B = 128  # minimum batch that activates the Pallas hull path


class _knob:
    def __init__(self, val):
        self.val = val

    def __enter__(self):
        self.old = os.environ.get("GST_PALLAS_HULL")
        os.environ["GST_PALLAS_HULL"] = self.val

    def __exit__(self, *a):
        if self.old is None:
            os.environ.pop("GST_PALLAS_HULL", None)
        else:
            os.environ["GST_PALLAS_HULL"] = self.old


def test_pallas_hull_matches_xla_lanes():
    from gym_so100_tpu.envs.gym_env import ASSETS_XML
    from gym_so100_tpu.models.builder import build_model
    from gym_so100_tpu.ops import smooth
    from gym_so100_tpu.ops.collision import hull_lanes

    m, _ = build_model(ASSETS_XML, max_contacts=16)
    m = m.astype(jnp.float32)
    rng = np.random.RandomState(11)
    from gym_so100_tpu.ops import forward as fwd

    s1 = fwd.make_state(m, dtype=jnp.float32)
    qpos = np.tile(np.asarray(s1.qpos), (B, 1))
    qpos[:, :6] += rng.uniform(-1.2, 1.2, (B, 6))
    qpos[:, 6:9] += rng.uniform(-0.08, 0.08, (B, 3))
    quat = rng.randn(B, 4)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    qpos[:, 9:13] = quat
    s = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B, *a.shape)), s1
    ).replace(qpos=jnp.asarray(qpos, jnp.float32))
    d = jax.vmap(lambda sx: smooth.kinematics(m, sx))(s)

    with _knob("0"):
        r_pos, r_nrm, r_dep, r_act, _ = jax.jit(
            lambda d: hull_lanes.collide_hulls_lanes(m, d, lanes_out=True)
        )(d)
    with _knob("1"):
        p_pos, p_nrm, p_dep, p_act, _ = jax.jit(
            lambda d: hull_lanes.collide_hulls_lanes(m, d, lanes_out=True)
        )(d)

    np.testing.assert_array_equal(np.asarray(p_act), np.asarray(r_act))
    np.testing.assert_allclose(
        np.asarray(p_dep), np.asarray(r_dep), atol=1e-6, rtol=1e-6
    )
    act = np.asarray(r_act)
    assert act.any(), "test setup produced no active hull contacts"
    for j in range(3):
        np.testing.assert_allclose(
            np.asarray(p_nrm[j])[act], np.asarray(r_nrm[j])[act],
            atol=1e-6, rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(p_pos[j])[act], np.asarray(r_pos[j])[act],
            atol=1e-5, rtol=1e-5,
        )
