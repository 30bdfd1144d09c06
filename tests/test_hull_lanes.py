"""Pin the lanes hull collider to the per-env sampled-direction reference.

`hull_lanes.collide_hulls_lanes` must agree with the per-pair f32 math of
`gjk._dir_penetration` (same direction set, same support decomposition) on
randomized batched scene states — the layout rewrite may not change
semantics.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def model():
    from gym_so100_tpu.envs.gym_env import ASSETS_XML
    from gym_so100_tpu.models.builder import build_model

    m, _ = build_model(ASSETS_XML, max_contacts=24)
    return m.astype(jnp.float32)


def _random_states(m, B, seed):
    from gym_so100_tpu.ops import forward as fwd

    rng = np.random.RandomState(seed)
    s = fwd.make_state(m, dtype=jnp.float32)
    qpos = np.tile(np.asarray(s.qpos), (B, 1))
    # arm joints across their ranges + cube pose jitter so arm-link hulls
    # actually touch things in some lanes
    qpos[:, :6] += rng.uniform(-1.2, 1.2, (B, 6))
    qpos[:, 6:9] += rng.uniform(-0.08, 0.08, (B, 3))
    quat = rng.randn(B, 4)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    qpos[:, 9:13] = quat
    batched = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B, *a.shape)), s
    )
    return batched.replace(qpos=jnp.asarray(qpos, jnp.float32))


def test_hull_lanes_matches_reference(model):
    from gym_so100_tpu.ops import smooth
    from gym_so100_tpu.ops.collision import gjk, hull_lanes

    m = model
    B = 32
    s = _random_states(m, B, 0)
    d = jax.vmap(lambda s1: smooth.kinematics(m, s1))(s)

    pos, nrm, depth, act, pair_ids = jax.jit(
        lambda d: hull_lanes.collide_hulls_lanes(m, d)
    )(d)

    hulls = m.pairs.hull_box + m.pairs.hull_hull
    v_allT = np.asarray(m.hull_vertsT, np.float32)

    def ref_pair(b, k):
        g1, g2 = hulls[k]
        st1, st2 = m.hull_start[g1], m.hull_start[g2]
        v1 = tuple(
            jnp.asarray(v_allT[c, st1 : st1 + gjk.HULL_BLOCK]) for c in range(3)
        )
        v2 = tuple(
            jnp.asarray(v_allT[c, st2 : st2 + gjk.HULL_BLOCK]) for c in range(3)
        )
        return gjk._dir_penetration(
            d.geom_xpos[b, g1], d.geom_xmat[b, g1], v1,
            d.geom_xpos[b, g2], d.geom_xmat[b, g2], v2, jnp.float32,
        )

    rng = np.random.RandomState(1)
    checked_active = 0
    for b in rng.randint(0, B, 12):
        for k in rng.randint(0, len(hulls), 12):
            rd, rn, rp = ref_pair(int(b), int(k))
            np.testing.assert_allclose(
                float(depth[b, k]), float(rd), rtol=1e-5, atol=1e-6,
                err_msg=f"depth b={b} k={k}",
            )
            # normal/witness only meaningful on (near-)contacting pairs;
            # separated pairs are masked inactive and never consumed
            if float(rd) < 0.0:
                checked_active += 1
                np.testing.assert_allclose(
                    np.asarray(nrm[b, k]), np.asarray(rn), atol=1e-6,
                    err_msg=f"normal b={b} k={k}",
                )
                np.testing.assert_allclose(
                    np.asarray(pos[b, k]), np.asarray(rp), atol=1e-5,
                    err_msg=f"pos b={b} k={k}",
                )
    assert pair_ids.shape == (B, len(hulls))


def test_hull_lanes_active_mask(model):
    """Active flags: penetrating AND AABB-overlapping, like _hull_chunk."""
    from gym_so100_tpu.ops import smooth
    from gym_so100_tpu.ops.collision import hull_lanes

    m = model
    s = _random_states(m, 16, 3)
    d = jax.vmap(lambda s1: smooth.kinematics(m, s1))(s)
    pos, nrm, depth, act, _ = hull_lanes.collide_hulls_lanes(m, d)
    act = np.asarray(act)
    depth = np.asarray(depth)
    # every active slot penetrates; there is at least one active contact
    # somewhere in the batch (cube resting near the bin/table)
    assert np.all(depth[act] < 0.0)
    assert act.any()
