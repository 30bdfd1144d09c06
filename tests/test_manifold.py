"""Oracle tests for the nativeccd-equivalent contact manifolds.

MuJoCo resolves every pair involving a mesh geom with its native convex
collider (GJK/EPA + manifold expansion); the reference env's hot loop
(/root/reference/gym_so100/env.py:172-182 -> mj_step -> mj_collision) hits it
for cube-vs-table and cube/arm mesh pairs.  ops/collision/manifold.py
replicates the expansion rules (face-face clip, edge-on-face, single point);
these tests pin them against the actual mujoco package on:

1. controlled two-mesh probes (the scenes used to reverse-engineer the
   rules): exact contact counts, depths to 1e-8, positions to 1e-6;
2. a randomized real-scene sweep: high pair-case agreement with tight
   depth errors on the matching cases.

MuJoCo is a *test oracle only* — the framework never imports it outside
tests/devtools.
"""

import math
import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

import mujoco

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.models.scene import State
from gym_so100_tpu.ops import smooth
from gym_so100_tpu.ops.collision import narrowphase

SCENE_XML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gym_so100_tpu", "assets", "so100_transfer_cube.xml",
)

PROBE_XML = """
<mujoco>
  <asset>
    <mesh name="slab" scale="0.1 0.1 0.02"
      vertex="-1 -1 -1  1 -1 -1  1 1 -1  -1 1 -1  -1 -1 1  1 -1 1  1 1 1  -1 1 1"/>
    <mesh name="cubemesh" scale="0.02 0.02 0.02"
      vertex="-1 -1 -1  1 -1 -1  1 1 -1  -1 1 -1  -1 -1 1  1 -1 1  1 1 1  -1 1 1"/>
  </asset>
  <worldbody>
    <body pos="0 0 0"><geom type="mesh" mesh="slab" name="g1"/></body>
    <body pos="0 0 1">
      <inertial pos="0 0 0" mass="0.1" diaginertia="1e-5 1e-5 1e-5"/>
      <freejoint/><geom type="mesh" mesh="cubemesh" name="g2"/>
    </body>
  </worldbody>
</mujoco>
"""


def _euler_to_quat(ex, ey, ez):
    """XYZ intrinsic, degrees (MJCF euler convention)."""
    cx, sx = math.cos(math.radians(ex) / 2), math.sin(math.radians(ex) / 2)
    cy, sy = math.cos(math.radians(ey) / 2), math.sin(math.radians(ey) / 2)
    cz, sz = math.cos(math.radians(ez) / 2), math.sin(math.radians(ez) / 2)
    def qmul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ])
    return qmul(qmul(np.array([cx, sx, 0, 0]), np.array([cy, 0, sy, 0])),
                np.array([cz, 0, 0, sz]))


@pytest.fixture(scope="module")
def probe_pair():
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as fh:
        fh.write(PROBE_XML)
        path = fh.name
    mjm = mujoco.MjModel.from_xml_path(path)
    mjd = mujoco.MjData(mjm)
    m, _ = build_model(path, max_contacts=24, ccd_manifolds=True)
    os.unlink(path)
    return mjm, mjd, m


def _collide_ours(m, qpos, nv):
    s = State(
        qpos=jnp.asarray(qpos, jnp.float64),
        qvel=jnp.zeros(nv, jnp.float64),
        ctrl=jnp.zeros(m.nu, jnp.float64),
        qacc_warmstart=jnp.zeros(nv, jnp.float64),
    )
    d = smooth.forward_smooth(m, s)
    return narrowphase.collide(m, d)


def _active_contacts(con):
    act = np.asarray(con.active)
    out = []
    for j in np.nonzero(act)[0]:
        out.append((float(np.asarray(con.dist)[j]), np.asarray(con.pos)[j]))
    return sorted(out, key=lambda t: (round(t[0], 9), tuple(np.round(t[1], 6))))


@pytest.mark.parametrize(
    "name,pos,euler",
    [
        ("aligned_face", (0, 0, 0.039), (0, 0, 0)),
        ("rot45_octagon", (0, 0, 0.039), (0, 0, 45)),
        ("half_overlap", (0.02, 0, 0.039), (0, 0, 0)),
        ("tilt_0p2deg_edge", (0, 0, 0.0405), (2, 0, 0)),
        ("edge_down_45", (0, 0, 0.02 + 0.02 * math.sqrt(2) - 0.001), (45, 0, 0)),
        ("corner_down", (0, 0, 0.02 + 0.02 * math.sqrt(3) - 0.001),
         (45, 35.26438968, 0)),
        ("separated", (0, 0, 0.06), (0, 0, 0)),
    ],
)
def test_probe_manifolds_match_mujoco(probe_pair, name, pos, euler):
    mjm, mjd, m = probe_pair
    q = np.zeros(7)
    q[:3] = pos
    q[3:] = _euler_to_quat(*euler)
    mjd.qpos[:] = q
    mujoco.mj_forward(mjm, mjd)
    ref = sorted(
        [(float(mjd.contact[j].dist), np.array(mjd.contact[j].pos))
         for j in range(mjd.ncon)],
        key=lambda t: (round(t[0], 9), tuple(np.round(t[1], 6))),
    )
    got = _active_contacts(_collide_ours(m, q, 6))
    assert len(got) == len(ref), (name, len(got), len(ref))
    for (rd, rp), (gd, gp) in zip(ref, got):
        assert abs(rd - gd) < 1e-8, name
        # greedy position match (orderings can differ within equal depth)
        best = min(np.linalg.norm(rp - g[1]) for g in got)
        assert best < 1e-6, (name, rp)


def test_scene_sweep_agreement():
    """Randomized arm/cube poses on the real scene: the manifold pipeline's
    contact sets agree with mj_collision on the overwhelming majority of
    pair-cases, with ~1e-9 depth error where counts match.  (The residual
    mismatches are deep-penetration configurations off the rollout
    distribution — devtools/sweep_manifold.py prints the breakdown.)"""
    mjm = mujoco.MjModel.from_xml_path(
        "/root/reference/gym_so100/assets/so100_transfer_cube.xml"
    )
    mjd = mujoco.MjData(mjm)
    m, _ = build_model(SCENE_XML, max_contacts=24, ccd_manifolds=True)

    mj_collidable = [
        g for g in range(mjm.ngeom)
        if mjm.geom_contype[g] != 0 or mjm.geom_conaffinity[g] != 0
    ]
    assert len(mj_collidable) == m.ngeom
    mj2ours = {g: i for i, g in enumerate(mj_collidable)}

    jr = np.array([mjm.jnt_range[j] for j in range(6)])
    rng = np.random.RandomState(0)
    cases = match = 0
    dist_errs = []
    for _ in range(30):
        q = np.zeros(mjm.nq)
        q[:6] = jr[:, 0] + rng.rand(6) * (jr[:, 1] - jr[:, 0])
        q[6:9] = [rng.uniform(-0.35, -0.1), rng.uniform(0.25, 0.5),
                  rng.uniform(0.02, 0.1)]
        ax = rng.randn(3)
        ax /= np.linalg.norm(ax)
        ang = rng.uniform(0, np.pi)
        q[9] = np.cos(ang / 2)
        q[10:13] = np.sin(ang / 2) * ax

        mjd.qpos[:] = q
        mujoco.mj_forward(mjm, mjd)
        ref = {}
        for j in range(mjd.ncon):
            c = mjd.contact[j]
            key = tuple(sorted((mj2ours.get(c.geom1, -1), mj2ours.get(c.geom2, -1))))
            ref.setdefault(key, []).append(float(c.dist))

        con = _collide_ours(m, q, m.nv)
        act = np.asarray(con.active)
        got = {}
        for j in np.nonzero(act)[0]:
            key = tuple(sorted((int(np.asarray(con.geom1)[j]),
                                int(np.asarray(con.geom2)[j]))))
            got.setdefault(key, []).append(float(np.asarray(con.dist)[j]))

        for key in set(ref) | set(got):
            cases += 1
            r = sorted(ref.get(key, []))
            g = sorted(got.get(key, []))
            if len(r) == len(g):
                match += 1
                dist_errs.extend(abs(a - b) for a, b in zip(r, g))

    assert cases > 20  # the sweep actually produced contact-rich states
    assert match / cases >= 0.80, (match, cases)
    assert np.median(dist_errs) < 1e-8
