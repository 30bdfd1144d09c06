"""Validate the nativeccd-equivalent manifold path against mujoco on
controlled two-mesh scenes (the probes used to reverse-engineer the rules).

Usage: python devtools/probe_manifold.py
"""

import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import mujoco
import numpy as np

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.models.scene import State
from gym_so100_tpu.ops import smooth
from gym_so100_tpu.ops.collision import narrowphase

XML = """
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


def euler_to_quat(ex, ey, ez):
    # XYZ intrinsic like MJCF euler (degrees)
    cx, sx = math.cos(math.radians(ex) / 2), math.sin(math.radians(ex) / 2)
    cy, sy = math.cos(math.radians(ey) / 2), math.sin(math.radians(ey) / 2)
    cz, sz = math.cos(math.radians(ez) / 2), math.sin(math.radians(ez) / 2)
    qx = np.array([cx, sx, 0, 0])
    qy = np.array([cy, 0, sy, 0])
    qz = np.array([cz, 0, 0, sz])

    def qmul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ])

    return qmul(qmul(qx, qy), qz)


def main():
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as fh:
        fh.write(XML)
        path = fh.name

    mjm = mujoco.MjModel.from_xml_path(path)
    mjd = mujoco.MjData(mjm)
    m, _ = build_model(path, max_contacts=24, ccd_manifolds=True)
    print("ccd pairs:", m.pairs.ccd)

    def ours(qpos):
        s = State(
            qpos=jnp.asarray(qpos, jnp.float64),
            qvel=jnp.zeros(6, jnp.float64),
            ctrl=jnp.zeros(0, jnp.float64),
            qacc_warmstart=jnp.zeros(6, jnp.float64),
        )
        d = smooth.forward_smooth(m, s)
        con = narrowphase.collide(m, d)
        return con

    cases = [
        ("aligned face", (0, 0, 0.039), (0, 0, 0)),
        ("rot45 octagon", (0, 0, 0.039), (0, 0, 45)),
        ("half overlap", (0.02, 0, 0.039), (0, 0, 0)),
        ("tilt 0.05deg", (0, 0, 0.02 + 0.02 / math.cos(math.radians(0.05)) - 0.0005), (0.05, 0, 0)),
        ("tilt 0.2deg edge", (0, 0, 0.0405), (2, 0, 0)),
        ("edge-down 45", (0, 0, 0.02 + 0.02 * math.sqrt(2) - 0.001), (45, 0, 0)),
        ("corner-down", (0, 0, 0.02 + 0.02 * math.sqrt(3) - 0.001), (45, 35.26438968, 0)),
        ("separated", (0, 0, 0.06), (0, 0, 0)),
    ]
    for name, pos, euler in cases:
        q = np.zeros(7)
        q[:3] = pos
        q[3:] = euler_to_quat(*euler)
        mjd.qpos[:] = q
        mujoco.mj_forward(mjm, mjd)
        ref = []
        for j in range(mjd.ncon):
            c = mjd.contact[j]
            ref.append((c.dist, tuple(np.round(c.pos, 7)), tuple(np.round(c.frame[:3], 5))))
        con = ours(q)
        act = np.asarray(con.active)
        got = []
        for j in range(len(act)):
            if not act[j]:
                continue
            got.append((
                float(np.asarray(con.dist)[j]),
                tuple(np.round(np.asarray(con.pos)[j], 7)),
                tuple(np.round(np.asarray(con.frame)[j, 0], 5)),
            ))
        print(f"== {name}: mj ncon={len(ref)} ours={len(got)}")
        for r in sorted(ref):
            print("   mj ", np.round(r[0], 8), r[1], r[2])
        for g in sorted(got):
            print("   us ", np.round(g[0], 8), g[1], g[2])


if __name__ == "__main__":
    main()
