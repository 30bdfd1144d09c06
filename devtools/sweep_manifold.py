"""Randomized pose sweep: compare our ccd-manifold contact sets against
mj_collision on the real SO100 scene.

Samples arm configurations (uniform in joint range) and cube poses near the
workspace, runs both collision pipelines on identical qpos, and reports
per-pair agreement statistics (count matches, dist/pos errors).

Usage: python devtools/sweep_manifold.py [N]
"""

import os
import sys

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

XML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gym_so100_tpu", "assets", "so100_transfer_cube.xml",
)
REF_XML = "/root/reference/gym_so100/assets/so100_transfer_cube.xml"


def main():
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    mjm = mujoco.MjModel.from_xml_path(REF_XML)
    mjd = mujoco.MjData(mjm)
    m, _ = build_model(XML, max_contacts=24, ccd_manifolds=True)

    # map mj geom id -> our geom id: both enumerate collidable geoms in
    # document order (ours drops visual-only geoms)
    mj_collidable = [
        g for g in range(mjm.ngeom)
        if mjm.geom_contype[g] != 0 or mjm.geom_conaffinity[g] != 0
    ]
    assert len(mj_collidable) == m.ngeom, (len(mj_collidable), m.ngeom)
    mj2ours = {g: i for i, g in enumerate(mj_collidable)}
    mj_gname = [
        f"g{mj2ours[g]}" if g in mj2ours else f"noncol{g}"
        for g in range(mjm.ngeom)
    ]

    jr = np.array([mjm.jnt_range[j] for j in range(6)])

    @jax.jit
    def ours(qpos):
        s = State(
            qpos=qpos, qvel=jnp.zeros(m.nv, jnp.float64),
            ctrl=jnp.zeros(m.nu, jnp.float64),
            qacc_warmstart=jnp.zeros(m.nv, jnp.float64),
        )
        d = smooth.forward_smooth(m, s)
        return narrowphase.collide(m, d)

    rng = np.random.RandomState(0)
    stats = dict(states=0, states_touching=0, pair_cases=0, count_match=0,
                 pos_err=[], dist_err=[], extra=0, missing=0)
    mismatch_examples = []
    for it in range(n_samples):
        q = np.zeros(mjm.nq)
        q[:6] = jr[:, 0] + rng.rand(6) * (jr[:, 1] - jr[:, 0])
        # cube somewhere near the arm/table; sometimes in contact
        q[6:9] = [rng.uniform(-0.35, -0.1), rng.uniform(0.25, 0.5),
                  rng.uniform(0.02, 0.1)]
        ax = rng.randn(3); ax /= np.linalg.norm(ax)
        ang = rng.uniform(0, np.pi)
        q[9] = np.cos(ang / 2); q[10:13] = np.sin(ang / 2) * ax

        mjd.qpos[:] = q
        mujoco.mj_forward(mjm, mjd)
        ref = {}
        for j in range(mjd.ncon):
            c = mjd.contact[j]
            key = tuple(sorted((mj_gname[c.geom1], mj_gname[c.geom2])))
            ref.setdefault(key, []).append((c.dist, np.array(c.pos)))

        con = ours(jnp.asarray(q))
        act = np.asarray(con.active)
        got = {}
        for j in range(len(act)):
            if not act[j]:
                continue
            g1 = int(np.asarray(con.geom1)[j]); g2 = int(np.asarray(con.geom2)[j])
            key = tuple(sorted((f"g{g1}", f"g{g2}")))
            got.setdefault(key, []).append(
                (float(np.asarray(con.dist)[j]), np.asarray(con.pos)[j])
            )

        stats["states"] += 1
        if ref or got:
            stats["states_touching"] += 1
        for key in sorted(set(ref) | set(got)):
            r = sorted(ref.get(key, []), key=lambda t: t[0])
            g = sorted(got.get(key, []), key=lambda t: t[0])
            stats["pair_cases"] += 1
            if len(r) == len(g):
                stats["count_match"] += 1
                for (rd, rp), (gd, gp) in zip(r, g):
                    stats["dist_err"].append(abs(rd - gd))
                # positions: match greedily
                used = [False] * len(g)
                for rd, rp in r:
                    best, bi = 1e9, -1
                    for i, (gd, gp) in enumerate(g):
                        if used[i]:
                            continue
                        e = np.linalg.norm(rp - gp)
                        if e < best:
                            best, bi = e, i
                    if bi >= 0:
                        used[bi] = True
                        stats["pos_err"].append(best)
            else:
                stats["extra" if len(g) > len(r) else "missing"] += 1
                if len(mismatch_examples) < 12:
                    mismatch_examples.append(
                        (it, key, len(r), len(g),
                         [round(x[0], 6) for x in r], [round(x[0], 6) for x in g])
                    )

    pe = np.array(stats["pos_err"]) if stats["pos_err"] else np.zeros(1)
    de = np.array(stats["dist_err"]) if stats["dist_err"] else np.zeros(1)
    print(f"states: {stats['states']} (touching: {stats['states_touching']})")
    print(f"pair-cases: {stats['pair_cases']}  count-match: {stats['count_match']}"
          f"  ours-extra: {stats['extra']}  ours-missing: {stats['missing']}")
    print(f"dist err: mean {de.mean():.2e} p95 {np.percentile(de,95):.2e} max {de.max():.2e}")
    print(f"pos  err: mean {pe.mean():.2e} p95 {np.percentile(pe,95):.2e} max {pe.max():.2e}")
    for ex in mismatch_examples:
        print("  mismatch:", ex)


if __name__ == "__main__":
    main()
