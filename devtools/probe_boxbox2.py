"""Round-2 probe: find the 400 ms inside narrowphase.collide at B=1024.

probe_pallas showed dispatch overhead is ~5 ms fixed and compute is nearly
free, so the 400 ms per collide call must be specific pathological ops.
Times box_box sub-stages and the top-K selection in isolation.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import smooth
from gym_so100_tpu.ops.collision import boxbox, narrowphase

XML = "/root/reference/gym_so100/assets/so100_transfer_cube.xml"
B = 1024
dt = jnp.float32


def timed(name, fn, *args, n=3):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt_s = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt_s*1000:10.1f} ms", flush=True)
    return out


def main():
    m, _ = build_model(XML, max_contacts=24)
    m = m.astype(dt)
    import dataclasses
    m = dataclasses.replace(
        m, pairs=dataclasses.replace(m.pairs, hull_box=(), hull_hull=())
    )
    bb = m.pairs.box_box
    print(f"box pairs: {len(bb)}", flush=True)

    key = jax.random.PRNGKey(0)
    qpos = jnp.tile(m.qpos0.astype(dt)[None], (B, 1))
    qpos = qpos + 0.001 * jax.random.normal(key, qpos.shape, dt)

    # geom poses from kinematics (batched)
    from gym_so100_tpu.ops import forward as fwd

    def kin(q):
        s = fwd.make_state(m, qpos=q, dtype=dt)
        d = smooth.kinematics(m, s)
        return d.geom_xpos, d.geom_xmat

    gx, gm = jax.jit(jax.vmap(kin))(qpos)
    float(jnp.sum(gx))

    g1 = jnp.asarray([p[0] for p in bb], jnp.int32)
    g2 = jnp.asarray([p[1] for p in bb], jnp.int32)
    s1 = m.geom_size[g1]
    s2 = m.geom_size[g2]

    # args per env: gather pair poses
    def pair_args(gx, gm):
        return gx[:, g1], gm[:, g1], gx[:, g2], gm[:, g2]

    p1, R1, p2, R2 = jax.jit(pair_args)(gx, gm)
    float(jnp.sum(p1))
    P = len(bb)

    vv = lambda f: jax.vmap(jax.vmap(f, in_axes=(0, 0, 0, 0, 0, 0)),
                            in_axes=(0, 0, None, 0, 0, None))

    # 1. full box_box
    f_full = jax.jit(vv(boxbox.box_box))
    timed("full box_box (P x B)", f_full, p1, R1, s1, p2, R2, s2)

    # 2. SAT only
    def sat_only(p1, R1, s1, p2, R2, s2):
        C = R1.T @ R2
        t = R1.T @ (p2 - p1)
        absC = jnp.abs(C) + 1e-12
        sep1 = jnp.abs(t) - (s1 + absC @ s2)
        t2 = C.T @ t
        sep2 = jnp.abs(t2) - (s2 + absC.T @ s1)
        return jnp.max(jnp.concatenate([sep1, sep2]))

    timed("SAT face axes only", jax.jit(vv(sat_only)), p1, R1, s1, p2, R2, s2)

    # 3. edge axes
    def sat_edges(p1, R1, s1, p2, R2, s2):
        dtype = p1.dtype
        C = R1.T @ R2
        t = R1.T @ (p2 - p1)
        seps = []
        for i in range(3):
            for j in range(3):
                a = jnp.zeros(3, dtype).at[(i + 1) % 3].set(-C[(i + 2) % 3, j]).at[
                    (i + 2) % 3
                ].set(C[(i + 1) % 3, j])
                norm = jnp.linalg.norm(a)
                a = a / jnp.maximum(norm, 1e-12)
                aC = a @ C
                r1 = (
                    s1[(i + 1) % 3] * jnp.abs(a[(i + 1) % 3])
                    + s1[(i + 2) % 3] * jnp.abs(a[(i + 2) % 3])
                )
                r2 = (
                    s2[(j + 1) % 3] * jnp.abs(aC[(j + 1) % 3])
                    + s2[(j + 2) % 3] * jnp.abs(aC[(j + 2) % 3])
                )
                seps.append(jnp.abs(a @ t) - (r1 + r2))
        return jnp.max(jnp.stack(seps))

    timed("SAT edge axes (9)", jax.jit(vv(sat_edges)), p1, R1, s1, p2, R2, s2)

    # 4. one _clip_face for fixed axis (no argmax select)
    def one_face(p1, R1, s1, p2, R2, s2):
        dtype = p1.dtype
        C = R1.T @ R2
        t = R1.T @ (p2 - p1)
        pos, nrm, dep, act = boxbox._clip_face(0, 2, C, t, s1, s2, dtype)
        return dep

    timed("one _clip_face (ref0 ax2)", jax.jit(vv(one_face)), p1, R1, s1, p2, R2, s2)

    # 5. all 6 faces + select (= _face_contact)
    def face_contact(p1, R1, s1, p2, R2, s2):
        dtype = p1.dtype
        C = R1.T @ R2
        t = R1.T @ (p2 - p1)
        return boxbox._face_contact(2, C, t, s1, s2, dtype)[2]

    timed("_face_contact (6 faces + sel)", jax.jit(vv(face_contact)),
          p1, R1, s1, p2, R2, s2)

    # 6. edge contact only
    def edge_contact(p1, R1, s1, p2, R2, s2):
        dtype = p1.dtype
        C = R1.T @ R2
        t = R1.T @ (p2 - p1)
        ax = jnp.ones(3, dtype) / jnp.sqrt(3.0).astype(dt)
        return boxbox._edge_contact(4, ax, C, t, s1, s2, dtype)[2]

    timed("_edge_contact", jax.jit(vv(edge_contact)), p1, R1, s1, p2, R2, s2)

    # 7. top-K selection (iterative argmin, K=24 over P*8 per env)
    depths = jax.random.normal(key, (B, P * 8), dt)

    def topk(d):
        return narrowphase._select_smallest(d, 24)

    timed("_select_smallest K=24 (vmap)", jax.jit(jax.vmap(topk)), depths)

    # 8. full collide from Data
    def collide_from_q(q):
        s = fwd.make_state(m, qpos=q, dtype=dt)
        d = smooth.kinematics(m, s)
        return narrowphase.collide(m, d).dist

    timed("kinematics+collide (whole)", jax.jit(jax.vmap(collide_from_q)), qpos)


if __name__ == "__main__":
    main()
