"""Narrowphase driver: static pair table -> fixed-size Contact buffer.

Replaces MuJoCo's broadphase+narrowphase (invoked from the reference's hot
loop, /root/reference/gym_so100/env.py step -> mj_step -> mj_collision).  The
candidate pair set is enumerated at build time with MuJoCo's filtering rules
(builder._collision_pairs); at runtime every candidate pair runs narrowphase
unconditionally (no data-dependent control flow) and the deepest
`max_contacts` penetrating points are gathered into the fixed Contact buffer
the constraint solver consumes.

TPU mapping: pairs are *batched*, not unrolled — one vmapped box-box kernel
over all box pairs and one vmapped GJK/EPA kernel over all hull pairs (hull
vertex arrays padded to a common size by repeating the first vertex, which
leaves support lookups unchanged).  This keeps the XLA program size constant
in the number of pairs and turns the pair dimension into vector lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.scene import Contact, Data, Model
from . import boxbox
from . import gjk as gjk_mod


def _select_smallest(key, K):
    """Indices of the K smallest entries of `key` (1-D, must be NaN-free).

    f32 throughput path: iterative argmin extraction — lax.top_k lowers to a
    full sort on TPU, far slower than K masked argmin reductions at our
    sizes.  f64 parity path keeps top_k (bit-stable legacy ordering)."""
    if key.dtype == jnp.float64:
        _, idx = jax.lax.top_k(-key, K)
        return idx
    k = key
    idx = []
    big = jnp.asarray(jnp.inf, key.dtype)
    for _ in range(K):
        i = jnp.argmin(k)
        idx.append(i)
        k = k.at[i].set(big)
    return jnp.stack(idx)


def collide(m: Model, d: Data) -> Contact:
    """Run all candidate pairs, select deepest max_contacts points."""
    dtype = d.geom_xpos.dtype
    chunks = []  # (pos (N,3), normal (N,3), depth (N,), active (N,), pair (N,))

    bb = m.pairs.box_box
    if bb:
        g1 = jnp.asarray([p[0] for p in bb], jnp.int32)
        g2 = jnp.asarray([p[1] for p in bb], jnp.int32)
        out = jax.vmap(boxbox.box_box)(
            d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
            d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2],
        )
        P, K = len(bb), boxbox.MAXP
        pair_ids = jnp.repeat(jnp.arange(P, dtype=jnp.int32), K)
        chunks.append((
            out["pos"].reshape(P * K, 3),
            jnp.repeat(out["normal"], K, axis=0),
            out["depth"].reshape(P * K),
            out["active"].reshape(P * K),
            pair_ids,
        ))

    hulls = m.pairs.hull_box + m.pairs.hull_hull
    if hulls:
        # --- AABB broadphase over hull pairs, then narrowphase on the KH
        # deepest-overlapping slots only.  Arm-link hulls touch something in
        # a tiny fraction of states; culling here is an 8x compute saving
        # that MuJoCo gets from its sweep-and-prune broadphase.
        v_allT = m.hull_vertsT.astype(dtype)
        g1 = jnp.asarray([p[0] for p in hulls], jnp.int32)
        g2 = jnp.asarray([p[1] for p in hulls], jnp.int32)
        st1 = jnp.asarray([m.hull_start[p[0]] for p in hulls], jnp.int32)
        st2 = jnp.asarray([m.hull_start[p[1]] for p in hulls], jnp.int32)

        # world AABBs of every hull-pair geom (block row = start / HULL_BLOCK)
        gset = sorted({g for p in hulls for g in p})
        gidx = jnp.asarray(gset, jnp.int32)
        rows = jnp.asarray(
            [m.hull_start[g] // gjk_mod.HULL_BLOCK for g in gset], jnp.int32
        )
        R = d.geom_xmat[gidx]
        wc = d.geom_xpos[gidx] + jnp.einsum(
            "gij,gj->gi", R, m.hull_lcen[rows].astype(dtype)
        )
        wh = jnp.einsum(
            "gij,gj->gi", jnp.abs(R), m.hull_lhalf[rows].astype(dtype)
        )
        pos_in_set = {g: i for i, g in enumerate(gset)}
        i1 = jnp.asarray([pos_in_set[p[0]] for p in hulls], jnp.int32)
        i2 = jnp.asarray([pos_in_set[p[1]] for p in hulls], jnp.int32)
        lo = jnp.maximum(wc[i1] - wh[i1], wc[i2] - wh[i2])
        hi = jnp.minimum(wc[i1] + wh[i1], wc[i2] + wh[i2])
        overlap = jnp.min(hi - lo, axis=-1)  # (P,) >0 means AABBs intersect

        KH = min(m.max_contacts // 2, len(hulls))
        slot = _select_smallest(-overlap, KH)
        ov = overlap[slot]
        collide_fn = gjk_mod.make_blocked_convex_convex(v_allT)
        out = jax.vmap(collide_fn)(
            d.geom_xpos[g1[slot]], d.geom_xmat[g1[slot]], st1[slot],
            d.geom_xpos[g2[slot]], d.geom_xmat[g2[slot]], st2[slot],
        )
        pair_ids = len(m.pairs.box_box) + slot.astype(jnp.int32)
        chunks.append((
            out["pos"], out["normal"], out["depth"],
            out["active"] & (ov > 0), pair_ids,
        ))

    pos = jnp.concatenate([c[0] for c in chunks])
    normal = jnp.concatenate([c[1] for c in chunks])
    depth = jnp.concatenate([c[2] for c in chunks])
    active = jnp.concatenate([c[3] for c in chunks])
    pair = jnp.concatenate([c[4] for c in chunks])

    # select deepest K among active (NaN-sanitized: inactive narrowphase
    # slots may carry inf/NaN depths, and argmin treats NaN as a minimum)
    K = m.max_contacts
    key = jnp.where(active & jnp.isfinite(depth), depth, jnp.inf)
    idx = _select_smallest(key, K)
    sel = lambda a: a[idx]
    pair_k = sel(pair)

    pair_geom = jnp.asarray(
        [list(p) for p in (m.pairs.box_box + m.pairs.hull_box + m.pairs.hull_hull)],
        jnp.int32,
    )
    condim = jnp.asarray(m.pair_condim, jnp.int32)

    # sanitize inactive slots: narrowphase fills them with inf/garbage, and
    # any non-finite value reaching the constraint rows poisons the masked
    # arithmetic downstream (0 * inf = NaN)
    act = sel(active)
    ez = jnp.zeros(3, dtype).at[2].set(1.0)
    n = jnp.where(act[:, None], sel(normal), ez[None])
    frame = _make_frame(n)
    return Contact(
        dist=jnp.where(act, sel(depth), 0.0),
        pos=jnp.where(act[:, None], sel(pos), 0.0),
        frame=frame,
        friction=m.pair_friction[pair_k],
        solref=m.pair_solref[pair_k],
        solimp=m.pair_solimp[pair_k],
        geom1=pair_geom[pair_k, 0],
        geom2=pair_geom[pair_k, 1],
        condim=condim[pair_k],
        active=act,
    )


def _quat_mat(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
    ])


def _make_frame(n):
    """Contact frame rows [normal, t1, t2] from normals (K, 3), MuJoCo
    mju_makeFrame convention: auxiliary axis = the world axis least aligned
    with n, t1 = aux x n normalized, t2 = n x t1."""
    an = jnp.abs(n)
    smallest = jnp.argmin(an, axis=-1)
    aux = jax.nn.one_hot(smallest, 3, dtype=n.dtype)
    t1 = jnp.cross(aux, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)
