"""Multi-point contact manifolds for convex (mesh-involved) pairs — the
f64 parity path's equivalent of MuJoCo's native convex collider.

The reference's hot loop (/root/reference/gym_so100/env.py step -> mj_step ->
mj_collision) resolves every pair that involves a mesh geom with MuJoCo's
native GJK/EPA ("nativeccd"), which expands the single EPA witness into a
small contact manifold.  The expansion rules replicated here were
reverse-engineered against mujoco 3.10 with controlled two-mesh probes
(see tests/test_manifold.py):

* A hull face counts as *aligned* with the contact normal when its outward
  normal is within ALIGN_ANGLE = 1.6e-3 rad of (+/-) the EPA normal.
* both faces aligned   -> clip geom2's face polygon against geom1's
  (projected along the normal); contact points are the clipped polygon's
  vertices ON GEOM2'S FACE PLANE, shifted by -dist/2 along the normal
  (the mid-penetration surface).  At most 4 points are kept.
* one face aligned     -> the other geom contributes its support edge when
  that edge is within ALIGN_ANGLE of the contact plane: the edge segment is
  clipped against the aligned face polygon (2 points, on the edge, shifted
  half-depth toward the other geom).  Otherwise a single point.
* neither aligned      -> the single EPA witness midpoint.
* All manifold points share the EPA depth and normal (observed MuJoCo
  behavior: a tilted-face 4-point manifold reports the deepest point's
  depth on every row).

Geometry sources: exact (non-decimated) convex hulls and coplanar-merged
face polygons packed by the builder (models/hullpoly.py) — the f32
throughput path keeps the decimated 64-vert hulls and single-point
contacts; this module is compiled only into the f64 parity step.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...models.scene import Model
from . import gjk as gjk_mod

ALIGN_ANGLE = 1.6e-3    # rad; observed nativeccd face/edge alignment gate
MAXCON = 4              # manifold points per pair (observed cap)
CLIP_SLOTS = 100        # intersection of two <=49-gons has <= 98 vertices


def _clip_polygon(a2d, na_mask, b2d, nb_mask):
    """Sutherland-Hodgman: clip polygon b by convex polygon a's edges.

    a2d (Pa, 2) CCW with validity mask na_mask (padded verts repeat the
    last valid vertex is NOT assumed — padded edges are skipped); b2d
    (Pb, 2) with nb_mask.  Returns (pts (CLIP_SLOTS, 2), valid mask)."""
    Pa = a2d.shape[0]
    dtype = a2d.dtype

    # output buffer seeded with b
    pts = jnp.zeros((CLIP_SLOTS, 2), dtype).at[: b2d.shape[0]].set(b2d)
    valid = jnp.zeros((CLIP_SLOTS,), bool).at[: nb_mask.shape[0]].set(nb_mask)

    na = jnp.sum(na_mask)

    def clip_edge(carry, i):
        pts, valid = carry
        # edge i -> j of polygon a (j wraps over the valid prefix)
        j = jnp.where(i + 1 >= na, 0, i + 1)
        ea = a2d[i]
        eb = a2d[j]
        ed = eb - ea
        live = na_mask[i]

        # signed distance to the inside (left of CCW edge)
        h = (pts[:, 0] - ea[0]) * ed[1] - (pts[:, 1] - ea[1]) * ed[0]
        inside = h <= 0.0

        n_in = valid.shape[0]
        # SH pass over the current polygon (valid prefix, ordered): for each
        # vertex k with successor k2, emit the vertex if inside, plus the
        # edge-plane crossing if the edge (k, k2) straddles.
        cnt = jnp.sum(valid)
        idx = jnp.arange(n_in)
        k2 = jnp.where(idx + 1 >= cnt, 0, idx + 1)
        pk = pts
        pk2 = pts[k2]
        hk = h
        hk2 = h[k2]
        denom = hk - hk2
        t = hk / jnp.where(jnp.abs(denom) < 1e-300, 1e-300, denom)
        cross_pt = pk + t[:, None] * (pk2 - pk)
        keep_v = valid & inside
        keep_x = valid & (idx < cnt) & ((hk <= 0.0) != (hk2 <= 0.0))

        # compact [vertex slots ++ crossing slots] by exclusive prefix sums
        emit = jnp.concatenate([keep_v, keep_x])
        src = jnp.concatenate([pk, cross_pt], axis=0)
        # order: interleave per input edge (vertex k, then crossing k)
        order = jnp.stack([jnp.arange(n_in), n_in + jnp.arange(n_in)], -1).reshape(-1)
        emit_o = emit[order]
        src_o = src[order]
        dest = jnp.cumsum(emit_o) - 1
        newpts = jnp.zeros((CLIP_SLOTS, 2), dtype)
        newvalid = jnp.zeros((CLIP_SLOTS,), bool)
        dest_c = jnp.where(emit_o, dest, CLIP_SLOTS + 5)  # OOB rows drop
        newpts = newpts.at[dest_c].set(src_o, mode="drop")
        newvalid = newvalid.at[dest_c].set(emit_o, mode="drop")
        pts = jnp.where(live, newpts, pts)
        valid = jnp.where(live, newvalid, valid)
        return (pts, valid), None

    (pts, valid), _ = jax.lax.scan(
        clip_edge, (pts, valid), jnp.arange(Pa)
    )
    return pts, valid


def _reduce4(pts2d, valid, pts3d):
    """Keep at most 4 points: all of them when <=4 are valid, else a
    max-spread subset (MuJoCo's own >4 pruning follows its internal polygon
    vertex order, which is not reproducible — this case is geometrically
    rare and the subset differences are sub-facet-size)."""
    big = jnp.asarray(jnp.inf, pts2d.dtype)
    k = jnp.sum(valid)

    score0 = jnp.where(valid, pts2d[:, 0] * 1e3 + pts2d[:, 1], -big)
    i0 = jnp.argmax(score0)
    d1 = jnp.where(valid, jnp.sum((pts2d - pts2d[i0]) ** 2, -1), -big)
    i1 = jnp.argmax(d1)
    e = pts2d[i1] - pts2d[i0]
    cr = (pts2d[:, 0] - pts2d[i0, 0]) * e[1] - (pts2d[:, 1] - pts2d[i0, 1]) * e[0]
    i2 = jnp.argmax(jnp.where(valid, cr, -big))
    i3 = jnp.argmax(jnp.where(valid, -cr, -big))
    sel = jnp.stack([i0, i1, i2, i3])
    # when k <= 4: take the first 4 valid slots in clip order instead
    order_idx = jnp.cumsum(valid) - 1
    firstk = jnp.zeros((MAXCON,), jnp.int32)
    slot = jnp.where(valid, order_idx, MAXCON + 7)  # OOB rows drop
    firstk = firstk.at[slot].set(
        jnp.arange(valid.shape[0], dtype=jnp.int32), mode="drop"
    )
    use_first = k <= MAXCON
    sel = jnp.where(use_first, firstk, sel)
    act = jnp.where(
        use_first,
        jnp.arange(MAXCON) < k,
        # spread subset: dedupe (i2/i3 can coincide with i0/i1 on segments)
        jnp.array([True, True, True, True]),
    )
    if True:  # dedupe duplicated selections in the spread branch
        same = jnp.zeros((MAXCON,), bool)
        for a in range(MAXCON):
            for b in range(a):
                same = same.at[a].set(
                    same[a] | (~use_first & (sel[a] == sel[b]))
                )
        act = act & ~same
    return pts3d[sel], act


def _clip_segment(s0, s1, a2d, na_mask, t1, t2):
    """Clip 3D segment (s0, s1) against convex polygon a (2D, CCW) in the
    (t1, t2) plane.  Returns ((2,3) points, (2,) valid)."""
    p0 = jnp.stack([s0 @ t1, s0 @ t2])
    p1 = jnp.stack([s1 @ t1, s1 @ t2])
    na = jnp.sum(na_mask)
    Pa = a2d.shape[0]

    def body(carry, i):
        lo, hi, ok = carry
        j = jnp.where(i + 1 >= na, 0, i + 1)
        ea, eb = a2d[i], a2d[j]
        ed = eb - ea
        h0 = (p0[0] - ea[0]) * ed[1] - (p0[1] - ea[1]) * ed[0]
        h1 = (p1[0] - ea[0]) * ed[1] - (p1[1] - ea[1]) * ed[0]
        # inside: h <= 0; param x(t) = p0 + t (p1 - p0), h(t) linear
        dh = h1 - h0
        t_cross = h0 / jnp.where(jnp.abs(dh) < 1e-300, 1e-300, dh)
        both_out = (h0 > 0) & (h1 > 0)
        lo2 = jnp.where((h0 > 0) & (h1 <= 0), jnp.maximum(lo, t_cross), lo)
        hi2 = jnp.where((h0 <= 0) & (h1 > 0), jnp.minimum(hi, t_cross), hi)
        ok2 = ok & ~both_out
        live = na_mask[i]
        return (
            jnp.where(live, lo2, lo),
            jnp.where(live, hi2, hi),
            jnp.where(live, ok2, ok),
        ), None

    (lo, hi, ok), _ = jax.lax.scan(
        body,
        (jnp.zeros((), p0.dtype), jnp.ones((), p0.dtype), jnp.array(True)),
        jnp.arange(Pa),
    )
    ok = ok & (lo <= hi)
    pa = s0 + lo * (s1 - s0)
    pb = s0 + hi * (s1 - s0)
    return jnp.stack([pa, pb]), jnp.stack([ok, ok])


def _pair_manifold(
    p1, R1, w1, nv1, pn1, pvid1, pnv1,
    p2, R2, w2, nv2, pn2, pvid2, pnv2,
    core,
):
    """Expand one pair's EPA result into a <=4-point manifold.

    w1/w2: (Vmax, 3) world-frame hull verts (padded by repeating v0);
    nv1/nv2: () vert counts; pn: (Pmax, 3) world-frame polygon normals;
    pvid: (Pmax, PVmax) polygon vertex ids; pnv: (Pmax,) polygon sizes.
    core: dict from gjk._convex_core (pos/normal/depth/active).
    """
    dtype = p1.dtype
    n = core["normal"]
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-30)
    depth = core["depth"]
    cos_tol = jnp.asarray(np.cos(ALIGN_ANGLE), dtype)
    sin_tol = jnp.asarray(np.sin(ALIGN_ANGLE), dtype)

    # contact-plane basis
    ref = jnp.where(
        jnp.abs(n[0]) < 0.9,
        jnp.asarray([1.0, 0.0, 0.0], dtype),
        jnp.asarray([0.0, 1.0, 0.0], dtype),
    )
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-30)
    t2 = jnp.cross(n, t1)

    # best faces
    s1 = pn1 @ n
    s1 = jnp.where(pnv1 > 0, s1, -jnp.inf)
    f1 = jnp.argmax(s1)
    aligned1 = s1[f1] >= cos_tol
    s2 = -(pn2 @ n)
    s2 = jnp.where(pnv2 > 0, s2, -jnp.inf)
    f2 = jnp.argmax(s2)
    aligned2 = s2[f2] >= cos_tol

    # face polygons in world (padded slots repeat the first vertex)
    PV = pvid1.shape[1]
    ids1 = pvid1[f1]
    m1 = jnp.arange(PV) < pnv1[f1]
    poly1 = w1[jnp.clip(ids1, 0, w1.shape[0] - 1)]
    ids2 = pvid2[f2]
    m2 = jnp.arange(PV) < pnv2[f2]
    poly2 = w2[jnp.clip(ids2, 0, w2.shape[0] - 1)]

    a2d = jnp.stack([poly1 @ t1, poly1 @ t2], -1)
    b2d = jnp.stack([poly2 @ t1, poly2 @ t2], -1)

    # ---- case A: face-face clip (points on geom2's face plane) ----
    pts2d, cvalid = _clip_polygon(a2d, m1, b2d, m2)
    n2w = pn2[f2]
    c2 = poly2[0]
    q3 = pts2d[:, 0:1] * t1[None] + pts2d[:, 1:2] * t2[None]
    denom = jnp.where(jnp.abs(n @ n2w) < 1e-12, 1e-12, n @ n2w)
    lam = ((c2 - q3) @ n2w) / denom
    pts3d = q3 + lam[:, None] * n[None]
    ff_pts, ff_act = _reduce4(pts2d, cvalid, pts3d)
    ff_pts = ff_pts - 0.5 * depth * n[None]
    ff_ok = jnp.sum(cvalid) > 0

    # ---- case B: geom2 support edge on geom1's face ----
    sc2 = -(w2 @ n)
    sc2 = jnp.where(jnp.arange(w2.shape[0]) < nv2, sc2, -jnp.inf)
    iB0 = jnp.argmax(sc2)
    sc2b = sc2.at[iB0].set(-jnp.inf)
    iB1 = jnp.argmax(sc2b)
    eB = w2[iB1] - w2[iB0]
    eBn = eB / jnp.maximum(jnp.linalg.norm(eB), 1e-30)
    edge2_ok = jnp.abs(eBn @ n) <= sin_tol
    e2_pts, e2_act = _clip_segment(w2[iB0], w2[iB1], a2d, m1, t1, t2)
    e2_pts = e2_pts - 0.5 * depth * n[None]

    # ---- case C: geom1 support edge on geom2's face ----
    sc1 = w1 @ n
    sc1 = jnp.where(jnp.arange(w1.shape[0]) < nv1, sc1, -jnp.inf)
    iA0 = jnp.argmax(sc1)
    sc1b = sc1.at[iA0].set(-jnp.inf)
    iA1 = jnp.argmax(sc1b)
    eA = w1[iA1] - w1[iA0]
    eAn = eA / jnp.maximum(jnp.linalg.norm(eA), 1e-30)
    edge1_ok = jnp.abs(eAn @ n) <= sin_tol
    e1_pts, e1_act = _clip_segment(w1[iA0], w1[iA1], b2d, m2, t1, t2)
    e1_pts = e1_pts + 0.5 * depth * n[None]

    # ---- select ----
    single = jnp.concatenate([core["pos"][None], jnp.zeros((3, 3), dtype)])
    single_act = jnp.asarray([True, False, False, False])

    def pad2(pts, act):
        return (
            jnp.concatenate([pts, jnp.zeros((2, 3), dtype)]),
            jnp.concatenate([act, jnp.zeros((2,), bool)]),
        )

    e2_pts4, e2_act4 = pad2(e2_pts, e2_act)
    e1_pts4, e1_act4 = pad2(e1_pts, e1_act)

    use_ff = aligned1 & aligned2 & ff_ok
    use_e2 = aligned1 & ~aligned2 & edge2_ok & e2_act4[0]
    use_e1 = ~aligned1 & aligned2 & edge1_ok & e1_act4[0]

    pts = jnp.where(
        use_ff, ff_pts,
        jnp.where(use_e2, e2_pts4, jnp.where(use_e1, e1_pts4, single)),
    )
    act = jnp.where(
        use_ff, ff_act,
        jnp.where(use_e2, e2_act4, jnp.where(use_e1, e1_act4, single_act)),
    )
    act = act & core["active"]
    return dict(
        pos=pts,
        normal=jnp.broadcast_to(n, (MAXCON, 3)),
        depth=jnp.broadcast_to(depth, (MAXCON,)),
        active=act,
    )


def ccd_chunk(m: Model, d, dtype):
    """Manifold contacts for all nativeccd pairs (m.pairs.ccd).

    Returns (pos (P*4, 3), normal (P*4, 3), depth (P*4,), active (P*4,),
    pair_ids (P*4,)) for the narrowphase driver's global selection."""
    pairs = m.pairs.ccd  # ((g1, g2, flat_pair_id, slot1, slot2), ...)
    P = len(pairs)
    g1 = jnp.asarray([p[0] for p in pairs], jnp.int32)
    g2 = jnp.asarray([p[1] for p in pairs], jnp.int32)
    s1 = np.asarray([p[3] for p in pairs])
    s2 = np.asarray([p[4] for p in pairs])

    ev = m.exact_verts.astype(dtype)        # (GX, Vmax, 3) geom frame
    pnl = m.exact_polyn.astype(dtype)       # (GX, Pmax, 3) geom frame
    nv = jnp.asarray(m.exact_nvert, jnp.int32)
    pvid = m.exact_polyvid
    pnv = m.exact_polynv

    p1 = d.geom_xpos[g1]
    R1 = d.geom_xmat[g1]
    p2 = d.geom_xpos[g2]
    R2 = d.geom_xmat[g2]

    v1 = ev[s1]
    v2 = ev[s2]

    def one(p1, R1, v1, nv1, pn1, pvid1, pnv1, p2, R2, v2, nv2, pn2, pvid2, pnv2):
        w1 = v1 @ R1.T + p1
        w2 = v2 @ R2.T + p2
        core = gjk_mod._convex_core(
            p1, R1, (v1[:, 0], v1[:, 1], v1[:, 2]),
            p2, R2, (v2[:, 0], v2[:, 1], v2[:, 2]), jnp.zeros((), dtype),
        )
        return _pair_manifold(
            p1, R1, w1, nv1, pn1 @ R1.T, pvid1, pnv1,
            p2, R2, w2, nv2, pn2 @ R2.T, pvid2, pnv2,
            core,
        )

    out = jax.vmap(one)(
        p1, R1, v1, nv[s1], pnl[s1], pvid[s1], pnv[s1],
        p2, R2, v2, nv[s2], pnl[s2], pvid[s2], pnv[s2],
    )
    flat_ids = jnp.asarray([p[2] for p in pairs], jnp.int32)
    pair_ids = jnp.repeat(flat_ids, MAXCON)
    return (
        out["pos"].reshape(P * MAXCON, 3),
        out["normal"].reshape(P * MAXCON, 3),
        out["depth"].reshape(P * MAXCON),
        out["active"].reshape(P * MAXCON),
        pair_ids,
    )
