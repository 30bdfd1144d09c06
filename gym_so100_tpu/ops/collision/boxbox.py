"""Box-box narrowphase: SAT over 15 axes + reference-face clipping.

TPU-native replacement for the box-box path of MuJoCo's collision pipeline
(the reference scene's critical contacts — cube/finger-pads, cube/bin walls,
cube/table-top — are all box pairs after the builder canonicalizes the 8-vert
table mesh to a box; cf. /root/reference/gym_so100/assets/so100_transfer_cube.xml:11
and scene_so100.xml:19-21).  Pure function of poses, fixed output size
(MAXP=8 candidate points + active mask), no data-dependent control flow, so it
vmaps over the static pair table and over env batches.

Face-face contact produces the clipped-polygon corner contacts MuJoCo emits
for a box resting on the table (4 corners); edge-edge cases produce a single
closest-point contact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAXP = 8  # max contact points per box pair

# prefer face axes over edge axes (classic SAT fudge; avoids flickering
# between nearly-tied face/edge axes on resting contact)
_EDGE_FUDGE = 1.05


def box_box(p1, R1, s1, p2, R2, s2, margin=0.0):
    """Collide two boxes.

    Args: centers (3,), world rotations (3,3) (columns = box axes), half sizes
    (3,).  Returns dict of pos (MAXP,3), normal (3,) from box1 toward box2,
    depth (MAXP,) (negative = penetrating), active (MAXP,) bool.
    """
    dtype = p1.dtype
    # work in box1 frame
    C = R1.T @ R2          # box2 axes in box1 coords
    t = R1.T @ (p2 - p1)   # box2 center in box1 coords
    absC = jnp.abs(C) + 1e-12

    # --- SAT: 6 face axes ---
    # box1 faces: axis e_i ; overlap = s1_i + (absC @ s2)_i - |t_i|
    sep1 = jnp.abs(t) - (s1 + absC @ s2)              # (3,) separation (neg=overlap)
    # box2 faces: axis C[:,j]; |t . C_j|
    t2 = C.T @ t
    sep2 = jnp.abs(t2) - (s2 + absC.T @ s1)           # (3,)

    # --- SAT: 9 edge-edge axes a = e_i x C_j ---
    # |t . a| with a normalized; radii via known formulas
    def edge_axis(i, j):
        a = jnp.zeros(3, dtype).at[(i + 1) % 3].set(-C[(i + 2) % 3, j]).at[
            (i + 2) % 3
        ].set(C[(i + 1) % 3, j])
        norm = jnp.linalg.norm(a)
        a = a / jnp.maximum(norm, 1e-12)
        r1 = (
            s1[(i + 1) % 3] * jnp.abs(a[(i + 1) % 3])
            + s1[(i + 2) % 3] * jnp.abs(a[(i + 2) % 3])
        )
        # box2 radius: |a . C_k| over k != j
        aC = a @ C
        r2 = (
            s2[(j + 1) % 3] * jnp.abs(aC[(j + 1) % 3])
            + s2[(j + 2) % 3] * jnp.abs(aC[(j + 2) % 3])
        )
        sep = jnp.abs(a @ t) - (r1 + r2)
        # degenerate axis (parallel edges): provides no separating evidence
        # and must never be selected -> -inf
        sep = jnp.where(norm < 1e-9, -jnp.inf, sep)
        return sep, a

    edge_seps = []
    edge_axes = []
    for i in range(3):
        for j in range(3):
            sp, ax = edge_axis(i, j)
            edge_seps.append(sp)
            edge_axes.append(ax)
    edge_seps = jnp.stack(edge_seps)
    edge_axes = jnp.stack(edge_axes)

    all_face_seps = jnp.concatenate([sep1, sep2])
    separated = jnp.maximum(jnp.max(all_face_seps), jnp.max(edge_seps)) >= margin

    # pick best axis: min |separation|, edge axes fudged
    best_face = jnp.argmax(all_face_seps)
    face_sep = all_face_seps[best_face]
    best_edge = jnp.argmax(edge_seps)
    edge_sep = edge_seps[best_edge]
    use_edge = edge_sep * _EDGE_FUDGE > face_sep

    # --- face contact via clipping ---
    face_out = _face_contact(best_face, C, t, s1, s2, dtype)
    # --- edge contact ---
    edge_out = _edge_contact(best_edge, edge_axes[best_edge], C, t, s1, s2, dtype)

    pos_l, normal_l, depth, active = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            jnp.reshape(use_edge, (1,) * a.ndim), b, a
        ) if a.ndim else jnp.where(use_edge, b, a),
        face_out, edge_out,
    )
    active = active & (~separated) & (depth < margin)
    # to world frame
    pos = p1[None] + pos_l @ R1.T
    normal = R1 @ normal_l
    return dict(pos=pos, normal=normal, depth=depth, active=active)


def _face_contact(axis_id, C, t, s1, s2, dtype):
    """Reference-face clipping, computed for all 6 possible reference faces and
    selected by axis_id (trace-time unrolled switch of 6 tiny branches)."""
    outs = []
    for ref_box in (0, 1):
        for ax in range(3):
            outs.append(_clip_face(ref_box, ax, C, t, s1, s2, dtype))
    pos = jnp.stack([o[0] for o in outs])
    normal = jnp.stack([o[1] for o in outs])
    depth = jnp.stack([o[2] for o in outs])
    active = jnp.stack([o[3] for o in outs])
    return pos[axis_id], normal[axis_id], depth[axis_id], active[axis_id]


def _clip_face(ref_box, ax, C, t, s1, s2, dtype):
    """Clip incident face of the other box against reference face `ax` of
    `ref_box`.  All in box1 coords.  Returns (pos (MAXP,3), normal (3,),
    depth (MAXP,), active (MAXP,))."""
    if ref_box == 0:
        # reference box = box1: its frame IS the working frame
        Rr = jnp.eye(3, dtype=dtype)      # ref box axes in working frame
        sr = s1
        Ri = C
        si = s2
        tc = t                             # incident center in working frame
        sign = 1.0
    else:
        # reference box = box2: transform into box2 coords
        Rr = jnp.eye(3, dtype=dtype)
        sr = s2
        Ri = C.T
        si = s1
        tc = -(C.T @ t)
        sign = -1.0

    # reference face: normal = +/- e_ax pointing toward incident box
    nsign = jnp.where(tc[ax] >= 0, 1.0, -1.0).astype(dtype)
    n_ref = jnp.zeros(3, dtype).at[ax].set(nsign)

    # incident face: face of incident box most anti-parallel to n_ref
    # incident box axes in working frame = columns of Ri
    dots = n_ref @ Ri                     # (3,)
    inc_ax = jnp.argmax(jnp.abs(dots))
    inc_sign = -jnp.sign(dots[inc_ax])    # face normal opposes n_ref
    inc_sign = jnp.where(inc_sign == 0, 1.0, inc_sign)

    # 4 corners of the incident face, in working frame
    e = jnp.eye(3, dtype=dtype)
    onehot = e[inc_ax]                    # (3,)
    u_axis = jnp.argmax(jnp.roll(e[inc_ax], 1))  # cyclic next axis index
    # build the two in-face axes as one-hots via roll of the face one-hot
    u_hot = jnp.roll(onehot, 1)
    v_hot = jnp.roll(onehot, 2)
    si_n = jnp.sum(si * onehot)
    si_u = jnp.sum(si * u_hot)
    si_v = jnp.sum(si * v_hot)
    face_center = tc + Ri @ (inc_sign * si_n * onehot)
    du = Ri @ (si_u * u_hot)
    dv = Ri @ (si_v * v_hot)
    corners = jnp.stack(
        [
            face_center + du + dv,
            face_center - du + dv,
            face_center - du - dv,
            face_center + du - dv,
        ]
    )  # (4, 3)

    # clip polygon against the 4 side planes of the reference face:
    # planes: +/- e_u . x <= sr_u, +/- e_v . x <= sr_v for the two in-plane axes
    u1, u2 = (ax + 1) % 3, (ax + 2) % 3
    poly = jnp.concatenate([corners, jnp.zeros((MAXP - 4, 3), dtype)])
    valid = jnp.concatenate(
        [jnp.ones(4, bool), jnp.zeros(MAXP - 4, bool)]
    )
    for pl_ax, pl_sign in ((u1, 1.0), (u1, -1.0), (u2, 1.0), (u2, -1.0)):
        limit = sr[pl_ax]
        poly, valid = _clip_plane(poly, valid, pl_ax, pl_sign, limit, dtype)

    # depth of each clipped point below the reference face plane
    depth = nsign * poly[:, ax] - sr[ax]            # negative = inside
    # contact pos: midpoint between incident point and its projection onto the
    # reference surface = point - 0.5*depth*n_ref
    pos_work = poly - 0.5 * depth[:, None] * n_ref[None]
    active = valid & (depth < 0)

    if ref_box == 0:
        pos = pos_work
        normal = n_ref           # from box1 toward box2
    else:
        # back to box1 coords
        pos = C @ pos_work.T
        pos = pos.T + t
        normal = -(C @ n_ref)    # ref normal points toward box1; flip for 1->2
    return pos, normal, depth, active


def _clip_plane(poly, valid, ax, sign, limit, dtype):
    """One Sutherland-Hodgman clip step against sign*x[ax] <= limit, on a
    fixed-size MAXP vertex ring with validity mask."""
    n = jnp.sum(valid)
    d = sign * poly[:, ax] - limit          # >0 outside
    inside = d <= 0

    idx = jnp.arange(MAXP)
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    d_n = d[nxt]
    inside_n = inside[nxt]
    poly_n = poly[nxt]

    # each edge (i -> next) emits: current point if inside, plus intersection
    # if the edge crosses the plane
    tpar = d / jnp.where(jnp.abs(d - d_n) < 1e-14, 1e-14, d - d_n)
    inter = poly + tpar[:, None] * (poly_n - poly)
    emit_pt = inside & valid
    emit_ix = (inside ^ inside_n) & valid & (idx < n)

    # pack: out vertex list = for each i: [point_i if kept, intersection_i if
    # crossing], flattened in order, compacted to the front.  Sort-free
    # stable compaction via prefix sums (argsort is pathologically slow on
    # TPU inside this heavily vmapped code).
    cand = jnp.stack([poly, inter], axis=1).reshape(2 * MAXP, 3)
    keep = jnp.stack([emit_pt, emit_ix], axis=1).reshape(2 * MAXP)
    cand = jnp.where(keep[:, None], cand, 0.0)  # garbage (inf/nan) -> 0
    dest = jnp.cumsum(keep) - 1                 # target slot per kept item
    onehot = (dest[:, None] == jnp.arange(MAXP)[None, :]) & keep[:, None]
    out = jnp.einsum("ij,ik->jk", onehot.astype(cand.dtype), cand)
    count = jnp.sum(keep)
    new_valid = jnp.arange(MAXP) < count
    return out, new_valid


def _edge_contact(edge_id, axis, C, t, s1, s2, dtype):
    """Closest points between the two penetrating edges; single contact."""
    i = edge_id // 3  # box1 edge direction
    j = edge_id % 3   # box2 edge direction

    # normal: along axis, oriented from box1 to box2
    n = axis * jnp.where(axis @ t >= 0, 1.0, -1.0)

    # supporting edge on box1: corner maximizing n . x with free coord i
    e = jnp.eye(3, dtype=dtype)
    sgn1 = jnp.where(n >= 0, 1.0, -1.0)
    c1 = jnp.where(jnp.arange(3) == i, 0.0, sgn1 * s1)
    # supporting edge on box2 (in box1 coords): minimize n . x
    n2 = C.T @ n
    sgn2 = jnp.where(n2 >= 0, -1.0, 1.0)
    c2_local = jnp.where(jnp.arange(3) == j, 0.0, sgn2 * s2)
    c2 = t + C @ c2_local

    d1 = e[i]
    d2 = C[:, j]
    # closest points between lines c1 + a d1, c2 + b d2
    r = c2 - c1
    a_ = d1 @ d1
    b_ = d1 @ d2
    c_ = d2 @ d2
    dd = a_ * c_ - b_ * b_
    dd = jnp.where(jnp.abs(dd) < 1e-12, 1e-12, dd)
    ta = (c_ * (d1 @ r) - b_ * (d2 @ r)) / dd
    tb = (b_ * (d1 @ r) - a_ * (d2 @ r)) / dd
    pa = c1 + ta * d1
    pb = c2 + tb * d2
    depth0 = n @ (pb - pa)   # negative when penetrating along n
    pos0 = 0.5 * (pa + pb)

    pos = jnp.zeros((MAXP, 3), dtype).at[0].set(pos0)
    depth = jnp.full(MAXP, jnp.inf, dtype).at[0].set(depth0)
    active = jnp.zeros(MAXP, bool).at[0].set(True)
    return pos, n, depth, active
