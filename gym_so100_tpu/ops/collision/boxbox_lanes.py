"""Box-box narrowphase in batch-last "lanes" form: the TPU throughput path.

Semantically identical to `boxbox.box_box` (SAT over 15 axes + winning
reference-face clipping; replaces the box-box path of MuJoCo's collision
pipeline invoked from the reference hot loop, /root/reference/gym_so100/env.py
step -> mj_step -> mj_collision), but engineered for the TPU memory system:

* Every quantity is a flat (N,) array, N = num_pairs * batch, one value per
  *lane*.  Vectors/matrices are structs-of-arrays (tuples of (N,) scalars),
  so nothing materializes with a trailing dim of 3 — which XLA would pad to
  128-lane tiles at ~2% utilization.  Profiled on the real chip, the
  vmapped AoS version of this kernel costs ~400 ms per substep at B=1024
  (97% of the whole physics step); the lanes form is pure fused VPU work.
* Only the *winning* reference face is clipped.  The vmapped version
  computed all 6 face clips and selected afterwards; here the working frame
  is canonicalized (reference box selected by mask, reference axis permuted
  to z by a 3-way select) so one Sutherland-Hodgman clip serves all six
  cases.
* No gathers/scatters: ring-buffer adjacency and polygon compaction are
  expressed as masked adds over statically-unrolled slots.

Numerical behavior matches `boxbox.box_box` to roundoff (different op
order); `tests/test_lanes.py` asserts agreement on random pose
batches against the vmapped reference implementation.
"""

from __future__ import annotations

import jax.numpy as jnp

from .boxbox import _EDGE_FUDGE, MAXP

_DEG = 1e-12


def _sel3(ix, v0, v1, v2):
    """Per-lane 3-way select by int array ix in {0,1,2}."""
    return jnp.where(ix == 0, v0, jnp.where(ix == 1, v1, v2))


def _argmax6(vals):
    """(best, idx) over a static list of (N,) arrays, first-max ties."""
    best = vals[0]
    idx = jnp.zeros_like(vals[0], dtype=jnp.int32)
    for k in range(1, len(vals)):
        m = vals[k] > best
        best = jnp.where(m, vals[k], best)
        idx = jnp.where(m, jnp.int32(k), idx)
    return best, idx


def _matvec(C, v):
    """C (3x3 lanes) @ v (3 lanes)."""
    return tuple(
        C[i][0] * v[0] + C[i][1] * v[1] + C[i][2] * v[2] for i in range(3)
    )


def _matTvec(C, v):
    return tuple(
        C[0][i] * v[0] + C[1][i] * v[1] + C[2][i] * v[2] for i in range(3)
    )


def box_box_lanes(p1, R1, s1, p2, R2, s2, margin=0.0):
    """Collide box pairs, one pair per lane.

    Args: p1/p2 = tuples of 3 (N,) center components; R1/R2 = 3x3 nested
    tuples of (N,) world-rotation entries (columns = box axes); s1/s2 =
    tuples of 3 (N,) half sizes.  Returns dict:
      pos    list of MAXP tuples of 3 (N,) world coords
      normal tuple of 3 (N,) (from box1 toward box2)
      depth  list of MAXP (N,) (negative = penetrating)
      active list of MAXP (N,) bool
    """
    dtype = p1[0].dtype
    one = jnp.ones_like(p1[0])
    zero = jnp.zeros_like(p1[0])

    # --- box2 in box1 frame: C = R1^T R2, t = R1^T (p2 - p1) ---
    C = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            C[i][j] = (
                R1[0][i] * R2[0][j] + R1[1][i] * R2[1][j] + R1[2][i] * R2[2][j]
            )
    dp = (p2[0] - p1[0], p2[1] - p1[1], p2[2] - p1[2])
    t = tuple(R1[0][i] * dp[0] + R1[1][i] * dp[1] + R1[2][i] * dp[2] for i in range(3))
    absC = [[jnp.abs(C[i][j]) + _DEG for j in range(3)] for i in range(3)]

    # --- SAT: 6 face axes ---
    sep_face = []
    for i in range(3):  # box1 faces
        r = s1[i] + absC[i][0] * s2[0] + absC[i][1] * s2[1] + absC[i][2] * s2[2]
        sep_face.append(jnp.abs(t[i]) - r)
    t2 = _matTvec(C, t)  # box2-frame center offset
    for j in range(3):  # box2 faces
        r = s2[j] + absC[0][j] * s1[0] + absC[1][j] * s1[1] + absC[2][j] * s1[2]
        sep_face.append(jnp.abs(t2[j]) - r)

    # --- SAT: 9 edge-edge axes a = e_i x C_col_j ---
    sep_edge = []
    axes_edge = []  # list of 3-tuples
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            a = [zero, zero, zero]
            a[i1] = -C[i2][j]
            a[i2] = C[i1][j]
            norm = jnp.sqrt(C[i2][j] * C[i2][j] + C[i1][j] * C[i1][j])
            inv = 1.0 / jnp.maximum(norm, _DEG)
            a = [a[0] * inv, a[1] * inv, a[2] * inv]
            r1 = s1[i1] * jnp.abs(a[i1]) + s1[i2] * jnp.abs(a[i2])
            aC = [
                a[i1] * C[i1][k] + a[i2] * C[i2][k] for k in range(3)
            ]
            r2 = s2[j1] * jnp.abs(aC[j1]) + s2[j2] * jnp.abs(aC[j2])
            at = a[i1] * t[i1] + a[i2] * t[i2]
            sep = jnp.abs(at) - (r1 + r2)
            sep = jnp.where(norm < 1e-9, -jnp.inf, sep)
            sep_edge.append(sep)
            axes_edge.append(tuple(a))

    face_sep, best_face = _argmax6(sep_face)
    edge_sep, best_edge = _argmax6(sep_edge)
    separated = jnp.maximum(face_sep, edge_sep) >= margin
    use_edge = edge_sep * _EDGE_FUDGE > face_sep

    # =====================================================================
    # Face contact: canonicalize (ref box, ref axis -> z), single clip
    # =====================================================================
    is1 = best_face < 3
    ax = jnp.where(is1, best_face, best_face - 3)

    # incident-box rotation/center/sizes in the reference box frame
    Ci = [[jnp.where(is1, C[i][j], C[j][i]) for j in range(3)] for i in range(3)]
    tc = tuple(jnp.where(is1, t[i], -t2[i]) for i in range(3))
    sr = tuple(jnp.where(is1, s1[i], s2[i]) for i in range(3))
    si = tuple(jnp.where(is1, s2[i], s1[i]) for i in range(3))

    # permute reference rows so the reference axis is canonical z
    # (rows u1=(ax+1)%3 -> x, u2=(ax+2)%3 -> y, ax -> z)
    Rp = [
        [_sel3(ax, Ci[1][j], Ci[2][j], Ci[0][j]) for j in range(3)],
        [_sel3(ax, Ci[2][j], Ci[0][j], Ci[1][j]) for j in range(3)],
        [_sel3(ax, Ci[0][j], Ci[1][j], Ci[2][j]) for j in range(3)],
    ]
    tp = (
        _sel3(ax, tc[1], tc[2], tc[0]),
        _sel3(ax, tc[2], tc[0], tc[1]),
        _sel3(ax, tc[0], tc[1], tc[2]),
    )
    srp = (
        _sel3(ax, sr[1], sr[2], sr[0]),
        _sel3(ax, sr[2], sr[0], sr[1]),
        _sel3(ax, sr[0], sr[1], sr[2]),
    )

    nsign = jnp.where(tp[2] >= 0, one, -one)

    # incident face: column of Rp most anti-parallel to the ref normal
    dots = [Rp[2][j] for j in range(3)]  # n_ref . col_j = nsign * Rp[2][j]
    _, jstar = _argmax6([jnp.abs(d) for d in dots])
    dstar = _sel3(jstar, dots[0], dots[1], dots[2]) * nsign
    inc_sign = jnp.where(dstar > 0, -one, one)  # -sign, 0 -> +1

    si_n = _sel3(jstar, si[0], si[1], si[2])
    si_u = _sel3(jstar, si[1], si[2], si[0])  # (jstar+1)%3
    si_v = _sel3(jstar, si[2], si[0], si[1])  # (jstar+2)%3
    col_n = [_sel3(jstar, Rp[r][0], Rp[r][1], Rp[r][2]) for r in range(3)]
    col_u = [_sel3(jstar, Rp[r][1], Rp[r][2], Rp[r][0]) for r in range(3)]
    col_v = [_sel3(jstar, Rp[r][2], Rp[r][0], Rp[r][1]) for r in range(3)]
    center = [tp[r] + inc_sign * si_n * col_n[r] for r in range(3)]
    du = [si_u * col_u[r] for r in range(3)]
    dv = [si_v * col_v[r] for r in range(3)]

    # ring of clip points: only the canonical (x, y) coordinates are
    # tracked through the clip — every clipped point stays on the incident
    # face PLANE, so z is recovered afterwards from the plane equation
    # (the face is the most anti-parallel to the reference normal, so its
    # projection onto canonical xy is never degenerate).  Slot counts grow
    # 4 -> 5 -> 6 -> 7 -> 8 per plane (a convex polygon clipped by one
    # half-plane gains at most one vertex), which together with dropping
    # the z lane cuts the masked-compaction work ~2.6x.
    px = []
    py = []
    for su, sv in ((1, 1), (-1, 1), (-1, -1), (1, -1)):
        px.append(center[0] + su * du[0] + sv * dv[0])
        py.append(center[1] + su * du[1] + sv * dv[1])
    count = jnp.full_like(ax, 4)

    # Sutherland-Hodgman against the 4 side planes: +/-x <= srp[0],
    # +/-y <= srp[1]
    for plane_ax, plane_sign in ((0, 1.0), (0, -1.0), (1, 1.0), (1, -1.0)):
        n = len(px)                      # current slot capacity
        cap = min(n + 1, MAXP)           # capacity after this plane
        limit = srp[plane_ax]
        coords = px if plane_ax == 0 else py
        d = [plane_sign * coords[k] - limit for k in range(n)]
        inside = [d[k] <= 0 for k in range(n)]
        valid = [count > k for k in range(n)]

        # candidates: per edge k -> (kept point, crossing intersection)
        cand_x, cand_y, keep = [], [], []
        for k in range(n):
            # ring-next: slot k+1 while k+1 < count, else slot 0
            wrap = count <= k + 1
            if k + 1 < n:
                nx = jnp.where(wrap, px[0], px[k + 1])
                ny = jnp.where(wrap, py[0], py[k + 1])
                nd = jnp.where(wrap, d[0], d[k + 1])
                nin = jnp.where(wrap, inside[0], inside[k + 1])
            else:
                nx, ny, nd, nin = px[0], py[0], d[0], inside[0]
            denom = d[k] - nd
            denom = jnp.where(jnp.abs(denom) < 1e-14, 1e-14, denom)
            tt = d[k] / denom
            keep_pt = inside[k] & valid[k]
            keep_ix = (inside[k] ^ nin) & valid[k]
            cand_x.append(jnp.where(keep_pt, px[k], 0.0))
            cand_y.append(jnp.where(keep_pt, py[k], 0.0))
            keep.append(keep_pt)
            cand_x.append(jnp.where(keep_ix, px[k] + tt * (nx - px[k]), 0.0))
            cand_y.append(jnp.where(keep_ix, py[k] + tt * (ny - py[k]), 0.0))
            keep.append(keep_ix)

        # stable masked compaction: dest_c = prefix-count - 1
        run = jnp.zeros_like(count)
        dest = []
        for c in range(2 * n):
            run = run + keep[c].astype(run.dtype)
            dest.append(run - 1)
        npx = [zero] * cap
        npy = [zero] * cap
        for c in range(2 * n):
            for k in range(cap):
                hit = keep[c] & (dest[c] == k)
                npx[k] = npx[k] + jnp.where(hit, cand_x[c], 0.0)
                npy[k] = npy[k] + jnp.where(hit, cand_y[c], 0.0)
        px, py = npx, npy
        count = run

    # recover z on the incident-face plane: [x; y] = c_xy + M [su; sv],
    # z = c_z + [du_z dv_z] [su; sv], with M the top 2x2 of [du dv]
    det = du[0] * dv[1] - du[1] * dv[0]
    det = jnp.where(jnp.abs(det) < _DEG, jnp.where(det < 0, -_DEG, _DEG), det)
    inv_det = 1.0 / det
    pz = []
    for k in range(MAXP):
        rx = px[k] - center[0]
        ry = py[k] - center[1]
        su = (dv[1] * rx - dv[0] * ry) * inv_det
        sv = (-du[1] * rx + du[0] * ry) * inv_det
        pz.append(center[2] + du[2] * su + dv[2] * sv)

    face_valid = [count > k for k in range(MAXP)]
    face_depth = [nsign * pz[k] - srp[2] for k in range(MAXP)]
    face_active = [face_valid[k] & (face_depth[k] < 0) for k in range(MAXP)]
    # contact point: midway between incident point and its projection on the
    # reference face plane
    pzc = [pz[k] - 0.5 * face_depth[k] * nsign for k in range(MAXP)]

    # un-permute canonical (x, y, z) back to reference-frame coords, then to
    # box1 frame (identity if ref is box1, else x -> C x + t), then world
    def unpermute(x, y, z):
        return (
            _sel3(ax, z, y, x),
            _sel3(ax, x, z, y),
            _sel3(ax, y, x, z),
        )

    face_pos = []
    for k in range(MAXP):
        ref = unpermute(px[k], py[k], pzc[k])
        b2 = _matvec(C, ref)
        pb1 = tuple(jnp.where(is1, ref[i], t[i] + b2[i]) for i in range(3))
        face_pos.append(pb1)
    n_ref = unpermute(zero, zero, nsign)
    n_rot = _matvec(C, n_ref)
    face_normal = tuple(jnp.where(is1, n_ref[i], -n_rot[i]) for i in range(3))

    # =====================================================================
    # Edge-edge contact (single point)
    # =====================================================================
    ei = best_edge // 3
    ej = best_edge % 3
    a = [zero, zero, zero]
    for c in range(3):
        acc = zero
        for k, axk in enumerate(axes_edge):
            acc = jnp.where(best_edge == k, axk[c], acc)
        a[c] = acc
    adott = a[0] * t[0] + a[1] * t[1] + a[2] * t[2]
    sgn = jnp.where(adott >= 0, one, -one)
    n_e = [a[c] * sgn for c in range(3)]

    # supporting edges: corner of box1 maximizing n . x (free coord ei),
    # corner of box2 minimizing n . x (free coord ej, box2 coords)
    c1 = [
        jnp.where(ei == c, zero, jnp.where(n_e[c] >= 0, s1[c], -s1[c]))
        for c in range(3)
    ]
    n2 = _matTvec(C, n_e)
    c2l = [
        jnp.where(ej == c, zero, jnp.where(n2[c] >= 0, -s2[c], s2[c]))
        for c in range(3)
    ]
    Cc2 = _matvec(C, c2l)
    c2 = [t[c] + Cc2[c] for c in range(3)]
    d1 = [jnp.where(ei == c, one, zero) for c in range(3)]
    d2 = [_sel3(ej, C[c][0], C[c][1], C[c][2]) for c in range(3)]
    r = [c2[c] - c1[c] for c in range(3)]
    a_ = d1[0] * d1[0] + d1[1] * d1[1] + d1[2] * d1[2]
    b_ = d1[0] * d2[0] + d1[1] * d2[1] + d1[2] * d2[2]
    c_ = d2[0] * d2[0] + d2[1] * d2[1] + d2[2] * d2[2]
    dd = a_ * c_ - b_ * b_
    dd = jnp.where(jnp.abs(dd) < _DEG, _DEG, dd)
    d1r = d1[0] * r[0] + d1[1] * r[1] + d1[2] * r[2]
    d2r = d2[0] * r[0] + d2[1] * r[1] + d2[2] * r[2]
    ta = (c_ * d1r - b_ * d2r) / dd
    tb = (b_ * d1r - a_ * d2r) / dd
    pa = [c1[c] + ta * d1[c] for c in range(3)]
    pb = [c2[c] + tb * d2[c] for c in range(3)]
    e_depth = (
        n_e[0] * (pb[0] - pa[0]) + n_e[1] * (pb[1] - pa[1]) + n_e[2] * (pb[2] - pa[2])
    )
    e_pos = tuple(0.5 * (pa[c] + pb[c]) for c in range(3))

    # =====================================================================
    # merge + world transform
    # =====================================================================
    not_sep = ~separated
    pos_out, depth_out, active_out = [], [], []
    for k in range(MAXP):
        if k == 0:
            pk = tuple(
                jnp.where(use_edge, e_pos[c], face_pos[0][c]) for c in range(3)
            )
            dk = jnp.where(use_edge, e_depth, face_depth[0])
            ak = jnp.where(use_edge, True, face_active[0])
        else:
            pk = face_pos[k]
            dk = jnp.where(use_edge, jnp.inf, face_depth[k])
            ak = face_active[k] & ~use_edge
        ak = ak & not_sep & (dk < margin)
        # world: p1 + R1 pk
        pw = tuple(
            p1[c] + R1[c][0] * pk[0] + R1[c][1] * pk[1] + R1[c][2] * pk[2]
            for c in range(3)
        )
        pos_out.append(pw)
        depth_out.append(dk)
        active_out.append(ak)

    nb1 = tuple(jnp.where(use_edge, n_e[c], face_normal[c]) for c in range(3))
    normal_w = tuple(
        R1[c][0] * nb1[0] + R1[c][1] * nb1[1] + R1[c][2] * nb1[2]
        for c in range(3)
    )
    return dict(pos=pos_out, normal=normal_w, depth=depth_out, active=active_out)
