"""Convex-convex narrowphase: GJK distance + EPA penetration depth.

Used for the arm-link convex hulls of the SO100 scene (the builder packs each
collidable mesh's decimated convex hull; the reference relies on MuJoCo's
native convex collision for these pairs).  Fixed iteration counts and
fixed-size polytope buffers; no data-dependent control flow, so the whole
routine jits and vmaps over the static pair table and over env batches.

Conventions: returned `normal` points from geom1 toward geom2 (the minimal
translation that separates geom2 from geom1 is +depth*normal applied to
geom2); `depth` is negative when penetrating; `pos` is the midpoint of the
witness points (MuJoCo contact.pos convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GJK_ITERS = 20
EPA_ITERS = 20
EPA_FACES = 64
NVERT = 4 + EPA_ITERS


HULL_BLOCK = 64  # uniform per-geom vertex window in the packed block array


def convex_convex(p1, R1, v1, p2, R2, v2, margin=0.0):
    """Collide two convex hulls given world poses and geom-frame verts
    (V, 3).  For the batched engine path use `make_blocked_convex_convex`,
    which reads verts out of a shared packed array in a vmap-safe way."""
    return _convex_core(
        p1, R1, (v1[:, 0], v1[:, 1], v1[:, 2]),
        p2, R2, (v2[:, 0], v2[:, 1], v2[:, 2]), margin,
    )


def make_blocked_convex_convex(v_allT):
    """Build a collider reading hulls from `v_allT` (3, nblocks*HULL_BLOCK)
    — each geom's hull padded to HULL_BLOCK verts by repeating its first
    vertex — addressed by per-call block start offsets.

    vmap-safety: under nested vmap (pairs x envs), any per-pair-batched
    vertex operand (a dot or gather) makes XLA broadcast the constants per
    env with T(8,128) tile padding on a minor dim of 3 — a >HBM
    materialization at 4096 envs.  Slicing per *component* from an unbatched
    closure constant keeps every materialized intermediate at
    (batch..., HULL_BLOCK), which tiles cleanly."""
    vx, vy, vz = v_allT[0], v_allT[1], v_allT[2]

    def collide(p1, R1, start1, p2, R2, start2, margin=0.0):
        def comp(start):
            return tuple(
                jax.lax.dynamic_slice(a, (start,), (HULL_BLOCK,))
                for a in (vx, vy, vz)
            )

        return _convex_core(p1, R1, comp(start1), p2, R2, comp(start2), margin)

    return collide


def _convex_core(p1, R1, v1c, p2, R2, v2c, margin):
    dtype = p1.dtype

    if dtype == jnp.float32:
        # Throughput path: the sampled-direction support sweep alone.  It
        # yields BOTH the overlap certificate (min_d h(d) > 0 -> no sampled
        # separating direction) and the penetration depth/normal/witness in
        # one pass of pure batched reductions.  The GJK distance loop only
        # ever contributed the intersect flag here (separated candidates are
        # masked inactive downstream and never selected), and its 13
        # sequential iterations of support+barycentric work dominated the
        # hulls-on substep (~115 ms at B=1024 vs ~10 ms for everything
        # else).  Error mode: a separation smaller than the angular
        # resolution of the direction set can be misread as a near-zero
        # -depth contact; the resulting constraint force at dist ~ 0^- is
        # negligible.  The f64 parity path below keeps exact GJK+EPA.
        depth, n, pos = _dir_penetration(p1, R1, v1c, p2, R2, v2c, dtype)
        return dict(pos=pos, normal=n, depth=depth, active=depth < margin)

    sup = _make_support(p1, R1, v1c, p2, R2, v2c)
    S, W, nsimp, dist2, lam, intersect = _gjk(sup, p1, R1, v1c, p2, R2, v2c)

    # separated branch: witnesses from barycentric combination
    wa = lam @ W[:, :3]
    wb = lam @ W[:, 3:]
    sep_dist = jnp.sqrt(jnp.maximum(dist2, 1e-300))
    sep_n = (wb - wa) / jnp.maximum(sep_dist, 1e-12)

    depth_pen, n_pen, pos_pen = _epa(sup, S, W, nsimp, dtype)

    active = intersect & (depth_pen < margin)
    pos = jnp.where(intersect, pos_pen, 0.5 * (wa + wb))
    normal = jnp.where(intersect, n_pen, sep_n)
    depth = jnp.where(intersect, depth_pen, sep_dist)
    return dict(pos=pos, normal=normal, depth=depth, active=active)


def _make_support(p1, R1, v1c, p2, R2, v2c):
    v1x, v1y, v1z = v1c
    v2x, v2y, v2z = v2c

    def support(d):
        # scoring as elementwise mul-adds over component arrays, not a dot
        # (vmap-safety: see make_blocked_convex_convex)
        dl1 = R1.T @ d
        dl2 = R2.T @ (-d)
        s1 = v1x * dl1[0] + v1y * dl1[1] + v1z * dl1[2]
        s2 = v2x * dl2[0] + v2y * dl2[1] + v2z * dl2[2]
        i1 = jnp.argmax(s1)
        i2 = jnp.argmax(s2)
        va = jnp.stack([v1x[i1], v1y[i1], v1z[i1]])
        vb = jnp.stack([v2x[i2], v2y[i2], v2z[i2]])
        a = p1 + R1 @ va
        b = p2 + R2 @ vb
        return a - b, jnp.concatenate([a, b])

    return support


def _gjk(sup, p1, R1, v1c, p2, R2, v2c):
    """GJK distance loop.  Returns (S (4,3) simplex, W (4,6) witnesses,
    nsimp, dist2 to origin, lam (4,), intersect)."""
    dtype = p1.dtype
    c1 = jnp.stack([jnp.mean(v1c[0]), jnp.mean(v1c[1]), jnp.mean(v1c[2])])
    c2 = jnp.stack([jnp.mean(v2c[0]), jnp.mean(v2c[1]), jnp.mean(v2c[2])])
    d0 = (p1 + R1 @ c1) - (p2 + R2 @ c2)
    d0 = jnp.where(jnp.linalg.norm(d0) < 1e-12, jnp.asarray([1.0, 0, 0], dtype), d0)
    s0, ws0 = sup(-d0)

    S = jnp.zeros((4, 3), dtype).at[0].set(s0)
    W = jnp.zeros((4, 6), dtype).at[0].set(ws0)

    eps = jnp.finfo(dtype).eps
    scale2 = jnp.maximum(1.0, jnp.max(jnp.sum(jnp.square(s0))))

    def body(carry, _):
        S, W, n, v, lam, done, intersect = carry
        d = -v
        s, ws = sup(d)
        # no closer support along d -> converged (separated)
        vv = v @ v
        no_progress = vv - v @ s < 64 * eps * jnp.maximum(1.0, vv)
        stop = done | no_progress
        # append s into the first free slot (slot n; n <= 3 when not done)
        slot = jnp.minimum(n, 3)
        S2 = S.at[slot].set(s)
        W2 = W.at[slot].set(ws)
        n2 = jnp.minimum(n + 1, 4)
        lam2 = _closest_barycentric(S2, n2)
        v2 = lam2 @ S2
        # intersect when the closest point reaches the origin.  The
        # barycentric solve leaves O(eps/conditioning) residue, so the
        # threshold is relative to the shape scale (separations below
        # 1e-8*scale read as touching — far below any dynamical effect);
        # additionally, a full simplex with strictly interior closest point
        # (all four weights positive) contains the origin exactly, which
        # catches degenerate axis-aligned face-face poses whose residue
        # plateaus above the distance threshold.
        inter2 = (v2 @ v2 < (1e-16) * scale2) | jnp.all(lam2 > 0)
        # reduce: keep positive-lam verts at the front (sort-free stable
        # compaction over the 4 slots — argsort is slow on TPU)
        keep = lam2 > 0
        dest = jnp.cumsum(keep) - 1
        onehot = ((dest[:, None] == jnp.arange(4)[None, :]) & keep[:, None]).astype(
            S2.dtype
        )
        S3 = onehot.T @ S2
        W3 = onehot.T @ W2
        lam3 = onehot.T @ lam2
        n3 = jnp.sum(keep).astype(jnp.int32)
        new = (S3, W3, n3, v2, lam3, stop | inter2, intersect | inter2)
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(stop, a, b), carry, new
        )
        return out, None

    lam0 = jnp.zeros(4, dtype).at[0].set(1.0)
    carry = (S, W, jnp.int32(1), s0, lam0, jnp.bool_(False), jnp.bool_(False))
    # f32 throughput path uses fewer iterations (converges in <10 for these
    # small hulls; beyond that f32 rounding dominates anyway)
    iters = 13 if dtype == jnp.float32 else GJK_ITERS
    (S, W, n, v, lam, done, intersect), _ = jax.lax.scan(
        body, carry, None, length=iters
    )
    return S, W, n, v @ v, lam, intersect


def _solve_spd_small(G, b):
    """Closed-form solve for k x k SPD systems, k <= 4 (static k).

    TPU has no f64 LU kernel and small-batch LU/Cholesky calls are slow;
    cofactor expansion is branch-free vector math that fuses into the
    surrounding kernel."""
    k = G.shape[0]
    if k == 1:
        return b / G[0, 0]
    if k == 2:
        det = G[0, 0] * G[1, 1] - G[0, 1] * G[1, 0]
        inv = jnp.stack([
            jnp.stack([G[1, 1], -G[0, 1]]),
            jnp.stack([-G[1, 0], G[0, 0]]),
        ]) / det
        return inv @ b
    if k == 3:
        c00 = G[1, 1] * G[2, 2] - G[1, 2] * G[2, 1]
        c01 = G[1, 2] * G[2, 0] - G[1, 0] * G[2, 2]
        c02 = G[1, 0] * G[2, 1] - G[1, 1] * G[2, 0]
        det = G[0, 0] * c00 + G[0, 1] * c01 + G[0, 2] * c02
        adj = jnp.stack([
            jnp.stack([c00, G[0, 2] * G[2, 1] - G[0, 1] * G[2, 2], G[0, 1] * G[1, 2] - G[0, 2] * G[1, 1]]),
            jnp.stack([c01, G[0, 0] * G[2, 2] - G[0, 2] * G[2, 0], G[0, 2] * G[1, 0] - G[0, 0] * G[1, 2]]),
            jnp.stack([c02, G[0, 1] * G[2, 0] - G[0, 0] * G[2, 1], G[0, 0] * G[1, 1] - G[0, 1] * G[1, 0]]),
        ])
        return (adj @ b) / det
    # k == 4: blockwise via Schur complement on the 2x2 partition
    A = G[:2, :2]
    B = G[:2, 2:]
    C = G[2:, :2]
    D = G[2:, 2:]
    detA = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    Ainv = jnp.stack([
        jnp.stack([A[1, 1], -A[0, 1]]),
        jnp.stack([-A[1, 0], A[0, 0]]),
    ]) / detA
    S2 = D - C @ Ainv @ B
    detS = S2[0, 0] * S2[1, 1] - S2[0, 1] * S2[1, 0]
    Sinv = jnp.stack([
        jnp.stack([S2[1, 1], -S2[0, 1]]),
        jnp.stack([-S2[1, 0], S2[0, 0]]),
    ]) / detS
    b1, b2 = b[:2], b[2:]
    y2 = Sinv @ (b2 - C @ (Ainv @ b1))
    y1 = Ainv @ (b1 - B @ y2)
    return jnp.concatenate([y1, y2])


def _closest_barycentric(S, n):
    """Barycentric coords of the point of conv(S[:n]) closest to the origin,
    enumerating support subsets and keeping the best feasible
    equality-constrained solution.

    All arithmetic is written on *scalar* Gram entries (shape () per call,
    (batch,) under vmap): small (k,k) matrix ops would be tile-padded to
    (8,128) on TPU, a 32x waste that made GJK the dominant cost of the whole
    physics step.  Closed-form cofactor solves of G lam = 1 for k <= 4."""
    dtype = S.dtype
    reps = 64 * jnp.finfo(dtype).eps
    feps = jnp.sqrt(jnp.finfo(dtype).eps)

    # Gram scalars g[i][j] = S_i . S_j + 1 (the +1 enforces sum lam = 1)
    g = [[S[i] @ S[j] + 1.0 for j in range(4)] for i in range(4)]

    def solve_subset(ids):
        k = len(ids)
        if k == 1:
            return [1.0 * jnp.ones((), dtype)], jnp.ones((), dtype)
        if k == 2:
            a, b = ids
            det = g[a][a] * g[b][b] - g[a][b] * g[a][b]
            l0 = g[b][b] - g[a][b]
            l1 = g[a][a] - g[a][b]
            return [l0, l1], det
        if k == 3:
            a, b, c = ids
            # cofactor solve of 3x3 symmetric system G l = det * 1
            A, B, C = g[a][a], g[a][b], g[a][c]
            D, E = g[b][b], g[b][c]
            F = g[c][c]
            det = A * (D * F - E * E) - B * (B * F - C * E) + C * (B * E - C * D)
            l0 = (D * F - E * E) - (B * F - C * E) + (B * E - C * D)
            l1 = -(B * F - C * E) + (A * F - C * C) - (A * E - B * C)
            l2 = (B * E - C * D) - (A * E - B * C) + (A * D - B * B)
            return [l0, l1, l2], det
        # k == 4
        A, B, C, Dg = g[0][0], g[0][1], g[0][2], g[0][3]
        E, F, Gg = g[1][1], g[1][2], g[1][3]
        H, I_ = g[2][2], g[2][3]
        J = g[3][3]
        # unnormalized solution of G l = 1 via cofactor row sums of adj(G)
        # (columns of G): use Cramer with rhs = ones
        M = [
            [A, B, C, Dg],
            [B, E, F, Gg],
            [C, F, H, I_],
            [Dg, Gg, I_, J],
        ]

        def det3(r0, r1, r2, c0, c1, c2):
            return (
                M[r0][c0] * (M[r1][c1] * M[r2][c2] - M[r1][c2] * M[r2][c1])
                - M[r0][c1] * (M[r1][c0] * M[r2][c2] - M[r1][c2] * M[r2][c0])
                + M[r0][c2] * (M[r1][c0] * M[r2][c1] - M[r1][c1] * M[r2][c0])
            )

        det = (
            M[0][0] * det3(1, 2, 3, 1, 2, 3)
            - M[0][1] * det3(1, 2, 3, 0, 2, 3)
            + M[0][2] * det3(1, 2, 3, 0, 1, 3)
            - M[0][3] * det3(1, 2, 3, 0, 1, 2)
        )
        lams = []
        rows = [0, 1, 2, 3]
        for col in range(4):
            # Cramer: replace column `col` with ones; expand along that column
            others = [c for c in range(4) if c != col]
            s = jnp.zeros((), dtype)
            for r in range(4):
                rr = [x for x in rows if x != r]
                s = s + ((-1.0) ** (r + col)) * det3(
                    rr[0], rr[1], rr[2], others[0], others[1], others[2]
                )
            lams.append(s)
        return lams, det

    best_d2 = jnp.asarray(jnp.inf, dtype)
    best_lam = jnp.zeros(4, dtype).at[0].set(1.0)
    for mask in range(1, 16):
        ids = [i for i in range(4) if (mask >> i) & 1]
        valid = jnp.asarray(max(ids)) < n
        lams, det = solve_subset(ids)
        ssum = sum(lams)
        denom = jnp.where(jnp.abs(ssum) < reps, reps, ssum)
        lam_n = [l / denom for l in lams]
        feas = valid
        for l in lam_n:
            feas = feas & (l >= -feps) & jnp.isfinite(l)
        lam_full = [jnp.zeros((), dtype)] * 4
        for j, i in enumerate(ids):
            lam_full[i] = lam_n[j]
        pt = (
            lam_full[0] * S[0] + lam_full[1] * S[1]
            + lam_full[2] * S[2] + lam_full[3] * S[3]
        )
        d2 = pt @ pt
        better = feas & (
            d2 < best_d2 * (1 - 4 * jnp.finfo(dtype).eps) - jnp.finfo(dtype).tiny
        )
        best_d2 = jnp.where(better, d2, best_d2)
        best_lam = jnp.where(better, jnp.stack(lam_full), best_lam)
    return jnp.maximum(best_lam, 0.0)


import functools


@functools.lru_cache(maxsize=4)
def _dir_set_np(n):
    import numpy as np

    i = np.arange(n)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1 - 2 * (i + 0.5) / n
    r = np.sqrt(np.maximum(0, 1 - y * y))
    dirs = np.stack([r * np.cos(phi * i), y, r * np.sin(phi * i)], -1)
    axes = np.concatenate([np.eye(3), -np.eye(3)])
    return np.concatenate([axes, dirs]).astype(np.float32)


# + 6 axis directions; GST_ND overrides for measurement only (the lanes
# sweep, the per-env f32 reference, and their equivalence tests all read
# this constant, so they stay consistent)
import os as _os

N_PEN_DIRS = int(_os.environ.get("GST_ND", "126"))


def _dir_penetration(p1, R1, v1c, p2, R2, v2c, dtype):
    """Approximate minimal-translation penetration by brute-force support
    sweep over a fixed direction set.  depth = min_d [h_A(d) - h_B(-d)·...]
    where h is the support height; exact for any direction in the set, so the
    error is bounded by the angular resolution (~18 deg at 132 dirs ->
    ~1.5 percent of object size for shallow contacts).  Normal points from
    geom1 toward geom2 (translate geom2 by depth*normal to separate)."""
    D = jnp.asarray(_dir_set_np(N_PEN_DIRS), dtype)  # (ND, 3)
    v1x, v1y, v1z = v1c
    v2x, v2y, v2z = v2c
    dl1 = D @ R1  # rows: R1^T d
    dl2 = D @ R2
    s1 = dl1[:, 0:1] * v1x[None] + dl1[:, 1:2] * v1y[None] + dl1[:, 2:3] * v1z[None]
    s2 = dl2[:, 0:1] * v2x[None] + dl2[:, 1:2] * v2y[None] + dl2[:, 2:3] * v2z[None]
    i1 = jnp.argmax(s1, axis=1)            # (ND,) max of A along +d
    i2 = jnp.argmin(s2, axis=1)            # (ND,) min of B along +d
    maxA = jnp.max(s1, axis=1) + D @ p1
    minB = jnp.min(s2, axis=1) + D @ p2
    h = maxA - minB                         # overlap extent along d (>0 all d
    best = jnp.argmin(h)                    # when intersecting)
    depth = -h[best]
    n = D[best]
    va = jnp.stack([v1x[i1[best]], v1y[i1[best]], v1z[i1[best]]])
    vb = jnp.stack([v2x[i2[best]], v2y[i2[best]], v2z[i2[best]]])
    a = p1 + R1 @ va
    b = p2 + R2 @ vb
    return depth, n, 0.5 * (a + b)


def _epa(sup, S, W, nsimp, dtype):
    """Expanding polytope algorithm.  Needs origin inside (or on) the hull of
    the Minkowski difference.  Returns (depth (negative), normal 1->2, pos)."""
    # --- robust initial tetrahedron ---
    # take GJK simplex verts; fill missing slots with axis supports
    dirs = jnp.asarray(
        [[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [-1.0, -1, -1]], dtype
    )
    Sfill = S
    Wfill = W
    for k in range(4):
        s, ws = sup(dirs[k])
        use = jnp.asarray(k) >= nsimp
        Sfill = Sfill.at[k].set(jnp.where(use, s, Sfill[k]))
        Wfill = Wfill.at[k].set(jnp.where(use, ws, Wfill[k]))
    # degenerate (flat) tetra: rebuild completely from +-axis supports
    vol = jnp.linalg.det(Sfill[1:] - Sfill[0])
    Sax = jnp.zeros_like(Sfill)
    Wax = jnp.zeros_like(Wfill)
    for k in range(4):
        s, ws = sup(dirs[k])
        Sax = Sax.at[k].set(s)
        Wax = Wax.at[k].set(ws)
    degen = jnp.abs(vol) < (jnp.finfo(dtype).eps * 64) ** 3
    Sfill = jnp.where(degen, Sax, Sfill)
    Wfill = jnp.where(degen, Wax, Wfill)
    # consistent outward winding: make det(S1-S0, S2-S0, S3-S0) negative so
    # that faces listed below wind outward
    vol = jnp.linalg.det(Sfill[1:] - Sfill[0])
    swap = vol > 0
    S0 = jnp.where(swap, Sfill[1], Sfill[0])
    S1 = jnp.where(swap, Sfill[0], Sfill[1])
    W0 = jnp.where(swap, Wfill[1], Wfill[0])
    W1 = jnp.where(swap, Wfill[0], Wfill[1])
    Sfill = Sfill.at[0].set(S0).at[1].set(S1)
    Wfill = Wfill.at[0].set(W0).at[1].set(W1)

    verts = jnp.zeros((NVERT, 3), dtype).at[:4].set(Sfill)
    wits = jnp.zeros((NVERT, 6), dtype).at[:4].set(Wfill)

    # tetra faces with outward winding given negative det convention:
    faces0 = jnp.asarray(
        [[0, 1, 2], [1, 3, 2], [0, 2, 3], [0, 3, 1]], jnp.int32
    )
    faces = jnp.zeros((EPA_FACES, 3), jnp.int32).at[:4].set(faces0)
    fvalid = jnp.zeros(EPA_FACES, bool).at[:4].set(True)

    def normals_dists(faces, verts, fvalid):
        a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
        nr = jnp.cross(b - a, c - a)
        nn = jnp.linalg.norm(nr, axis=-1, keepdims=True)
        nr = nr / jnp.maximum(nn, 1e-30)
        dist = jnp.sum(nr * a, -1)
        # degenerate faces can't be selected
        bad = (nn[:, 0] < 1e-15) | ~fvalid
        return nr, jnp.where(bad, jnp.inf, dist)

    def body(carry, _):
        verts, wits, nvert, faces, fvalid, done = carry
        nr, dist = normals_dists(faces, verts, fvalid)
        fi = jnp.argmin(dist)
        d = nr[fi]
        s, ws = sup(d)
        growth = s @ d - dist[fi]
        converged = growth < 512 * jnp.finfo(dtype).eps
        stop = done | converged

        verts2 = verts.at[nvert].set(s)
        wits2 = wits.at[nvert].set(ws)
        a = verts[faces[:, 0]]
        visible = (jnp.sum(nr * (s[None] - a), -1) > 64 * jnp.finfo(dtype).eps) & fvalid
        # horizon edges: ordered edges of visible faces whose reverse is not
        # in the visible set (i.e. unordered edge appears once among visible)
        edges = jnp.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
        )  # (3F, 2) ordered with face winding
        evis = jnp.concatenate([visible] * 3)
        ekey = (
            jnp.minimum(edges[:, 0], edges[:, 1]) * NVERT
            + jnp.maximum(edges[:, 0], edges[:, 1])
        )
        # duplicate detection among visible edges by sorting (a closed
        # polytope has each undirected edge exactly twice; a visible edge is
        # on the horizon iff its twin's face is invisible, i.e. it appears
        # once in the visible set).  Sort-based instead of a (3F, 3F)
        # pairwise matrix (huge at batch) or a scatter histogram (pathological
        # to compile on TPU inside scan+vmap).
        nE = ekey.shape[0]
        uniq_pad = NVERT * NVERT + jnp.arange(nE, dtype=ekey.dtype)
        skey = jnp.where(evis, ekey, uniq_pad)
        order = jnp.argsort(skey)
        sk = skey[order]
        dup = jnp.zeros(nE, bool)
        dup = dup.at[1:].set(sk[1:] == sk[:-1])
        dup = dup.at[:-1].set(dup[:-1] | (sk[:-1] == sk[1:]))
        inv = jnp.argsort(order)
        horizon = evis & ~dup[inv]

        fvalid2 = fvalid & (~visible)
        slot_order = jnp.argsort(fvalid2, stable=True)  # invalid slots first
        hor_order = jnp.argsort(~horizon, stable=True)
        nhor = jnp.sum(horizon)
        he = edges[hor_order[:EPA_FACES]]
        new_faces = jnp.stack(
            [he[:, 0], he[:, 1], jnp.full(EPA_FACES, nvert, jnp.int32)], -1
        )
        take = jnp.arange(EPA_FACES) < nhor
        slots = slot_order[:EPA_FACES]
        faces2 = faces.at[slots].set(
            jnp.where(take[:, None], new_faces, faces[slots])
        )
        fvalid3 = fvalid2.at[slots].set(jnp.where(take, True, fvalid2[slots]))

        new = (verts2, wits2, jnp.minimum(nvert + 1, NVERT - 1), faces2,
               fvalid3, stop)
        out = jax.tree_util.tree_map(
            lambda old, nw: jnp.where(stop, old, nw), carry, new
        )
        # keep done flag updated even when stopping this iteration
        return out[:5] + (stop,), None

    carry = (verts, wits, jnp.int32(4), faces, fvalid, jnp.bool_(False))
    (verts, wits, nvert, faces, fvalid, _), _ = jax.lax.scan(
        body, carry, None, length=EPA_ITERS
    )

    nr, dist = normals_dists(faces, verts, fvalid)
    fi = jnp.argmin(dist)
    n = nr[fi]
    depth = -dist[fi]

    # witness: project origin onto the closest face, barycentric-combine the
    # face verts' witness pairs
    tri = verts[faces[fi]]        # (3, 3)
    twit = wits[faces[fi]]        # (3, 6)
    lam = _tri_barycentric(tri, n * dist[fi])
    wa = lam @ twit[:, :3]
    wb = lam @ twit[:, 3:]
    pos = 0.5 * (wa + wb)
    return depth, n, pos


def _tri_barycentric(tri, p):
    """Clamped barycentric coordinates of p in triangle tri (3,3)."""
    T = tri - p[None]
    G = T @ T.T + 1.0 + 64 * jnp.finfo(tri.dtype).eps * jnp.eye(3, dtype=tri.dtype)
    lam = _solve_spd_small(G, jnp.ones(3, dtype=tri.dtype))
    lam = jnp.maximum(lam, 0.0)
    s = jnp.sum(lam)
    return lam / jnp.where(s < 1e-13, 1e-13, s)
