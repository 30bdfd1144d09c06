"""Convex-hull narrowphase in batch-last "lanes" form: the TPU f32 path.

Semantically the sampled-direction support sweep of `gjk._dir_penetration`
(the f32 throughput collider; replaces MuJoCo's convex narrowphase invoked
from the reference hot loop, /root/reference/gym_so100/env.py step ->
mj_step -> mj_collision for mesh geoms), re-laid-out for the TPU memory
system.  The vmapped per-env version (`narrowphase._hull_chunk`) costs
~100 ms/substep at B=1024 and dominates hulls-on stepping: per-env
dynamic-slice vertex windows, per-env top-K slot selection (12 sequential
argmin+scatter rounds), and (B, KH, ND, HULL_BLOCK) support tables that
tile-pad the minor dims.  This module replaces all of it with dense
batch-last array ops:

* **Geom-level support tables.**  Each unique hull geom's support heights
  max_v d.x and min_v d.x are computed ONCE per substep over the fixed
  direction set and shared by every pair touching that geom (the scene has
  129 hull pairs over 25 geoms — a 5x dedup).  Tables are (ND, G, B):
  direction-major, batch minor, so every op runs full-width lanes.
* **Pairs are adds, not sweeps.**  Per pair, the overlap extent along d is
  `h[d] = maxA[d] - minB[d]`; depth/normal fall out of one argmin reduction
  over the direction axis.  No per-pair vertex work until the witness.
* **Witness by unrolled running argmax.**  The contact point needs the
  extreme vertex of each geom along the winning direction only; it is
  recomputed with a HULL_BLOCK-step unrolled select chain on (P, B) lanes
  (no gathers, no one-hots).
* **No per-env candidate selection.**  All pairs feed the global
  deepest-max_contacts selection in the narrowphase driver (MuJoCo likewise
  narrowphases every broadphase-surviving pair); the per-geom-pair AABB
  overlap test is kept as a lanes-computed activity mask.

The f64 parity path keeps the exact per-env GJK+EPA (`gjk._convex_core`).
`tests/test_hull_lanes.py` pins this module against the vmapped
`_dir_penetration` reference on random pose batches.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import gjk as gjk_mod

HULL_BLOCK = gjk_mod.HULL_BLOCK


def _static_hull_tables(m):
    """Per-geom static vertex/AABB tables for the geoms in the hull pair
    list.

    Geoms are ordered by true vertex count and split into one bucket PER
    DISTINCT COUNT, so every unrolled support chain runs exactly as deep
    as its geoms need — the builder pads hulls by repeating vertex 0,
    which can never win a strict `>` comparison, so truncating the chain
    at the true count is bit-identical to sweeping the padded block (the
    scene mixes 8-vert boxes with 64-vert decimated arm hulls; a uniform
    64-deep chain wastes ~4x the vertex work).

    Returns (gidx (G,) geom ids in bucket order, buckets [(lo, hi, V)],
    counts (G,) true vertex counts, verts (3, Vmax, G) zero-padded,
    lcen/lhalf (G, 3), i1/i2 (P,) pair indices into the bucket
    ordering)."""
    hulls = m.pairs.hull_box + m.pairs.hull_hull
    gset = sorted({g for p in hulls for g in p})
    vt = np.asarray(m.hull_vertsT, np.float64)  # (3, nblocks*HULL_BLOCK)

    def nverts(g):
        st = m.hull_start[g]
        blk = vt[:, st : st + HULL_BLOCK]
        # builder pads each hull to HULL_BLOCK by repeating vertex 0 at the
        # tail; the true count is one past the last column differing from it
        diff = np.any(blk != blk[:, :1], axis=0)
        return int(np.max(np.nonzero(diff)[0])) + 1 if diff.any() else 1

    rows_of = {g: m.hull_start[g] // HULL_BLOCK for g in gset}
    lcen_all = np.asarray(m.hull_lcen)
    lhalf_all = np.asarray(m.hull_lhalf)

    gset = sorted(gset, key=nverts)
    counts = [nverts(g) for g in gset]
    pos_in_set = {g: i for i, g in enumerate(gset)}

    # one bucket per distinct vertex count: chains run exactly as deep as
    # their geoms need (truncation is bit-identical, see docstring)
    buckets = []
    lo = 0
    for i in range(1, len(gset) + 1):
        if i == len(gset) or counts[i] != counts[lo]:
            buckets.append((lo, i, counts[lo]))
            lo = i
    Vmax = max(c for c in counts)
    verts = np.zeros((3, Vmax, len(gset)))
    for k, g in enumerate(gset):
        st = m.hull_start[g]
        verts[:, : counts[k], k] = vt[:, st : st + counts[k]]
        # pad by repeating vertex 0 (a phantom vertex inside the hull would
        # corrupt the min-support table; a repeat never changes max or min)
        verts[:, counts[k] :, k] = vt[:, st : st + 1]
    rows = [rows_of[g] for g in gset]
    lcen = lcen_all[rows]
    lhalf = lhalf_all[rows]
    i1 = np.asarray([pos_in_set[p[0]] for p in hulls], np.int32)
    i2 = np.asarray([pos_in_set[p[1]] for p in hulls], np.int32)
    gidx = np.asarray(gset, np.int32)
    return gidx, buckets, np.asarray(counts), verts, lcen, lhalf, i1, i2


def _sweep_h_pallas(p, R, verts_np, buckets, Dset, i1, i2, dtype, B):
    """Support sweep + per-pair H + winning-direction selection as ONE
    Pallas kernel, B-tiled through VMEM.

    The XLA form materializes the (ND, G, B) support tables to HBM
    (2 x ~52 MB at B=4096) and re-reads two (ND, B) slices per pair for
    the H stage — ~0.6 GB of HBM traffic per substep.  Here the tables
    live entirely in VMEM per B-tile: poses are read once, and only the
    (4P, B) results (depth + normal components) are written back.  The
    witness/AABB stages stay outside (they are compute-light on (P, B)
    lanes and already fuse well).

    Numerics identical to the XLA path: same truncated per-bucket vertex
    chains, same argmin-first tie rule (masked-iota min).  Replaces the
    mesh-geom narrowphase of the reference hot loop
    (/root/reference/gym_so100/env.py step -> mj_collision) at TPU batch
    scale."""
    import os as _os

    import jax

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = p[0].shape[0]
    P = int(i1.shape[0])
    ND = Dset.shape[0]
    Vmax = verts_np.shape[1]
    # VMEM budget (~16 MB/core scoped limit): the live set is the two
    # (G, ND, Bt) support tables = 2*G*ND*Bt*4 B plus temporaries and
    # double-buffered IO blocks.  Measured by the on-chip compiler's scoped
    # accounting: Bt=256 -> 16.69 MB (OOM by 4%), so the default is 128
    # (~8.3 MB); GST_PALLAS_HULL_BT overrides for larger-VMEM parts.
    Bt = max((bt for bt in (128,) if B % bt == 0), default=0)
    Bt = int(_os.environ.get("GST_PALLAS_HULL_BT", Bt) or Bt)

    p_pack = jnp.concatenate(p, axis=0)                      # (3G, B)
    R_pack = jnp.concatenate(
        [R[j][k] for j in range(3) for k in range(3)], axis=0
    )                                                        # (9G, B)
    # static tables as (sublane, lane) inputs: verts (G, 3*Vmax) with
    # column v*3+k = component k of vertex v; directions (ND, 3)
    verts_in = jnp.asarray(
        np.transpose(verts_np, (2, 1, 0)).reshape(G, Vmax * 3), dtype
    )
    D_in = jnp.asarray(Dset, dtype)                          # (ND, 3)
    i1l, i2l = i1.tolist(), i2.tolist()

    # per-geom true vertex counts from the bucket ranges
    Vg = [0] * G
    for lo, hi, V in buckets:
        for gi in range(lo, hi):
            Vg[gi] = V

    def kernel(p_ref, R_ref, verts_ref, D_ref, out_ref):
        Dj = [D_ref[:, j:j + 1] for j in range(3)]           # (ND, 1)

        # Per-geom support tables, computed one geom at a time so the only
        # long-lived VMEM arrays are the 2*G (ND, Bt) tables themselves
        # (the per-bucket (ND, Gb, Bt) form kept ~3x more live and OOMed
        # the 16 MB scoped VMEM on chip).  Numerics identical: same
        # summation order (j then k), same truncated chains.
        Tt = [None] * G                                      # per-geom (ND, Bt)
        Tb = [None] * G
        for gi in range(G):
            row = lambda j, k: R_ref[
                (j * 3 + k) * G + gi:(j * 3 + k) * G + gi + 1
            ]                                                # (1, Bt)
            ld = [
                sum(Dj[j] * row(j, k) for j in range(3))     # (ND, Bt)
                for k in range(3)
            ]

            def s_of(v):
                return sum(
                    ld[k] * verts_ref[gi:gi + 1, v * 3 + k:v * 3 + k + 1]
                    for k in range(3)
                )

            smax = s_of(0)
            smin = smax
            for v in range(1, Vg[gi]):
                s = s_of(v)
                smax = jnp.maximum(smax, s)
                smin = jnp.minimum(smin, s)
            dp = sum(
                Dj[j] * p_ref[j * G + gi:j * G + gi + 1] for j in range(3)
            )
            Tt[gi] = smax + dp
            Tb[gi] = smin + dp

        iota = jax.lax.broadcasted_iota(jnp.int32, (ND, Bt), 0)
        nd_big = jnp.full((ND, Bt), ND, jnp.int32)
        for pp in range(P):
            h = Tt[i1l[pp]] - Tb[i2l[pp]]                    # (ND, Bt)
            hmin = jnp.min(h, axis=0, keepdims=True)
            # argmin-first tie rule via masked-iota min (no 1-D shapes)
            bd = jnp.min(
                jnp.where(h == hmin, iota, nd_big), axis=0, keepdims=True
            )
            oh = iota == bd                                  # (ND, Bt)
            out_ref[pp:pp + 1] = -hmin                       # depth
            for j in range(3):
                out_ref[(1 + j) * P + pp:(1 + j) * P + pp + 1] = jnp.sum(
                    jnp.where(oh, Dj[j], 0.0), axis=0, keepdims=True
                )

    rowspec = lambda n: pl.BlockSpec(
        (n, Bt), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    fullspec = lambda r, c: pl.BlockSpec(
        (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[
            rowspec(3 * G), rowspec(9 * G),
            fullspec(G, Vmax * 3), fullspec(ND, 3),
        ],
        out_specs=rowspec(4 * P),
        out_shape=jax.ShapeDtypeStruct((4 * P, B), dtype),
        interpret=jax.default_backend() == "cpu",
    )(p_pack, R_pack, verts_in, D_in)
    depth = out[:P]
    nrm = [out[(1 + j) * P:(2 + j) * P] for j in range(3)]
    return depth, nrm


def collide_hulls_lanes(m, d, margin=0.0, lanes_out=False):
    """All hull pairs for a batched Data (leaves (B, ...)), f32.

    Returns (pos (B,P,3), normal (B,P,3), depth (B,P), active (B,P),
    pair_ids (P,)) matching the candidate-chunk contract of the
    narrowphase driver; with `lanes_out` the spatial fields stay in
    batch-last lanes form instead (pos/normal as 3-tuples of (P, B),
    depth/active (P, B), pair_ids a static numpy (P,)) so the p-major
    selection pipeline never transposes the batch axis."""
    dtype = d.geom_xpos.dtype
    (gidx, buckets, counts_np, verts_np, lcen_np, lhalf_np, i1, i2) = (
        _static_hull_tables(m)
    )
    G = gidx.shape[0]
    P = i1.shape[0]
    B = d.geom_xpos.shape[0]

    Dset = gjk_mod._dir_set_np(gjk_mod.N_PEN_DIRS)  # (ND, 3) static
    ND = Dset.shape[0]
    Dj = [jnp.asarray(Dset[:, j], dtype) for j in range(3)]  # 3 x (ND,)

    # geom poses in lanes form: p (3, G, B), R (3, 3, G, B)
    gx = d.geom_xpos[:, gidx, :]           # (B, G, 3)
    gm = d.geom_xmat[:, gidx, :, :]        # (B, G, 3, 3)
    p = [jnp.transpose(gx[..., k]) for k in range(3)]            # (G, B)
    R = [[jnp.transpose(gm[..., j, k]) for k in range(3)] for j in range(3)]

    import os as _os

    if (
        dtype == jnp.float32
        and B % 128 == 0
        and _os.environ.get("GST_PALLAS_HULL", "1") == "1"
    ):
        depth, nrm = _sweep_h_pallas(
            p, R, verts_np, buckets, Dset, i1, i2, dtype, B
        )
        return _witness_and_pack(
            m, d, margin, lanes_out, dtype, p, R, verts_np, counts_np,
            lcen_np, lhalf_np, i1, i2, depth, nrm, P, B,
        )

    # local direction components per geom: ld[k] (ND, G, B) = sum_j D_j R[j][k]
    ld = [
        sum(Dj[j][:, None, None] * R[j][k][None] for j in range(3))
        for k in range(3)
    ]
    # world-frame d . p term (ND, G, B)
    dp = sum(Dj[j][:, None, None] * p[j][None] for j in range(3))

    # support tables: running max/min over the vertex chain, unrolled per
    # exact-count bucket (bit-identical to the padded-block sweep).
    # verts_np[:, v, lo:hi] is a static row broadcast against (ND, G_b, B).
    smax_parts, smin_parts = [], []
    for lo, hi, V in buckets:
        vx = jnp.asarray(verts_np[0, :, lo:hi], dtype)  # (Vmax, G_b)
        vy = jnp.asarray(verts_np[1, :, lo:hi], dtype)
        vz = jnp.asarray(verts_np[2, :, lo:hi], dtype)
        ldb = [c[:, lo:hi, :] for c in ld]
        s0 = (
            ldb[0] * vx[0][:, None] + ldb[1] * vy[0][:, None]
            + ldb[2] * vz[0][:, None]
        )
        smax = s0
        smin = s0
        for v in range(1, V):
            s = (
                ldb[0] * vx[v][:, None] + ldb[1] * vy[v][:, None]
                + ldb[2] * vz[v][:, None]
            )
            smax = jnp.maximum(smax, s)
            smin = jnp.minimum(smin, s)
        smax_parts.append(smax)
        smin_parts.append(smin)
    Ttop = jnp.concatenate(smax_parts, axis=1) + dp  # (ND, G, B) max_x d.x
    Tbot = jnp.concatenate(smin_parts, axis=1) + dp  # min_x d.x

    # --- per-pair overlap: h[d] = maxA(d) - minB(d);  argmin_d picks the
    # least-overlap (deepest-separating) sampled direction.
    #
    # Statically unrolled over the P pairs, each a small fused (ND, B)
    # slice-subtract-reduce: the one-shot form (`H = Ttop[:, i1] -
    # Tbot[:, i2]` then min/argmin/one-hot over the (ND, P, B) tensor)
    # materializes two 266 MB gather expansions plus several full passes
    # over them — measured ~30 ms per control step of pure HBM traffic at
    # B=4096.  Per-pair slices are views of the already-materialized
    # (ND, G, B) tables, so each iteration reads 2 x ND x B floats and
    # carries only (B,)-sized state.  argmin keeps the first-min tie rule
    # of the old masked-iota form. ---
    # (The winning direction's components come from a per-pair one-hot
    # CONTRACTION, not a gather: jnp.take of the (ND,) direction table by
    # a (P, B) index array lowers to a serialized TPU gather that alone
    # cost ~130 ms per control step at B=4096; PERF_NOTES "round 3".)
    iota1 = jnp.arange(ND, dtype=jnp.int32)[:, None]             # (ND, 1)
    Hmin_l = []
    nrm_l = [[], [], []]
    for pidx in range(P):
        h = Ttop[:, int(i1[pidx]), :] - Tbot[:, int(i2[pidx]), :]  # (ND, B)
        Hmin_l.append(jnp.min(h, axis=0))
        bdp = jnp.argmin(h, axis=0).astype(jnp.int32)            # (B,)
        oh = iota1 == bdp[None, :]                               # (ND, B)
        for j in range(3):
            nrm_l[j].append(
                jnp.sum(jnp.where(oh, Dj[j][:, None], 0), axis=0)
            )
    Hmin = jnp.stack(Hmin_l, axis=0)             # (P, B)
    depth = -Hmin                                # negative when penetrating
    nrm = [jnp.stack(nrm_l[j], axis=0) for j in range(3)]  # (P, B) 1->2

    return _witness_and_pack(
        m, d, margin, lanes_out, dtype, p, R, verts_np, counts_np,
        lcen_np, lhalf_np, i1, i2, depth, nrm, P, B,
    )


def _witness_and_pack(m, d, margin, lanes_out, dtype, p, R, verts_np,
                      counts_np, lcen_np, lhalf_np, i1, i2, depth, nrm,
                      P, B):
    """Witness points, AABB activity mask, and output packing — shared by
    the XLA and Pallas sweep paths (consumes the (P, B) depth/normal)."""
    # --- witness points: extreme vertex of each geom along the winning
    # direction, recomputed as an unrolled running-select chain that runs
    # only as deep as each side geom's true vertex count (the old uniform
    # Vmax=64 chain over every pair side was ~45% of this kernel's flops;
    # truncation is bit-identical — padding repeats vertex 0, which never
    # wins a strict `>`).  Pair subsets are static index partitions by
    # side-geom vertex count, re-assembled by static scatter. ---
    def pair_lanes(arr, idx):
        return arr[idx]  # static gather on leading-axis-free (G, B) -> (P, B)

    def extreme(idx, sign):
        """argmax_v of sign * (d_local . v) for the pair's geom `idx`."""
        side_counts = counts_np[idx]               # (P,) static

        def witness_group(sub, V):
            """Rp, local witness (wx, wy, wz) for the pair subset `sub`."""
            gsub = idx[sub]                        # geom table positions
            Rp = [
                [pair_lanes(R[j][k], gsub) for k in range(3)]
                for j in range(3)
            ]
            ldk = [
                sum(sign * nrm[j][sub] * Rp[j][k] for j in range(3))
                for k in range(3)
            ]  # (Ps, B) local direction (scalar sign folded in)
            vxg = np.asarray(verts_np[0][:, gsub])  # (Vmax, Ps) static
            vyg = np.asarray(verts_np[1][:, gsub])
            vzg = np.asarray(verts_np[2][:, gsub])
            best = (
                ldk[0] * vxg[0][:, None] + ldk[1] * vyg[0][:, None]
                + ldk[2] * vzg[0][:, None]
            )
            wx = jnp.broadcast_to(
                jnp.asarray(vxg[0], dtype)[:, None], best.shape
            )
            wy = jnp.broadcast_to(
                jnp.asarray(vyg[0], dtype)[:, None], best.shape
            )
            wz = jnp.broadcast_to(
                jnp.asarray(vzg[0], dtype)[:, None], best.shape
            )
            for v in range(1, V):
                s = (
                    ldk[0] * vxg[v][:, None] + ldk[1] * vyg[v][:, None]
                    + ldk[2] * vzg[v][:, None]
                )
                better = s > best
                best = jnp.where(better, s, best)
                wx = jnp.where(better, jnp.asarray(vxg[v], dtype)[:, None], wx)
                wy = jnp.where(better, jnp.asarray(vyg[v], dtype)[:, None], wy)
                wz = jnp.where(better, jnp.asarray(vzg[v], dtype)[:, None], wz)
            return Rp, [wx, wy, wz]

        out = [jnp.zeros((P, B), dtype) for _ in range(3)]
        for V in sorted(set(side_counts.tolist())):
            sub = np.nonzero(side_counts == V)[0]
            Rp, w = witness_group(sub, V)
            gsub = idx[sub]
            pxs = pair_lanes(p[0], gsub)
            pys = pair_lanes(p[1], gsub)
            pzs = pair_lanes(p[2], gsub)
            world = (
                pxs + Rp[0][0] * w[0] + Rp[0][1] * w[1] + Rp[0][2] * w[2],
                pys + Rp[1][0] * w[0] + Rp[1][1] * w[1] + Rp[1][2] * w[2],
                pzs + Rp[2][0] * w[0] + Rp[2][1] * w[1] + Rp[2][2] * w[2],
            )
            for k in range(3):
                out[k] = out[k].at[sub].set(world[k])
        return tuple(out)

    a = extreme(i1, 1.0)    # max of geom1 along +d
    b = extreme(i2, -1.0)   # min of geom2 along +d
    pos = [0.5 * (a[k] + b[k]) for k in range(3)]

    # --- AABB activity mask (the broadphase `_hull_chunk` applies) ---
    lc = [jnp.asarray(lcen_np[:, k], dtype) for k in range(3)]   # (G,)
    lh = [jnp.asarray(lhalf_np[:, k], dtype) for k in range(3)]
    wc = [
        p[k]
        + R[k][0] * lc[0][:, None] + R[k][1] * lc[1][:, None]
        + R[k][2] * lc[2][:, None]
        for k in range(3)
    ]
    wh = [
        jnp.abs(R[k][0]) * lh[0][:, None] + jnp.abs(R[k][1]) * lh[1][:, None]
        + jnp.abs(R[k][2]) * lh[2][:, None]
        for k in range(3)
    ]
    ov = None
    for k in range(3):
        lo = jnp.maximum(wc[k][i1] - wh[k][i1], wc[k][i2] - wh[k][i2])
        hi = jnp.minimum(wc[k][i1] + wh[k][i1], wc[k][i2] + wh[k][i2])
        e = hi - lo
        ov = e if ov is None else jnp.minimum(ov, e)

    active = (depth < margin) & (ov > 0)         # (P, B)

    if lanes_out:
        pair_ids_np = len(m.pairs.box_box) + np.arange(P, dtype=np.int32)
        return tuple(pos), tuple(nrm), depth, active, pair_ids_np

    # --- AoS exports (B, P, ...) for the candidate concat ---
    pos_b = jnp.stack([jnp.transpose(c) for c in pos], axis=-1)
    nrm_b = jnp.stack([jnp.transpose(c) for c in nrm], axis=-1)
    pair_ids = len(m.pairs.box_box) + jnp.arange(P, dtype=jnp.int32)
    return (
        pos_b, nrm_b, jnp.transpose(depth), jnp.transpose(active),
        jnp.broadcast_to(pair_ids, (B, P)),
    )
