"""Batch-last (lanes) Newton constraint solver — the TPU throughput form.

Same optimization problem, zones, line search, and termination rule as
solver.solve (see that module's docstring for the math and the MuJoCo
calibration), but every per-row quantity is a (NE, B) / (K, B) lane array
with the env batch minor, and the per-env 12x12 dense algebra (Hessian
gram, Cholesky, triangular solves) runs as unrolled scalar recurrences on
(B,) lanes.

Why: the vmapped AoS solver reads the (B, NE, nv) Jacobian whose nv=12
minor pads to 128-lane tiles (10.7x), so each Newton iteration moves
~10x more HBM than the math needs; measured ~107 ms of the 465 ms
control step at B=4096.  In lanes form the Jacobian is a list of nv
(NE, B) arrays — full-width (8, 128) tiles, reductions over the major
row axis only, no tile-sparse minor-dim slicing.

Consumes constraint_lanes.EfcLanes; numerics match vmap(solver.solve) to
roundoff (tests/test_efc_lanes.py::test_step_batched_still_consistent_with_vmap_step
and tests/test_lanes.py::test_step_batched_matches_vmap pin the full batched
step, this solver included, against the vmapped AoS pipeline)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import Model
from .constraint import CDIM
from .constraint_lanes import EfcLanes
from .smooth_lanes import _chol_lanes, _chol_solve_lanes

MINVAL_ = 1e-15


def _sym_matvec(M, x, nv):
    """y_i = sum_j M[i][j] x_j for nested-list lanes M (full storage)."""
    return [
        sum(M[i][j] * x[j] for j in range(nv)) for i in range(nv)
    ]


def _cost_terms(efc: EfcLanes, jar):
    """Constraint cost pieces in lanes form.

    jar: (NE, B).  Returns (cost (B,), grad_s (ns, B), hess_s (ns, B),
    grad_c (K, CDIM, B), D_c, cone dict).  Scalar-row zone logic uses the
    STATIC row ranges [eq | floss | limit] instead of boolean masks."""
    neq, nf, nl = efc.neq, efc.nf, efc.nl
    start = neq + nf + nl
    D_s = efc.D[:start]
    jar_s = jar[:start]
    jar_c = jar[start:].reshape(-1, CDIM, jar.shape[-1])
    D_c = efc.D[start:].reshape(jar_c.shape)

    # equality rows: always-active quadratic
    ge = D_s[:neq] * jar_s[:neq]
    he = D_s[:neq]
    ce = 0.5 * ge * jar_s[:neq]
    # friction loss: Huber
    jf = jar_s[neq:neq + nf]
    Df = D_s[neq:neq + nf]
    fl = efc.floss
    lim = fl * efc.R[neq:neq + nf]
    quad = jnp.abs(jf) <= lim
    cf = jnp.where(quad, 0.5 * Df * jf * jf, fl * jnp.abs(jf) - 0.5 * fl * lim)
    gf = jnp.where(quad, Df * jf, fl * jnp.sign(jf))
    hf = jnp.where(quad, Df, 0.0)
    # limits: one-sided quadratic (D already gated by pos < 0)
    jl = jar_s[neq + nf:]
    Dl = D_s[neq + nf:]
    actl = jl < 0
    cl = jnp.where(actl, 0.5 * Dl * jl * jl, 0.0)
    gl = jnp.where(actl, Dl * jl, 0.0)
    hl = jnp.where(actl, Dl, 0.0)

    grad_s = jnp.concatenate([ge, gf, gl])
    hess_s = jnp.concatenate([he, hf, hl])
    cost_s = jnp.sum(ce, 0) + jnp.sum(cf, 0) + jnp.sum(cl, 0)

    # contact cones (scaled circular cone; see solver.py)
    u = jar_c * efc.con_uscale                    # (K, CDIM, B)
    un = u[:, 0]
    ut = u[:, 1:]                                 # (K, 3, B)
    Traw = jnp.sqrt(jnp.sum(ut * ut, 1))
    T = jnp.maximum(Traw, jnp.asarray(1e-30, jar.dtype))
    mu = efc.con_mu
    Dn = efc.con_Dn
    bottom = mu * Traw <= un
    top = Traw <= -mu * un
    middle = ~(bottom | top) & (Dn > 0)
    top = top & (Dn > 0)

    w = mu * Traw - un
    k = Dn / (1 + mu * mu)
    cost_c = jnp.where(top, 0.5 * jnp.sum(D_c * jar_c * jar_c, 1), 0.0)
    cost_c = cost_c + jnp.where(middle, 0.5 * k * w * w, 0.0)
    uhat = ut / T[:, None]
    g_mid_u = jnp.concatenate([-jnp.ones_like(un)[:, None], mu[:, None] * uhat], 1)
    grad_c = (
        top[:, None] * D_c * jar_c
        + middle[:, None] * (k * w)[:, None] * g_mid_u * efc.con_uscale
    )

    cost = cost_s + jnp.sum(cost_c, 0)
    cone = dict(middle=middle, top=top, k=k, w=w, mu=mu, uhat=uhat, T=T)
    return cost, grad_s, hess_s, grad_c, D_c, cone


def _assemble(efc: EfcLanes, jar, nv):
    """cost (B,), gradient J'g as nv-list of (B,), Hessian lower triangle
    as nested lists H[i][j] (j <= i) of (B,)."""
    cost, grad_s, hess_s, grad_c, D_c, cone = _cost_terms(efc, jar)
    start = efc.neq + efc.nf + efc.nl
    B = jar.shape[-1]
    J = efc.J                                     # list of nv (NE, B)
    Jc = [Jv[start:].reshape(-1, CDIM, B) for Jv in J]  # (K, CDIM, B) per v

    g_all = jnp.concatenate([grad_s, grad_c.reshape(-1, B)])
    grad = [jnp.sum(Jv * g_all, axis=0) for Jv in J]

    # diag-weight gram over all rows (scalar hessians + top-zone weights)
    w_top = (cone["top"][:, None] * D_c).reshape(-1, B)
    w_diag = jnp.concatenate([hess_s, w_top])     # (NE, B)
    WJ = [w_diag * Jv for Jv in J]

    # middle-zone rank-1: a_v = sum_r g_u[:, r] Jc_v[:, r], H += kk a a'
    us = efc.con_uscale
    g_u = jnp.concatenate(
        [-jnp.ones_like(cone["w"])[:, None], cone["mu"][:, None] * cone["uhat"]],
        axis=1,
    ) * us                                        # (K, CDIM, B)
    kk = cone["k"] * cone["middle"]               # (K, B)
    a = [jnp.sum(g_u * Jcv, axis=1) for Jcv in Jc]  # (K, B) per v

    # middle-zone curvature: wmu * Jt' (I - uhat uhat')/T Jt in scaled coords
    uh = cone["uhat"]                             # (K, 3, B)
    St = us[:, 1:]                                # (K, 3, B)
    wmu = kk * cone["w"] * cone["mu"] / cone["T"]  # (K, B)
    SJt = [St * Jcv[:, 1:] for Jcv in Jc]         # (K, 3, B) per v
    proj = [jnp.sum(uh * SJtv, axis=1) for SJtv in SJt]  # (K, B) per v

    H = [[None] * nv for _ in range(nv)]
    for i in range(nv):
        for j in range(i + 1):
            g1 = jnp.sum(WJ[i] * J[j], axis=0)
            g2 = jnp.sum(kk * a[i] * a[j], axis=0)
            g3 = jnp.sum(
                wmu * (jnp.sum(SJt[i] * SJt[j], axis=1) - proj[i] * proj[j]),
                axis=0,
            )
            H[i][j] = g1 + g2 + g3
    return cost, grad, H



def _solve_fused_pallas(m, qM, a0, efc: EfcLanes, warmstart,
                        max_iters, ls_len, bracket_len, tol):
    """Whole Newton solve as ONE Pallas kernel, B-tiled through VMEM.

    Round-4's line-search-only kernel (pruned in round 5) measured SLOWER than the
    scan path because the pallas_call boundary materialized jar/djar/D to
    HBM every Newton iteration, breaking XLA's producer fusions.  This
    kernel moves the ENTIRE solve inside — J/D/aref/uscale/qM are read
    from HBM exactly once per substep and every Newton iteration and all
    ~13 line-search evaluations run against VMEM-resident rows.  Same
    algorithm, zones, masked-iteration semantics, and termination rule as
    the scan path (kept as the f64/parity/fallback path below; equivalence
    pinned in tests/test_efc_lanes.py).

    Replaces the PGS/Newton solve of the reference's mj_step hot loop
    (/root/reference/gym_so100/env.py:172-182) at TPU batch scale.
    """
    import os as _os

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = a0.dtype
    nv = a0.shape[-1]
    B = a0.shape[0]
    NE = efc.aref.shape[0]
    neq, nf = efc.neq, efc.nf
    ns = neq + nf + efc.nl
    nlp = ns - neq - nf                      # limits incl. tile padding
    K = efc.con_mu.shape[0]
    ntri = nv * (nv + 1) // 2
    # VMEM budget (~16 MB scoped): the dominant resident is the J block
    # (nv*NE rows; ~1.9k rows at K=32) read once per tile plus its in-kernel
    # working copy — at Bt=512 that alone is ~7.5 MB double-buffered + 3.7 MB
    # live and the whole set brushes the limit, so default to 256.
    Bt = max(
        (bt for bt in (256, 128) if B % bt == 0),
        default=0,
    )
    Bt = int(_os.environ.get("GST_PALLAS_BT", Bt) or Bt)
    tiny = float(jnp.finfo(dtype).tiny) ** 0.5

    # --- pack inputs as (rows, B) lane arrays ---
    # aux rows: [floss (nf) | R_f (nf) | mu (K) | Dn (K) | scale (1)],
    # padded to a multiple of 8 sublanes
    o_fl, o_rf, o_mu, o_dn = 0, nf, 2 * nf, 2 * nf + K
    o_sc = 2 * nf + 2 * K
    n_aux = o_sc + 1
    n_aux_pad = -(-n_aux // 8) * 8
    scale = 1.0 / (jnp.maximum(m.stat_meaninertia, MINVAL_) * max(1, nv))
    aux = jnp.concatenate(
        [efc.floss, efc.R[neq:neq + nf], efc.con_mu, efc.con_Dn,
         jnp.broadcast_to(jnp.asarray(scale, dtype), (1, B)),
         jnp.zeros((n_aux_pad - n_aux, B), dtype)],
        axis=0,
    )
    # Contact rows repacked COMPONENT-MAJOR (row j*K + ki instead of
    # ki*CDIM + j): Mosaic compiles 2-D (K, Bt) vectors natively, while
    # the 3-D (K, CDIM, Bt) reshape/middle-axis-broadcast form produced
    # implicit-dim replicated layouts it cannot relayout ("Invalid
    # relayout ... vector<16x256xf32>" on-chip, round 5).  The same row
    # order is applied to J/aref/D/uscale and the in-kernel force vector,
    # so every row contraction is order-invariant.
    def cmajor(A):
        con = A[ns:].reshape(K, CDIM, B)
        return jnp.concatenate(
            [A[:ns]] + [con[:, j] for j in range(CDIM)], axis=0
        )

    usc = jnp.concatenate(
        [efc.con_uscale[:, j] for j in range(CDIM)], axis=0
    )                                                    # (CDIM*K, B)
    qMl = jnp.stack(
        [qM[i][j] for i in range(nv) for j in range(i + 1)], axis=0
    )                                                    # (ntri, B)
    x0 = a0.T                                            # (nv, B)
    warm = warmstart.T if warmstart is not None else x0

    def kernel(J_ref, aref_ref, D_ref, aux_ref, us_ref, qM_ref,
               x0_ref, warm_ref, out_ref):
        J = [J_ref[v * NE:(v + 1) * NE] for v in range(nv)]   # nv x (NE, Bt)
        arefv = aref_ref[:]
        Dv = D_ref[:]
        fl = aux_ref[o_fl:o_fl + nf]
        Rf = aux_ref[o_rf:o_rf + nf]
        mu = aux_ref[o_mu:o_mu + K]
        Dn = aux_ref[o_dn:o_dn + K]
        scl = aux_ref[o_sc:o_sc + 1]
        us = [us_ref[j * K:(j + 1) * K] for j in range(CDIM)]  # CDIM x (K, Bt)
        lim = fl * Rf
        D_c = [Dv[ns + j * K:ns + (j + 1) * K] for j in range(CDIM)]

        def con_rows(arr):                                # (NE, Bt) -> comps
            return [arr[ns + j * K:ns + (j + 1) * K] for j in range(CDIM)]
        # full symmetric qM view from the lower-tri pack
        qMt = [[None] * nv for _ in range(nv)]
        r = 0
        for i in range(nv):
            for j in range(i + 1):
                qMt[i][j] = qM_ref[r:r + 1]
                qMt[j][i] = qMt[i][j]
                r += 1
        x0v = [x0_ref[i:i + 1] for i in range(nv)]
        warmv = [warm_ref[i:i + 1] for i in range(nv)]

        def jar_of(xs):                                   # xs nv x (1, Bt)
            acc = -arefv
            for v in range(nv):
                acc = acc + J[v] * xs[v]
            return acc

        def mat_vec(xs):                                  # qM @ xs
            return [
                sum(qMt[i][j] * xs[j] for j in range(nv)) for i in range(nv)
            ]

        def cone_terms(jar):
            """Shared cone-zone quantities at jar (mirrors _cost_terms).

            All (K, Bt) 2-D arrays; `jar_c`/`uhat` are CDIM-length (resp.
            CDIM-1) component lists."""
            jar_c = con_rows(jar)
            u = [jar_c[j] * us[j] for j in range(CDIM)]
            un = u[0]
            Traw = jnp.sqrt(sum(u[j] * u[j] for j in range(1, CDIM)))
            T = jnp.maximum(Traw, jnp.asarray(1e-30, dtype))
            bottom = mu * Traw <= un
            topz = (Traw <= -mu * un) & (Dn > 0)
            middle = ~(bottom | (Traw <= -mu * un)) & (Dn > 0)
            w = mu * Traw - un
            k = Dn / (1 + mu * mu)
            uhat = [u[j] / T for j in range(1, CDIM)]
            return jar_c, un, T, topz, middle, w, k, uhat

        def grad_con(jar_c, topz, middle, w, k, uhat):
            """Per-component contact-row gradient (CDIM x (K, Bt)): the
            component-list form of topz*D_c*jar_c + middle*(k w)*g_mid*us
            with g_mid = (-1, mu*uhat)."""
            kw = jnp.where(middle, k * w, 0.0)
            g = [jnp.where(topz, D_c[0] * jar_c[0], 0.0) - kw * us[0]]
            for j in range(1, CDIM):
                g.append(
                    jnp.where(topz, D_c[j] * jar_c[j], 0.0)
                    + kw * mu * uhat[j - 1] * us[j]
                )
            return g

        def scalar_grads(jar):
            """Per-segment scalar-row gradients (zeros where inactive)."""
            out = {}
            if neq:
                out["ge"] = Dv[:neq] * jar[:neq]
            if nf:
                jf = jar[neq:neq + nf]
                out["gf"] = jnp.where(
                    jnp.abs(jf) <= lim, Dv[neq:neq + nf] * jf,
                    fl * jnp.sign(jf),
                )
            if nlp:
                jl = jar[neq + nf:ns]
                out["gl"] = jnp.where(jl < 0, Dv[neq + nf:ns] * jl, 0.0)
            return out

        def cost_of(xs):
            """Total cost: constraint cost + 0.5 (x-a0)' M (x-a0)."""
            jar = jar_of(xs)
            c = jnp.zeros((1, Bt), dtype)
            if neq:
                c = c + jnp.sum(
                    0.5 * Dv[:neq] * jar[:neq] * jar[:neq],
                    axis=0, keepdims=True,
                )
            if nf:
                jf = jar[neq:neq + nf]
                c = c + jnp.sum(
                    jnp.where(
                        jnp.abs(jf) <= lim,
                        0.5 * Dv[neq:neq + nf] * jf * jf,
                        fl * jnp.abs(jf) - 0.5 * fl * lim,
                    ),
                    axis=0, keepdims=True,
                )
            if nlp:
                jl = jar[neq + nf:ns]
                c = c + jnp.sum(
                    jnp.where(jl < 0, 0.5 * Dv[neq + nf:ns] * jl * jl, 0.0),
                    axis=0, keepdims=True,
                )
            jar_c, un, T, topz, middle, w, k, uhat = cone_terms(jar)
            cc = jnp.where(
                topz,
                0.5 * sum(D_c[j] * jar_c[j] * jar_c[j] for j in range(CDIM)),
                0.0,
            )
            cc = cc + jnp.where(middle, 0.5 * k * w * w, 0.0)
            c = c + jnp.sum(cc, axis=0, keepdims=True)
            dx = [xs[i] - x0v[i] for i in range(nv)]
            Mdx = mat_vec(dx)
            c = c + 0.5 * sum(dx[i] * Mdx[i] for i in range(nv))
            return c

        # warmstart selection (same rule as the scan path)
        cw = cost_of(warmv)
        cs = cost_of(x0v)
        better = cw < cs
        x_init = jnp.concatenate(
            [jnp.where(better, warmv[i], x0v[i]) for i in range(nv)], axis=0
        )                                                  # (nv, Bt)

        def newton_body(_, carry):
            # `done` is carried as f32 0/1, not bool: an i1 (1, Bt) loop
            # carry makes Mosaic emit malformed mask IR it cannot legalize
            # ("failed to legalize operation", on-chip round 5).
            xmat, it, done_f, cost_prev = carry
            done = done_f > 0.5
            xs = [xmat[i:i + 1] for i in range(nv)]
            jar = jar_of(xs)
            sg = scalar_grads(jar)
            jar_c, un, T, topz, middle, w, k, uhat = cone_terms(jar)
            grad_c = grad_con(jar_c, topz, middle, w, k, uhat)
            # constraint cost at xs (for the improvement test)
            cost_con = jnp.zeros((1, Bt), dtype)
            if neq:
                cost_con = cost_con + jnp.sum(
                    0.5 * sg["ge"] * jar[:neq], axis=0, keepdims=True
                )
            if nf:
                jf = jar[neq:neq + nf]
                cost_con = cost_con + jnp.sum(
                    jnp.where(
                        jnp.abs(jf) <= lim,
                        0.5 * Dv[neq:neq + nf] * jf * jf,
                        fl * jnp.abs(jf) - 0.5 * fl * lim,
                    ),
                    axis=0, keepdims=True,
                )
            if nlp:
                jl = jar[neq + nf:ns]
                cost_con = cost_con + jnp.sum(
                    jnp.where(jl < 0, 0.5 * Dv[neq + nf:ns] * jl * jl, 0.0),
                    axis=0, keepdims=True,
                )
            cc = jnp.where(
                topz,
                0.5 * sum(D_c[j] * jar_c[j] * jar_c[j] for j in range(CDIM)),
                0.0,
            )
            cc = cc + jnp.where(middle, 0.5 * k * w * w, 0.0)
            cost_con = cost_con + jnp.sum(cc, axis=0, keepdims=True)

            # gradient J'g + M dx, and diag-weight + rank-1 Hessian
            pieces_g, pieces_h = [], []
            if neq:
                pieces_g.append(sg["ge"])
                pieces_h.append(Dv[:neq])
            if nf:
                jf = jar[neq:neq + nf]
                pieces_g.append(sg["gf"])
                pieces_h.append(
                    jnp.where(jnp.abs(jf) <= lim, Dv[neq:neq + nf], 0.0)
                )
            if nlp:
                jl = jar[neq + nf:ns]
                pieces_g.append(sg["gl"])
                pieces_h.append(jnp.where(jl < 0, Dv[neq + nf:ns], 0.0))
            pieces_g.extend(grad_c)                       # component-major
            pieces_h.extend(
                jnp.where(topz, D_c[j], 0.0) for j in range(CDIM)
            )
            g_all = jnp.concatenate(pieces_g, axis=0)     # (NE, Bt)
            w_diag = jnp.concatenate(pieces_h, axis=0)    # (NE, Bt)

            dx = [xs[i] - x0v[i] for i in range(nv)]
            Mdx = mat_vec(dx)
            cost = cost_con + 0.5 * sum(dx[i] * Mdx[i] for i in range(nv))
            grad = [
                Mdx[i] + jnp.sum(J[i] * g_all, axis=0, keepdims=True)
                for i in range(nv)
            ]

            # middle-zone rank-1 pieces (component lists, all (K, Bt))
            g_u = [-us[0]] + [
                mu * uhat[j - 1] * us[j] for j in range(1, CDIM)
            ]
            kk = jnp.where(middle, k, 0.0)
            Jc = [con_rows(J[v]) for v in range(nv)]
            a_ = [
                sum(g_u[j] * Jc[v][j] for j in range(CDIM))
                for v in range(nv)
            ]
            SJt = [
                [us[j] * Jc[v][j] for j in range(1, CDIM)]
                for v in range(nv)
            ]
            proj = [
                sum(uhat[t] * SJt[v][t] for t in range(CDIM - 1))
                for v in range(nv)
            ]
            wmu = kk * w * mu / T

            WJ = [w_diag * J[i] for i in range(nv)]
            H = [[None] * nv for _ in range(nv)]
            for i in range(nv):
                for j in range(i + 1):
                    g1 = jnp.sum(WJ[i] * J[j], axis=0, keepdims=True)
                    g2 = jnp.sum(kk * a_[i] * a_[j], axis=0, keepdims=True)
                    g3 = jnp.sum(
                        wmu * (
                            sum(
                                SJt[i][t] * SJt[j][t]
                                for t in range(CDIM - 1)
                            )
                            - proj[i] * proj[j]
                        ),
                        axis=0, keepdims=True,
                    )
                    H[i][j] = qMt[i][j] + g1 + g2 + g3

            # lanes Cholesky + solve (mirrors smooth_lanes._chol_lanes)
            L = [[None] * nv for _ in range(nv)]
            for jj in range(nv):
                sval = H[jj][jj]
                for kx in range(jj):
                    sval = sval - L[jj][kx] * L[jj][kx]
                L[jj][jj] = jnp.sqrt(jnp.maximum(sval, tiny))
                inv = 1.0 / L[jj][jj]
                for ii in range(jj + 1, nv):
                    sval = H[ii][jj]
                    for kx in range(jj):
                        sval = sval - L[ii][kx] * L[jj][kx]
                    L[ii][jj] = sval * inv
            y = [None] * nv
            for ii in range(nv):
                sval = grad[ii]
                for kx in range(ii):
                    sval = sval - L[ii][kx] * y[kx]
                y[ii] = sval / L[ii][ii]
            dirn = [None] * nv
            for ii in reversed(range(nv)):
                sval = y[ii]
                for kx in range(ii + 1, nv):
                    sval = sval - L[kx][ii] * dirn[kx]
                dirn[ii] = sval / L[ii][ii]
            dirn = [-v for v in dirn]
            # descent guard (see scan path): fall back to Jacobi-scaled
            # steepest descent when the Cholesky direction doesn't descend
            slope = sum(grad[i] * dirn[i] for i in range(nv))
            desc = slope < 0
            dirn = [
                jnp.where(desc, dirn[i], -grad[i] / jnp.maximum(H[i][i], MINVAL_))
                for i in range(nv)
            ]

            djar = jnp.zeros((NE, Bt), dtype)
            for v in range(nv):
                djar = djar + J[v] * dirn[v]
            dj_c = con_rows(djar)
            Md = mat_vec(dirn)
            c1 = sum(dirn[i] * Mdx[i] for i in range(nv))
            c2 = sum(dirn[i] * Md[i] for i in range(nv))

            def d1_of(alpha):                              # (1, Bt) -> (1, Bt)
                jar_a = jar + alpha * djar
                sga = scalar_grads(jar_a)
                d1 = c1 + alpha * c2
                if neq:
                    d1 = d1 + jnp.sum(
                        sga["ge"] * djar[:neq], axis=0, keepdims=True
                    )
                if nf:
                    d1 = d1 + jnp.sum(
                        sga["gf"] * djar[neq:neq + nf], axis=0, keepdims=True
                    )
                if nlp:
                    d1 = d1 + jnp.sum(
                        sga["gl"] * djar[neq + nf:ns], axis=0, keepdims=True
                    )
                jc, una, Ta, topa, mida, wa, ka, uha = cone_terms(jar_a)
                gc = grad_con(jc, topa, mida, wa, ka, uha)
                return d1 + jnp.sum(
                    sum(gc[j] * dj_c[j] for j in range(CDIM)),
                    axis=0, keepdims=True,
                )

            one = jnp.ones((1, Bt), dtype)
            hi = one
            ok = jnp.zeros((1, Bt), bool)
            for _ in range(bracket_len):
                d1 = d1_of(hi)
                ok2 = d1 > 0
                hi = jnp.where(ok | ok2, hi, hi * 2.0)
                ok = ok | ok2
            dhi = d1_of(hi)
            dlo = d1_of(jnp.zeros((1, Bt), dtype))
            dlo0 = dlo
            lo = jnp.zeros((1, Bt), dtype)
            for _ in range(ls_len):
                denom = dhi - dlo
                a_il = jnp.where(
                    jnp.abs(denom) > MINVAL_,
                    lo - dlo * (hi - lo)
                    / jnp.where(jnp.abs(denom) > MINVAL_, denom, 1.0),
                    0.5 * (lo + hi),
                )
                a_il = jnp.clip(a_il, lo + 1e-14, hi - 1e-14)
                da = d1_of(a_il)
                neg = da < 0
                lo = jnp.where(neg, a_il, lo)
                dlo = jnp.where(neg, da, 0.5 * dlo)
                hi = jnp.where(neg, hi, a_il)
                dhi = jnp.where(neg, 0.5 * dhi, da)
            denom = dhi - dlo
            alpha = jnp.where(
                jnp.abs(denom) > MINVAL_,
                lo - dlo * (hi - lo)
                / jnp.where(jnp.abs(denom) > MINVAL_, denom, 1.0),
                0.5 * (lo + hi),
            )
            alpha = jnp.where(dlo0 >= 0, 0.0, alpha)

            x_new = [xs[i] + alpha * dirn[i] for i in range(nv)]
            cost_new = cost_of(x_new)
            improvement = (cost - cost_new) * scl
            gradnorm = jnp.sqrt(sum(g * g for g in grad)) * scl
            done_new = (improvement < tol) | (gradnorm < tol)
            keep = cost_new < cost
            x_out = [jnp.where(keep, x_new[i], xs[i]) for i in range(nv)]
            # masked-iteration semantics (scan path's masked_body)
            x_mat2 = jnp.concatenate(
                [jnp.where(done, xs[i], x_out[i]) for i in range(nv)], axis=0
            )
            it2 = jnp.where(done, it, it + 1.0)
            cost2 = jnp.where(done, cost_prev, cost_new)
            done_f2 = jnp.maximum(
                done_f, jnp.where(done_new, it * 0.0 + 1.0, it * 0.0)
            )
            return x_mat2, it2, done_f2, cost2

        # Loop-carry inits must be derived from loaded rows, not constant
        # splats: Mosaic gives constants a replicated layout, the body
        # returns concrete-layout rows, and the backedge relayout
        # concrete -> replicated is unsupported ("Invalid relayout ...
        # vector<1x256xf32>" on-chip).  scl is a loaded (1, Bt) row.
        zrow = scl * 0.0
        carry = (
            x_init, zrow, zrow, zrow + jnp.asarray(jnp.inf, dtype),
        )
        x_fin, niter, _, _ = jax.lax.fori_loop(
            0, max_iters, newton_body, carry
        )

        xs = [x_fin[i:i + 1] for i in range(nv)]
        jar = jar_of(xs)
        sg = scalar_grads(jar)
        jar_c, un, T, topz, middle, w, k, uhat = cone_terms(jar)
        grad_c = grad_con(jar_c, topz, middle, w, k, uhat)
        pieces = []
        if neq:
            pieces.append(sg["ge"])
        if nf:
            pieces.append(sg["gf"])
        if nlp:
            pieces.append(sg["gl"])
        pieces.extend(grad_c)                             # component-major
        force = jnp.concatenate(pieces, axis=0)
        qfrc = jnp.concatenate(
            [-jnp.sum(J[v] * force, axis=0, keepdims=True) for v in range(nv)],
            axis=0,
        )
        out_ref[0:nv] = x_fin
        out_ref[nv:2 * nv] = qfrc
        out_ref[2 * nv:2 * nv + 1] = niter

    rowspec = lambda n: pl.BlockSpec(
        (n, Bt), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    Jstack = jnp.concatenate(
        [cmajor(Jv) for Jv in efc.J], axis=0
    )                                                     # (nv*NE, B)
    out = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[
            rowspec(nv * NE), rowspec(NE), rowspec(NE),
            rowspec(n_aux_pad), rowspec(K * CDIM), rowspec(ntri),
            rowspec(nv), rowspec(nv),
        ],
        out_specs=rowspec(2 * nv + 1),
        out_shape=jax.ShapeDtypeStruct((2 * nv + 1, B), dtype),
        interpret=jax.default_backend() == "cpu",
    )(Jstack, cmajor(efc.aref), cmajor(efc.D), aux, usc, qMl, x0, warm)
    qacc = out[0:nv].T
    qfrc = out[nv:2 * nv].T
    niter = out[2 * nv].astype(jnp.int32)
    return qacc, qfrc, niter


def solve_lanes(m: Model, qM, a0, efc: EfcLanes, warmstart=None):
    """Newton solve, lanes form.

    qM: nv x nv nested lists of (B,) (full symmetric storage, from
    smooth_lanes).  a0: (B, nv) qacc_smooth.  warmstart: (B, nv) or None.
    Returns (qacc (B, nv), qfrc_constraint (B, nv), niter (B,))."""
    dtype = a0.dtype
    nv = a0.shape[-1]
    B = a0.shape[0]

    # Tile-align the contact block: every _cost_terms call slices the row
    # axis at ns = neq+nf+nl, and TPU (8, 128) tiling makes a misaligned
    # major-axis slice a relayout copy — paid ~250x per substep through
    # the line-search scans.  Pad the scalar block to a multiple of 8 with
    # always-inactive limit rows (J = 0, D = 0: zero cost/grad/hessian).
    ns0 = efc.neq + efc.nf + efc.nl
    pad = (-ns0) % 8
    if pad:
        import dataclasses as _dc

        z = jnp.zeros((pad, B), dtype)
        ins = lambda a: jnp.concatenate([a[:ns0], z, a[ns0:]], axis=0)
        efc = _dc.replace(
            efc,
            J=[ins(Jv) for Jv in efc.J],
            aref=ins(efc.aref),
            D=ins(efc.D),
            R=jnp.concatenate(
                [efc.R[:ns0], jnp.ones((pad, B), dtype), efc.R[ns0:]], axis=0
            ),
            pos=ins(efc.pos),
            nl=efc.nl + pad,
        )

    a0l = [a0[:, i] for i in range(nv)]
    J = efc.J

    def jar_of(xs):
        return sum(J[v] * xs[v] for v in range(nv)) - efc.aref

    def total_cost(xs):
        jar = jar_of(xs)
        c, *_ = _cost_terms(efc, jar)
        dx = [xs[i] - a0l[i] for i in range(nv)]
        Mdx = _sym_matvec(qM, dx, nv)
        return c + 0.5 * sum(dx[i] * Mdx[i] for i in range(nv))

    if warmstart is None:
        x = list(a0l)
    else:
        wl = [warmstart[:, i] for i in range(nv)]
        cw = total_cost(wl)
        cs = total_cost(a0l)
        better = cw < cs
        x = [jnp.where(better, wl[i], a0l[i]) for i in range(nv)]

    f32 = dtype == jnp.float32
    tol = max(m.solver_tolerance, 64 * float(jnp.finfo(dtype).eps))
    import os as _os

    max_iters = (
        min(m.solver_iterations, int(_os.environ.get("GST_NEWTON", "10")))
        if f32 else m.solver_iterations
    )
    ls_len = int(_os.environ.get("GST_LS", "6")) if f32 else max(m.ls_iterations, 25)
    bracket_len = int(_os.environ.get("GST_BRACKET", "5")) if f32 else 16
    # fused whole-solve Pallas kernel (f32 throughput path): one HBM read
    # of J/D/aref per substep instead of one per line-search evaluation.
    # Default ON since round 5: on-chip quality probe at B=4096 shows the
    # fused and scan paths lane-for-lane equivalent (fused_minus_scan_p99
    # 0.004 qacc, equal niter; devtools/probe_solver_quality_r5.py), and
    # the bench ablation measured 75.7k -> 101.6k env-steps/s at K=16
    # (44.6k -> 77.5k at K=32).  GST_PALLAS_SOLVE=0 reverts to the scan
    # path (also used automatically for f64/parity and odd batch widths).
    if (
        f32
        and B % 128 == 0
        and _os.environ.get("GST_PALLAS_SOLVE", "1") == "1"
    ):
        return _solve_fused_pallas(
            m, qM, a0, efc, warmstart, max_iters, ls_len, bracket_len, tol
        )

    scale = 1.0 / (jnp.maximum(m.stat_meaninertia, MINVAL_) * max(1, nv))
    start = efc.neq + efc.nf + efc.nl

    def body(carry):
        xs, it, done, _ = carry
        jar = jar_of(xs)
        cost, gcon, H = _assemble(efc, jar, nv)
        dx = [xs[i] - a0l[i] for i in range(nv)]
        Mdx = _sym_matvec(qM, dx, nv)
        cost = cost + 0.5 * sum(dx[i] * Mdx[i] for i in range(nv))
        grad = [Mdx[i] + gcon[i] for i in range(nv)]
        Htot = [[None] * nv for _ in range(nv)]
        for i in range(nv):
            for j in range(i + 1):
                Htot[i][j] = qM[i][j] + H[i][j]
        L = _chol_lanes(Htot, nv, dtype)
        dirn = [-v for v in _chol_solve_lanes(L, grad, nv)]
        # Descent guard — see solver.py: a non-descending Cholesky
        # direction (near-singular Hessian at slipping impacts) zeroes the
        # line search and strands the solve above the optimum; fall back
        # to Jacobi-scaled steepest descent per lane.
        slope = sum(grad[i] * dirn[i] for i in range(nv))
        desc = slope < 0
        dirn = [
            jnp.where(
                desc, dirn[i],
                -grad[i] / jnp.maximum(Htot[i][i], MINVAL_),
            )
            for i in range(nv)
        ]

        djar = sum(J[v] * dirn[v] for v in range(nv))   # (NE, B)
        Md = _sym_matvec(qM, dirn, nv)
        c1 = sum(dirn[i] * Mdx[i] for i in range(nv))
        c2 = sum(dirn[i] * Md[i] for i in range(nv))
        dj_s = djar[:start]
        dj_c = djar[start:].reshape(-1, CDIM, B)

        def phi_d(alpha):                          # alpha (B,)
            jar_a = jar + alpha[None] * djar
            _, gs, hs, gc, D_c, cone = _cost_terms(efc, jar_a)
            d1 = (
                c1 + alpha * c2
                + jnp.sum(gs * dj_s, 0) + jnp.sum(gc * dj_c, (0, 1))
            )
            d2_s = jnp.sum(hs * dj_s * dj_s, 0)
            us = efc.con_uscale
            du = dj_c * us                         # (K, CDIM, B)
            d2_top = jnp.sum(cone["top"][:, None] * D_c * dj_c * dj_c, (0, 1))
            g_u = jnp.concatenate(
                [-jnp.ones_like(cone["w"])[:, None],
                 cone["mu"][:, None] * cone["uhat"]], axis=1,
            )
            gdot = jnp.sum(g_u * du, 1)            # (K, B)
            dut = du[:, 1:]
            uh = cone["uhat"]
            perp = dut - jnp.sum(dut * uh, 1, keepdims=True) * uh
            d2_mid = jnp.sum(
                cone["middle"] * cone["k"] * (
                    gdot * gdot
                    + cone["w"] * cone["mu"] / cone["T"]
                    * jnp.sum(perp * perp, 1)
                ), 0,
            )
            return d1, d2_s + d2_top + d2_mid

        def expand(carry, _):
            hi, ok = carry
            d1, _ = phi_d(hi)
            ok2 = d1 > 0
            hi2 = jnp.where(ok | ok2, hi, hi * 2.0)
            return (hi2, ok | ok2), None

        (hi, _), _ = jax.lax.scan(
            expand, (jnp.ones(B, dtype), jnp.zeros(B, bool)), None,
            length=bracket_len,
        )
        dhi, _ = phi_d(hi)
        dlo, _ = phi_d(jnp.zeros(B, dtype))

        def ls_body(carry, _):
            lo, hi, dlo, dhi = carry
            denom = dhi - dlo
            a_ = jnp.where(
                jnp.abs(denom) > MINVAL_,
                lo - dlo * (hi - lo) / jnp.where(jnp.abs(denom) > MINVAL_, denom, 1.0),
                0.5 * (lo + hi),
            )
            a_ = jnp.clip(a_, lo + 1e-14, hi - 1e-14)
            da, _ = phi_d(a_)
            neg = da < 0
            lo2 = jnp.where(neg, a_, lo)
            dlo2 = jnp.where(neg, da, 0.5 * dlo)
            hi2 = jnp.where(neg, hi, a_)
            dhi2 = jnp.where(neg, 0.5 * dhi, da)
            return (lo2, hi2, dlo2, dhi2), None

        (lo_f, hi_f, dlo_f, dhi_f), _ = jax.lax.scan(
            ls_body, (jnp.zeros(B, dtype), hi, dlo, dhi), None,
            length=ls_len,
        )
        denom = dhi_f - dlo_f
        alpha = jnp.where(
            jnp.abs(denom) > MINVAL_,
            lo_f - dlo_f * (hi_f - lo_f) / jnp.where(jnp.abs(denom) > MINVAL_, denom, 1.0),
            0.5 * (lo_f + hi_f),
        )
        alpha = jnp.where(dlo >= 0, 0.0, alpha)

        x_new = [xs[i] + alpha * dirn[i] for i in range(nv)]
        cost_new = total_cost(x_new)
        improvement = (cost - cost_new) * scale
        gradnorm = jnp.sqrt(sum(g * g for g in grad)) * scale
        done_new = (improvement < tol) | (gradnorm < tol)
        keep = cost_new < cost
        x_out = [jnp.where(keep, x_new[i], xs[i]) for i in range(nv)]
        return x_out, it + 1, done | done_new, cost_new

    def masked_body(carry):
        xs, it, done, cost = carry
        xs2, it2, done2, cost2 = body((xs, it, done, cost))
        return (
            [jnp.where(done, xs[i], xs2[i]) for i in range(len(xs))],
            jnp.where(done, it, it2),
            done2 | done,
            jnp.where(done, cost, cost2),
        )

    carry0 = (
        x, jnp.zeros(B, jnp.int32), jnp.zeros(B, bool),
        jnp.full((B,), jnp.inf, dtype),
    )
    if f32:
        # fixed-length masked scan (see solver.py: dynamic while trip counts
        # are a measured pathology on the tunneled runtime)
        def scan_body(carry, _):
            return masked_body(carry), None

        (x, niter, _, _), _ = jax.lax.scan(
            scan_body, carry0, None, length=max_iters
        )
    else:
        # f64 parity path: iterate until every lane converges; frozen lanes
        # don't move, so each lane exits exactly like the single-env
        # while_loop in solver.solve
        def cond(carry):
            _, it, done, _ = carry
            return jnp.any(~done & (it < max_iters))

        x, niter, _, _ = jax.lax.while_loop(cond, masked_body, carry0)

    jar = jar_of(x)
    _, grad_s, _, grad_c, _, _ = _cost_terms(efc, jar)
    force = jnp.concatenate([grad_s, grad_c.reshape(-1, B)])
    qfrc = [-jnp.sum(J[v] * force, axis=0) for v in range(nv)]
    return jnp.stack(x, axis=-1), jnp.stack(qfrc, axis=-1), niter
