"""Newton constraint solver (elliptic friction cones, exact Hessian).

Minimizes the MuJoCo constraint optimization problem over qacc:

    f(x) = 0.5 (x - a0)' M (x - a0) + sum_i s_i(J x - aref)

with per-row costs: Huber for dof friction loss, one-sided quadratic for
joint limits, and the circular-cone cost (in scaled coordinates, see
constraint.py) for elliptic contacts:

    bottom (mu*T <= u_n):          s = 0
    top    (T <= -mu*u_n):         s = 0.5 sum_i D_i jar_i^2
    middle (else):                 s = 0.5 Dn/(1+mu^2) (mu*T - u_n)^2

where u = uscale * jar, u_n = u[0], T = ||u[1:]||.  Analytic gradient and
exact Hessian (including the cone curvature term), Cholesky direction, exact
line search by safeguarded 1-D Newton on the convex merit derivative, and
MuJoCo-style warmstart (start from the better of qacc_warmstart and
qacc_smooth).  Replaces the solver stage of the reference's mj_step hot loop
(/root/reference/gym_so100/env.py step path); all static shapes, vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import Data, Model
from . import linalg
from .constraint import CDIM, Efc


def _weighted_gram(U, V, w):
    """sum_r w_r U_r V_r^T for U, V (..., R, n), w (..., R) -> (..., n, n).

    Written as broadcast-multiply + reduction over the row axis: the
    equivalent batched (n, R) @ (R, n) matmul pads n=12 to MXU 128-tiles
    under vmap (<1% utilization) and measured 2x SLOWER than this fused VPU
    form at B=4096 (85 vs 43 ms per 20-iteration solve) — tiny batched
    matmuls do not amortize MXU tiling on this scene.
    """
    return jnp.sum(
        (w[..., None] * U)[..., :, None] * V[..., None, :], axis=-3
    )


def _contact_blocks(efc: Efc):
    """Reshape the contact portion of jar-level arrays to (K, CDIM)."""
    start = efc.neq + efc.nf + efc.nl

    def split(a):
        return a[..., :start], a[..., start:].reshape(*a.shape[:-1], -1, CDIM)

    return split


def _cost_terms(efc: Efc, jar):
    """Total constraint cost, per-row dcost/djar and block Hessian info.

    Returns (cost, grad_rows (NE,), diagH (NE,), cone data for Hessian).
    """
    split = _contact_blocks(efc)
    jar_s, jar_c = split(jar)
    D_s, D_c = split(efc.D)
    R_s, _ = split(efc.R)
    fl_s, _ = split(efc.floss)
    isf, _ = split(efc.is_floss)

    # --- scalar rows (friction loss + limits) ---
    # friction loss: Huber
    lim = fl_s * R_s
    quad_f = jnp.abs(jar_s) <= lim
    cost_f = jnp.where(
        quad_f, 0.5 * D_s * jar_s**2, fl_s * jnp.abs(jar_s) - 0.5 * fl_s * lim
    )
    grad_f = jnp.where(quad_f, D_s * jar_s, fl_s * jnp.sign(jar_s))
    hess_f = jnp.where(quad_f, D_s, 0.0)
    # limits (one-sided, active only when jar < 0; D already gated by pos<0)
    act_l = jar_s < 0
    cost_l = jnp.where(act_l, 0.5 * D_s * jar_s**2, 0.0)
    grad_l = jnp.where(act_l, D_s * jar_s, 0.0)
    hess_l = jnp.where(act_l, D_s, 0.0)

    # equality rows (neither mask): always-active quadratic
    isl, _ = split(efc.is_limit)
    iseq = ~(isf | isl)
    cost_q = 0.5 * D_s * jar_s**2
    cost_s = jnp.where(isf, cost_f, jnp.where(iseq, cost_q, cost_l))
    grad_s = jnp.where(isf, grad_f, jnp.where(iseq, D_s * jar_s, grad_l))
    hess_s = jnp.where(isf, hess_f, jnp.where(iseq, D_s, hess_l))

    # --- contact cones ---
    u = jar_c * efc.con_uscale  # (K, CDIM)
    un = u[..., 0]
    ut = u[..., 1:]
    Traw = jnp.sqrt(jnp.sum(ut * ut, -1))
    # guarded T for divisions: when T ~ 0 the middle zone has measure zero,
    # so the guarded value only ever multiplies a zero mask — but it must
    # never produce NaN (0 * NaN = NaN would poison masked arithmetic,
    # which is exactly what broke float32)
    T = jnp.maximum(Traw, jnp.asarray(1e-30, jar.dtype))
    mu = efc.con_mu
    Dn = efc.con_Dn
    bottom = mu * Traw <= un
    top = Traw <= -mu * un
    middle = ~(bottom | top) & (Dn > 0)
    top = top & (Dn > 0)

    w = mu * Traw - un
    k = Dn / (1 + mu * mu)
    cost_c = jnp.where(top, 0.5 * jnp.sum(D_c * jar_c**2, -1), 0.0) + jnp.where(
        middle, 0.5 * k * w * w, 0.0
    )
    # gradient wrt jar rows
    uhat = ut / T[..., None]
    g_mid_u = jnp.concatenate(
        [-jnp.ones_like(un)[..., None], mu[..., None] * uhat], -1
    )  # dw/du
    grad_c = (
        top[..., None] * D_c * jar_c
        + middle[..., None] * (k * w)[..., None] * g_mid_u * efc.con_uscale
    )

    cost = jnp.sum(cost_s) + jnp.sum(cost_c)
    cone = dict(middle=middle, top=top, k=k, w=w, mu=mu, uhat=uhat, T=T)
    return cost, grad_s, hess_s, grad_c, D_c, cone


def _assemble(efc: Efc, M, jar):
    """cost, gradient contribution J'g, Hessian J'HJ (nv x nv)."""
    cost, grad_s, hess_s, grad_c, D_c, cone = _cost_terms(efc, jar)
    start = efc.neq + efc.nf + efc.nl
    Js = efc.J[:start]
    Jc = efc.J[start:].reshape(-1, CDIM, efc.J.shape[-1])  # (K, CDIM, nv)

    grad = linalg.matvec_t(Js, grad_s) + jnp.sum(
        Jc * grad_c[..., None], axis=(0, 1)
    )

    # scalar rows + contact top zone: diagonal row weights -> one fused gram
    # over all rows (top-zone weight on the flattened contact block)
    w_top = (cone["top"][..., None] * D_c).reshape(-1)
    w_diag = jnp.concatenate([hess_s, w_top])
    H = _weighted_gram(efc.J, efc.J, w_diag)
    # contact middle zone: k * (g g' + w * mu * H_T) in u-space, mapped to jar
    us = efc.con_uscale
    g_u = jnp.concatenate(
        [-jnp.ones_like(cone["w"])[..., None], cone["mu"][..., None] * cone["uhat"]],
        -1,
    ) * us  # dw/djar rows
    mid = cone["middle"]
    kk = cone["k"] * mid
    # a_k = sum_r g_u[k, r] Jc[k, r, :]; Hgg = sum_k kk_k a_k a_k^T
    a = jnp.sum(g_u[..., None] * Jc, axis=-2)  # (K, nv)
    Hgg = _weighted_gram(a, a, kk)
    # curvature of T: (I - uhat uhat')/T in tangential coords
    uh = cone["uhat"]
    PT = (
        jnp.eye(CDIM - 1, dtype=jar.dtype)[None]
        - uh[..., :, None] * uh[..., None, :]
    ) / cone["T"][..., None, None]
    # scale to jar coords and weight
    wmu = kk * cone["w"] * cone["mu"]
    St = us[..., 1:]
    PTs = St[..., :, None] * PT * St[..., None, :]
    Jt = Jc[:, 1:, :]
    # B_ki = sum_j PTs[k, i, j] Jt[k, j, :]; Hcurv = sum_{k,i} wmu_k Jt_ki B_ki
    Bm = jnp.sum(PTs[..., None] * Jt[..., None, :, :], axis=-2)  # (K, 3, nv)
    Hcurv = _weighted_gram(
        Jt.reshape(-1, Jt.shape[-1]),
        Bm.reshape(-1, Bm.shape[-1]),
        jnp.repeat(wmu, CDIM - 1),
    )

    H = H + Hgg + Hcurv
    return cost, grad, H


def solve(m: Model, d: Data, efc: Efc, warmstart=None):
    """Newton solve for qacc.  Returns (qacc, qfrc_constraint, efc_force,
    niter)."""
    dtype = d.qacc_smooth.dtype
    M = d.qM
    a0 = d.qacc_smooth
    nv = m.nv

    def total_cost(x):
        jar = linalg.matvec(efc.J, x) - efc.aref
        c, *_ = _cost_terms(efc, jar)
        dx = x - a0
        return 0.5 * linalg.dot(dx, linalg.matvec(M, dx)) + c

    # warmstart: better of warmstart and qacc_smooth (MuJoCo mj_warmstart)
    if warmstart is None:
        x = a0
    else:
        cw = total_cost(warmstart)
        cs = total_cost(a0)
        x = jnp.where(cw < cs, warmstart, a0)

    # dtype-aware termination: the model's tolerance (default 1e-8) is below
    # float32 resolution — without this floor the solver burns its full
    # iteration budget every substep in the f32 throughput path
    f32 = dtype == jnp.float32
    tol = max(m.solver_tolerance, 64 * float(jnp.finfo(dtype).eps))
    # f32 budget: the masked scan always runs max_iters, at ~1 ms/iteration
    # (B=4096) dominated by the Hessian gram — 12 covers the observed
    # converged-iteration distribution (mean 9.4, warmstarted steady state)
    # while halving solver cost vs 20; line-search length is measured
    # cost-neutral, kept at MuJoCo-like depth
    # 10/6/5 budget measured on-chip at B=4096 K=16 (devtools/
    # probe_niter_r4.py + the r4 quality probe): converged-iteration
    # distribution mean 3.2 / p99 9 / max 12, and the 10/6/5 solution's
    # p99 |qacc| error vs a 40/25/10 reference solve is ~1e-7 relative —
    # indistinguishable from the old 12/13/8 budget at 78%% of the cost
    max_iters = min(m.solver_iterations, 10) if f32 else m.solver_iterations
    ls_len = 6 if f32 else max(m.ls_iterations, 25)
    bracket_len = 5 if f32 else 16
    # devtools override hooks (budget-sweep probes)
    if _OVR_MAXIT[0]:
        max_iters = _OVR_MAXIT[0]
    if _OVR_LS[0]:
        ls_len = _OVR_LS[0]
    if _OVR_BRACKET[0]:
        bracket_len = _OVR_BRACKET[0]
    scale = 1.0 / (jnp.maximum(m.stat_meaninertia, MINVAL_) * max(1, nv))

    def body(carry):
        x, it, done, _ = carry
        jar = linalg.matvec(efc.J, x) - efc.aref
        cost, gcon, H = _assemble(efc, M, jar)
        dx = x - a0
        Mdx = linalg.matvec(M, dx)
        cost = cost + 0.5 * linalg.dot(dx, Mdx)  # full objective incl. smooth
        grad = Mdx + gcon
        Htot = M + H
        L = linalg.chol_factor(Htot, eps=1e-12)
        dirn = -linalg.chol_solve(L, grad)
        # Descent guard: at ill-conditioned states (near-singular Hessian
        # during slipping impacts) roundoff in the Cholesky direction can
        # make phi'(0) >= 0, which zeroes the line search and trips the
        # improvement-based stop at a point measured 6.5% ABOVE the true
        # optimum (devtools/probe_impact_knife.py; PARITY_NOTES.md).  Fall
        # back to Jacobi-scaled steepest descent, which always descends
        # while the gradient is nonzero.
        slope = linalg.dot(grad, dirn)
        sd = -grad / jnp.maximum(jnp.diagonal(Htot), MINVAL_)
        dirn = jnp.where(slope < 0, dirn, sd)

        # exact line search: 1-D Newton on phi'(alpha), phi convex
        djar = linalg.matvec(efc.J, dirn)
        Md = linalg.matvec(M, dirn)
        c1 = linalg.dot(dirn, Mdx)
        c2 = linalg.dot(dirn, Md)

        def phi_d(alpha):
            jar_a = jar + alpha * djar
            _, gs, hs, gc, D_c, cone = _cost_terms(efc, jar_a)
            split = _contact_blocks(efc)
            dj_s, dj_c = split(djar)
            d1 = c1 + alpha * c2 + jnp.sum(gs * dj_s) + jnp.sum(gc * dj_c)
            # second derivative: scalar rows + cone zones
            d2_s = jnp.sum(hs * dj_s * dj_s)
            us = efc.con_uscale
            du = dj_c * us
            # top zone: sum D dj^2
            d2_top = jnp.sum(
                cone["top"][..., None] * D_c * dj_c * dj_c
            )
            # middle: k*(g.du)^2 + k*w*mu*du_t' P du_t
            g_u = jnp.concatenate(
                [-jnp.ones_like(cone["w"])[..., None],
                 cone["mu"][..., None] * cone["uhat"]], -1,
            )
            gdot = jnp.sum(g_u * du, -1)
            dut = du[..., 1:]
            uh = cone["uhat"]
            perp = dut - jnp.sum(dut * uh, -1, keepdims=True) * uh
            d2_mid = jnp.sum(
                cone["middle"] * cone["k"] * (
                    gdot**2
                    + cone["w"] * cone["mu"] / cone["T"] * jnp.sum(perp * perp, -1)
                )
            )
            return d1, d2_s + d2_top + d2_mid

        # initial bracket: expand hi until phi'(hi) > 0 (phi is convex, so
        # phi' is nondecreasing; phi'(0) < 0 along a descent direction)
        def expand(carry, _):
            hi, ok = carry
            d1, _ = phi_d(hi)
            ok2 = d1 > 0
            hi2 = jnp.where(ok | ok2, hi, hi * 2.0)
            return (hi2, ok | ok2), None

        (hi, bracketed), _ = jax.lax.scan(
            expand, (jnp.asarray(1.0, dtype), jnp.bool_(False)), None,
            length=bracket_len,
        )
        dhi, _ = phi_d(hi)
        dlo, _ = phi_d(jnp.zeros((), dtype))

        # Illinois regula-falsi on the monotone phi' over [lo, hi]
        def ls_body(carry, _):
            lo, hi, dlo, dhi = carry
            denom = dhi - dlo
            a = jnp.where(
                jnp.abs(denom) > MINVAL_,
                lo - dlo * (hi - lo) / jnp.where(jnp.abs(denom) > MINVAL_, denom, 1.0),
                0.5 * (lo + hi),
            )
            a = jnp.clip(a, lo + 1e-14, hi - 1e-14)
            da, _ = phi_d(a)
            neg = da < 0
            # Illinois: halve the stale endpoint's derivative to avoid stalling
            lo2 = jnp.where(neg, a, lo)
            dlo2 = jnp.where(neg, da, 0.5 * dlo)
            hi2 = jnp.where(neg, hi, a)
            dhi2 = jnp.where(neg, 0.5 * dhi, da)
            return (lo2, hi2, dlo2, dhi2), None

        (lo_f, hi_f, dlo_f, dhi_f), _ = jax.lax.scan(
            ls_body,
            (jnp.zeros((), dtype), hi, dlo, dhi),
            None,
            length=ls_len,
        )
        denom = dhi_f - dlo_f
        alpha = jnp.where(
            jnp.abs(denom) > MINVAL_,
            lo_f - dlo_f * (hi_f - lo_f) / jnp.where(jnp.abs(denom) > MINVAL_, denom, 1.0),
            0.5 * (lo_f + hi_f),
        )
        # if phi'(0) >= 0 the current point is already optimal along dirn
        alpha = jnp.where(dlo >= 0, 0.0, alpha)

        x_new = x + alpha * dirn
        cost_new = total_cost(x_new)
        improvement = (cost - cost_new) * scale
        gradnorm = jnp.linalg.norm(grad) * scale
        done_new = (improvement < tol) | (gradnorm < tol)
        x_out = jnp.where(cost_new < cost, x_new, x)
        return x_out, it + 1, done | done_new, cost_new

    carry0 = (x, jnp.int32(0), jnp.bool_(False), jnp.asarray(jnp.inf, dtype))
    if f32:
        # throughput path: fixed-length scan with a per-lane freeze mask.
        # A while_loop's dynamic trip count re-dispatches the body's kernels
        # every iteration and, under vmap, runs to the slowest lane anyway;
        # the masked scan compiles to one unrolled-schedule loop.  niter
        # counts non-frozen iterations so diagnostics stay meaningful.
        def scan_body(carry, _):
            x, it, done, cost = carry
            x2, it2, done2, cost2 = body((x, it, done, cost))
            new = (
                jnp.where(done, x, x2),
                jnp.where(done, it, it2),
                done2 | done,
                jnp.where(done, cost, cost2),
            )
            return new, None

        (x, niter, _, _), _ = jax.lax.scan(
            scan_body, carry0, None, length=max_iters
        )
    else:

        def cond(carry):
            _, it, done, _ = carry
            return (~done) & (it < max_iters)

        x, niter, _, _ = jax.lax.while_loop(cond, body, carry0)

    # final forces
    jar = linalg.matvec(efc.J, x) - efc.aref
    _, grad_s, _, grad_c, _, _ = _cost_terms(efc, jar)
    start = efc.neq + efc.nf + efc.nl
    force = -jnp.concatenate([grad_s, grad_c.reshape(-1)])
    qfrc = linalg.matvec_t(efc.J, force)
    return x, qfrc, force, niter


MINVAL_ = 1e-15

# devtools budget-override hooks (None = use defaults); see
# devtools/probe_solver2.py
_OVR_MAXIT = [None]
_OVR_LS = [None]
_OVR_BRACKET = [None]
