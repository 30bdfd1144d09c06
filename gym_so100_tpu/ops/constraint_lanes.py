"""Batch-last (lanes) constraint assembly — the TPU throughput form.

`constraint.make_efc` under vmap is layout-poisoned on TPU: point_jacobians
materializes (B, K, nv, 3) crosses and the frame einsums contract over a
minor dim of 3, so every intermediate pads its last dims to (8, 128) tiles
at ~2% utilization.  Measured on-chip at B=4096 hulls-on it is ~255 ms of
the 465 ms control step — the dominant stage after the collision lanes
rewrite.  (A first attempt that assembled lanes internally but emitted the
batch-first (B, NE, nv) Efc measured SLOWER — the final transpose is a
strided relayout and the nv=12-minor J pads 10.7x for every downstream
solver read — hence EfcLanes + solver_lanes keep lanes form end-to-end.)

Every per-contact scalar component is held as a (K, B) lane array (B
minor, fully utilized 8x128 tiles, unrolled Python loops over the 3
spatial components and the nv=12 dofs).  The contact Jacobian simplifies
because both bodies share the contact point:

    J_row[v] = dir . (lin_v + ang_v x off) * (mask2[v] - mask1[v])

so one combined ancestor-mask difference per dof replaces the two masked
point Jacobians.  Scalar rows (friction loss, joint limits) are static
one-hot patterns; equality rows (EE scenes only) reuse
constraint.equality_rows under vmap.

Row order and numeric conventions are identical to make_efc
(tests/test_efc_lanes.py asserts vmap(make_efc) equality to roundoff);
replaces the constraint-assembly stage of the reference's mj_step hot loop
(/root/reference/gym_so100/env.py step -> mj_makeConstraint).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import JNT_HINGE, Contact, Data, Model, State
from .constraint import (
    CDIM,
    MINVAL,
    Efc,
    equality_rows,
    impedance,
    impedance_comps,
    kb,
    kb_comps,
)


@dataclass(frozen=True)
class EfcLanes:
    """Constraint rows in batch-last lanes form (env batch minor).

    J is a list of nv (NE, B) arrays — one per dof — so the Hessian gram
    never slices a tile-sparse minor dim.  Scalar-row class structure is
    STATIC: rows [0:neq] equality, [neq:neq+nf] friction loss,
    [neq+nf:neq+nf+nl] limits, the rest K x CDIM contact blocks."""

    J: list                 # nv x (NE, B)
    aref: jnp.ndarray       # (NE, B)
    D: jnp.ndarray          # (NE, B)
    R: jnp.ndarray          # (NE, B)
    pos: jnp.ndarray        # (NE, B)
    floss: jnp.ndarray      # (nf, B) frictionloss magnitudes
    con_mu: jnp.ndarray     # (K, B)
    con_uscale: jnp.ndarray  # (K, CDIM, B)
    con_active: jnp.ndarray  # (K, B) bool
    con_Dn: jnp.ndarray      # (K, B)
    neq: int = 0
    nf: int = 0
    nl: int = 0


jax.tree_util.register_dataclass(
    EfcLanes,
    data_fields=[
        "J", "aref", "D", "R", "pos", "floss",
        "con_mu", "con_uscale", "con_active", "con_Dn",
    ],
    meta_fields=["neq", "nf", "nl"],
)


def make_efc_lanes(m: Model, d: Data, s: State, con: Contact) -> EfcLanes:
    """Batched make_efc from a batch-first Contact: converts to lanes form
    first (compat entry for tests/the f64 pipeline)."""
    from .collision.narrowphase import contact_to_lanes

    return make_efc_from_lanes(m, d, s, contact_to_lanes(m, con))


def make_efc_from_lanes(m: Model, d: Data, s: State, cl) -> EfcLanes:
    """Batched make_efc in lanes form: d/s carry a leading env axis B, the
    contact buffer arrives as ContactLanes (fields already (K, B)) and the
    result's arrays are batch-LAST.  Feed to solver_lanes.solve_lanes."""
    dtype = s.qpos.dtype
    nv = m.nv
    B = s.qpos.shape[0]
    K = cl.dist.shape[0]

    Jv = [[] for _ in range(nv)]   # per-dof row blocks, each (n, B)
    arefs, Ds, Rs, poss = [], [], [], []

    # ---- equality rows: vmapped AoS (absent on the training scenes) ----
    neqr = len(m.eq_site1) * 6 + len(m.eq_jnt_q1)
    if neqr:
        blocks = jax.vmap(lambda d1, s1: equality_rows(m, d1, s1))(d, s)
        for J, aref, D, R, pos in blocks:
            for v in range(nv):
                Jv[v].append(J[..., v].T)
            arefs.append(aref.T)
            Ds.append(D.T)
            Rs.append(R.T)
            poss.append(pos.T)

    # ---- dof friction loss rows (static one-hot J, per-dof constants) ----
    fl_dofs = m.fl_dofs
    nf = len(fl_dofs)
    if nf:
        ids = jnp.asarray(fl_dofs)
        onehot = np.zeros((nf, nv), np.float64)
        onehot[np.arange(nf), np.asarray(fl_dofs)] = 1.0
        imp = impedance(m.dof_solimp[ids], jnp.zeros(nf, dtype))
        Kk, Bk = kb(m.dof_solref[ids], m.dof_solimp[ids][:, 1])
        vel = s.qvel[:, ids]                       # (B, nf)
        aref = (-Bk[None] * vel).astype(dtype)
        R = jnp.maximum(MINVAL, (1 - imp) / imp * m.dof_invweight0[ids])
        for v in range(nv):
            Jv[v].append(
                jnp.broadcast_to(
                    jnp.asarray(onehot[:, v, None], dtype), (nf, B)
                )
            )
        arefs.append(aref.T)
        Ds.append(jnp.broadcast_to((1.0 / R)[:, None], (nf, B)).astype(dtype))
        Rs.append(jnp.broadcast_to(R[:, None], (nf, B)).astype(dtype))
        poss.append(jnp.zeros((nf, B), dtype))
        floss = jnp.broadcast_to(
            m.dof_frictionloss[ids][:, None], (nf, B)
        ).astype(dtype)
    else:
        floss = jnp.zeros((0, B), dtype)

    # ---- joint limit rows ----
    lim_jnts = tuple(
        j for j in range(len(m.jnt_type))
        if m.jnt_limited[j] and m.jnt_type[j] == JNT_HINGE
    )
    nl = len(lim_jnts)
    if nl:
        jids = jnp.asarray(lim_jnts)
        qadr = jnp.asarray([m.jnt_qposadr[j] for j in lim_jnts])
        vadr = [m.jnt_dofadr[j] for j in lim_jnts]
        q = s.qpos[:, qadr].T                      # (nl, B)
        lo = m.jnt_range[jids, 0][:, None]
        hi = m.jnt_range[jids, 1][:, None]
        dist_lo = q - lo
        dist_hi = hi - q
        use_lo = dist_lo < dist_hi
        dist = jnp.where(use_lo, dist_lo, dist_hi).astype(dtype)
        sign = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
        for v in range(nv):
            hit = np.asarray([1.0 if vadr[i] == v else 0.0 for i in range(nl)])
            Jv[v].append(sign * jnp.asarray(hit[:, None], dtype))
        active = dist < 0
        # (nl, 1, 5) solimp broadcasts against (nl, B) pos inside impedance
        imp = impedance(m.jnt_solimp[jids][:, None, :], dist)
        Kk, Bk = kb(m.jnt_solref[jids], m.jnt_solimp[jids][:, 1])
        vel = sign * s.qvel[:, jnp.asarray(vadr)].T
        aref = (-Bk[:, None] * vel - Kk[:, None] * imp * dist).astype(dtype)
        R = jnp.maximum(
            MINVAL,
            (1 - imp) / imp * m.dof_invweight0[jnp.asarray(vadr)][:, None],
        )
        arefs.append(aref)
        Ds.append(jnp.where(active, 1.0 / R, 0.0).astype(dtype))
        Rs.append(R.astype(dtype))
        poss.append(dist)

    # ---- contact rows: lanes form (ContactLanes components are (K, B)) ----
    dist = cl.dist                                 # (K, B)
    px, py, pz = cl.pos
    fr = cl.frame

    cd = jnp.moveaxis(d.cdof, 0, -1)               # (nv, 6, B)
    ang = [[cd[v, c] for c in range(3)] for v in range(nv)]
    lin = [[cd[v, 3 + c] for c in range(3)] for v in range(nv)]
    com = d.subtree_com[:, 0]                      # (B, 3) root com
    off = [px - com[:, 0], py - com[:, 1], pz - com[:, 2]]

    # precomputed by the narrowphase (one-hot selected static table — no
    # (K, B)-indexed gather; PERF_NOTES "round 3")
    dmk = list(cl.dof_dmask)

    Jrows = [[None] * nv for _ in range(CDIM)]     # [row][v] -> (K, B)
    for v in range(nv):
        ax, ay, az = ang[v]
        lx, ly, lz = lin[v]
        wx = lx + ay * off[2] - az * off[1]
        wy = ly + az * off[0] - ax * off[2]
        wz = lz + ax * off[1] - ay * off[0]
        mk = dmk[v]
        Jrows[0][v] = (fr[0][0] * wx + fr[0][1] * wy + fr[0][2] * wz) * mk
        Jrows[1][v] = (fr[1][0] * wx + fr[1][1] * wy + fr[1][2] * wz) * mk
        Jrows[2][v] = (fr[2][0] * wx + fr[2][1] * wy + fr[2][2] * wz) * mk
        Jrows[3][v] = (fr[0][0] * ax + fr[0][1] * ay + fr[0][2] * az) * mk

    qv = [s.qvel[:, v] for v in range(nv)]
    vel = [sum(Jrows[r][v] * qv[v] for v in range(nv)) for r in range(CDIM)]

    imp = impedance_comps(*cl.solimp, dist)        # (K, B)
    Kk, Bk = kb_comps(cl.solref0, cl.solref1, cl.solimp[1])
    aref = [
        -Bk * vel[0] - Kk * imp * dist,
        -Bk * vel[1],
        -Bk * vel[2],
        -Bk * vel[3],
    ]

    diag = cl.invw_diag
    Rn = jnp.maximum(MINVAL, (1 - imp) / imp * diag)
    Dn = 1.0 / Rn
    ip = jnp.asarray(m.impratio, dtype)
    fric0 = cl.friction0
    fric1 = cl.friction1
    mu0 = jnp.maximum(fric0, MINVAL)
    has_tor = cl.condim >= 4
    mus = [fric0, fric0, jnp.where(has_tor, fric1, 0.0)]
    Drows = [Dn] + [Dn * ip * (mu / mu0) ** 2 for mu in mus]
    active = cl.active & (dist < 0)
    Drows = [Dr * active for Dr in Drows]
    mu = fric0 / jnp.sqrt(ip)
    uscale = [jnp.ones_like(fric0)] + [mu_ * jnp.sqrt(ip) / mu0 for mu_ in mus]

    # contact blocks -> (K*CDIM, B), slot-major row-minor
    for v in range(nv):
        Jv[v].append(
            jnp.stack([Jrows[r][v] for r in range(CDIM)], axis=1).reshape(
                K * CDIM, B
            )
        )
    tocon = lambda rows: jnp.stack(rows, axis=1).reshape(K * CDIM, B)
    arefs.append(tocon(aref))
    Ds.append(tocon(Drows))
    Rs.append(tocon([Rn] * CDIM))
    zero = jnp.zeros_like(dist)
    poss.append(tocon([dist, zero, zero, zero]))

    return EfcLanes(
        J=[jnp.concatenate(Jv[v], axis=0) for v in range(nv)],
        aref=jnp.concatenate(arefs, axis=0),
        D=jnp.concatenate(Ds, axis=0),
        R=jnp.concatenate(Rs, axis=0),
        pos=jnp.concatenate(poss, axis=0),
        floss=floss,
        con_mu=mu,
        con_uscale=jnp.stack(uscale, axis=1),      # (K, CDIM, B)
        con_active=active,
        con_Dn=Dn * active,
        neq=neqr,
        nf=nf,
        nl=nl,
    )


def make_efc_batched(m: Model, d: Data, s: State, con: Contact) -> Efc:
    """Batch-first Efc (leaves (B, ...)) assembled via the lanes path —
    transposition-heavy, so for tests/compat only; the throughput pipeline
    consumes EfcLanes directly."""
    el = make_efc_lanes(m, d, s, con)
    B = s.qpos.shape[0]
    NE = el.aref.shape[0]
    start = el.neq + el.nf + el.nl
    J = jnp.moveaxis(jnp.stack(el.J, axis=1), -1, 0)   # (B, NE, nv)
    isf = np.zeros(NE, bool)
    isf[el.neq:el.neq + el.nf] = True
    isl = np.zeros(NE, bool)
    isl[el.neq + el.nf:start] = True
    floss = jnp.zeros((B, NE), el.aref.dtype)
    if el.nf:
        floss = floss.at[:, el.neq:el.neq + el.nf].set(el.floss.T)
    return Efc(
        J=J,
        aref=el.aref.T,
        D=el.D.T,
        R=el.R.T,
        pos=el.pos.T,
        floss=floss,
        is_floss=jnp.broadcast_to(jnp.asarray(isf)[None], (B, NE)),
        is_limit=jnp.broadcast_to(jnp.asarray(isl)[None], (B, NE)),
        con_mu=el.con_mu.T,
        con_uscale=jnp.transpose(el.con_uscale, (2, 0, 1)),
        con_active=el.con_active.T,
        con_Dn=el.con_Dn.T,
        neq=el.neq,
        nf=el.nf,
        nl=el.nl,
    )
