"""Constraint assembly: efc rows for friction loss, joint limits, contacts.

Re-creates MuJoCo's constraint model (mj_makeConstraint / mj_makeImpedance)
as a static-shape pure function.  Row layout is fixed at trace time:

  [ dof friction-loss rows | joint-limit rows | contact rows (K slots x CDIM) ]

Every slot always exists; inactive rows are masked (D = 0).  The numeric
conventions were validated row-by-row against mjData.efc_* of MuJoCo 3.10 on
the reference scene (tests/test_oracle_weld.py pins efc_pos/efc_D/efc_J rows
bitwise; tests/test_oracle_contact.py pins solved trajectories through them):

* impedance: sigmoid interpolation of solimp=(d0,dwidth,width,mid,power),
  clamped to [0.0001, 0.9999];
* K = 1/(dmax^2 tc^2 zeta^2), B = 2/(dmax tc) for solref=(tc,zeta) > 0,
  direct (negative) solref: K = -solref0/dmax^2, B = -solref1/dmax;
* aref = -B*vel - K*imp*pos;
* R = max(mjMINVAL, (1-imp)/imp * diagApprox), D = 1/R;
* elliptic cone: friction row i gets D_i = D_normal * impratio*(mu_i/mu_0)^2,
  and the solver sees a *circular* cone with mu = mu_0/sqrt(impratio) in
  scaled coordinates u_i = jar_i * mu_i * sqrt(impratio)/mu_0 (this is how
  `impratio=10` of the reference arm model, so_arm100.xml:4, enters).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.scene import JNT_FREE, JNT_HINGE, Contact, Data, Model, State

MINVAL = 1e-15
MINIMP = 0.0001
MAXIMP = 0.9999
CDIM = 4  # contact rows per slot (normal + 2 tangent + torsion; condim<=4)


@dataclass(frozen=True)
class Efc:
    """Assembled constraint rows (static shapes)."""

    J: jnp.ndarray        # (NE, nv)
    aref: jnp.ndarray     # (NE,)
    D: jnp.ndarray        # (NE,) inverse regularization (0 = inactive row)
    R: jnp.ndarray        # (NE,)
    pos: jnp.ndarray      # (NE,) constraint violation (contacts: dist)
    floss: jnp.ndarray    # (NE,) frictionloss (friction rows only)
    # per-row class masks (scalar block = [equality | frictionloss | limits];
    # a scalar row with neither mask set is an equality row)
    is_floss: jnp.ndarray   # (NE,) bool
    is_limit: jnp.ndarray   # (NE,) bool
    # contact structure: rows [neq+nf+nl : ... + K*CDIM] in K blocks of CDIM
    con_mu: jnp.ndarray     # (K,) circular-cone friction mu0/sqrt(impratio)
    con_uscale: jnp.ndarray  # (K, CDIM) jar -> u scaling (row 0 = 1)
    con_active: jnp.ndarray  # (K,) bool
    con_Dn: jnp.ndarray      # (K,) normal-row D
    neq: int = 0            # total equality ROWS (6 per weld + 1 per joint eq)
    nf: int = 0
    nl: int = 0


jax.tree_util.register_dataclass(
    Efc,
    data_fields=[
        "J", "aref", "D", "R", "pos", "floss", "is_floss", "is_limit",
        "con_mu", "con_uscale", "con_active", "con_Dn",
    ],
    meta_fields=["neq", "nf", "nl"],
)


def impedance_comps(d0, dw, width, mid, power, pos):
    """MuJoCo constraint impedance d(pos), unpacked solimp components."""
    # endpoints are clamped to [MINIMP, MAXIMP] *before* interpolation
    # (calibrated against mjData.efc_KBIP: imp = clamp(d0) + y*(clamp(dw) -
    # clamp(d0)), with no final clamp)
    d0 = jnp.clip(d0, MINIMP, MAXIMP)
    dw = jnp.clip(dw, MINIMP, MAXIMP)
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, MINVAL), 0.0, 1.0)
    pw = jnp.maximum(power, 1.0)
    a = 1.0 / jnp.maximum(mid, MINVAL) ** (pw - 1)
    b = 1.0 / jnp.maximum(1 - mid, MINVAL) ** (pw - 1)
    y = jnp.where(x <= mid, a * x**pw, 1 - b * (1 - x) ** pw)
    return d0 + y * (dw - d0)


def impedance(solimp, pos):
    """MuJoCo constraint impedance d(pos) from solimp (components last)."""
    return impedance_comps(
        solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3],
        solimp[..., 4], pos,
    )


def kb_comps(tc, dr, dmax):
    """Stiffness/damping (K, B) from unpacked solref given max impedance."""
    std = tc > 0
    K_std = 1.0 / jnp.maximum(
        (dmax * tc * dr) ** 2, MINVAL
    )
    B_std = 2.0 / jnp.maximum(dmax * tc, MINVAL)
    K_dir = -tc / jnp.maximum(dmax * dmax, MINVAL)
    B_dir = -dr / jnp.maximum(dmax, MINVAL)
    return jnp.where(std, K_std, K_dir), jnp.where(std, B_std, B_dir)


def kb(solref, dmax):
    """Stiffness/damping (K, B) from solref given max impedance dmax."""
    return kb_comps(solref[..., 0], solref[..., 1], dmax)


def _body_dof_masks(m: Model):
    """(nbody, nv) 0/1 ancestor-dof mask, built from static topology."""
    import numpy as np

    mask = np.zeros((m.nbody, m.nv))
    for b in range(m.nbody):
        bb = b
        while bb != 0:
            ja, jn = m.body_jntadr[bb], m.body_jntnum[bb]
            for ji in range(ja, ja + jn):
                base = m.jnt_dofadr[ji]
                n = 6 if m.jnt_type[ji] == JNT_FREE else 1
                mask[b, base : base + n] = 1.0
            bb = m.body_parentid[bb]
    return mask


def point_jacobians(m: Model, d: Data, body_ids, points):
    """Translational and rotational Jacobians of world `points` attached to
    `body_ids`.  body_ids: (N,) int array; points: (N, 3).  Returns
    (Jt (N, 3, nv), Jr (N, 3, nv)).  Uses the com-frame cdof axes."""
    import numpy as np

    masks = jnp.asarray(_body_dof_masks(m), dtype=d.cdof.dtype)  # (nbody, nv)
    mk = masks[body_ids]  # (N, nv)
    ang = d.cdof[:, :3]   # (nv, 3)
    lin = d.cdof[:, 3:]   # (nv, 3)
    offset = points - d.subtree_com[0][None]  # (N, 3)
    # J_t[n, :, i] = lin_i + ang_i x offset_n
    cross = jnp.cross(ang[None, :, :], offset[:, None, :])  # (N, nv, 3)
    Jt = (lin[None] + cross) * mk[:, :, None]
    Jr = jnp.broadcast_to(ang[None], cross.shape) * mk[:, :, None]
    return jnp.swapaxes(Jt, 1, 2), jnp.swapaxes(Jr, 1, 2)


def equality_rows(m: Model, d: Data, s: State):
    """Weld + joint equality rows: list of (J, aref, D, R, pos) blocks.

    Factored out of make_efc so the batched lanes assembly
    (constraint_lanes.make_efc_batched) can reuse it under vmap — equality
    rows only exist on the EE teleop scenes, which run at single-env or
    small batch, so the AoS form is fine there."""
    dtype = s.qpos.dtype
    nv = m.nv
    blocks = []

    # ---- weld equality rows (6 per weld: 3 translation + 3 rotation) ----
    # site-weld semantics of the EE scenes (so_arm100_ee.xml equality/weld):
    # residual = [site1_xpos - site2_xpos ; torquescale * subquat(q1, q2)],
    # J = J(site1) - J(site2); validated against mjData.efc_* rows.
    neq = len(m.eq_site1)
    if neq:
        from . import quat as quat_ops

        s1 = jnp.asarray(m.eq_site1)
        s2 = jnp.asarray(m.eq_site2)
        sb = jnp.asarray(m.site_bodyid, jnp.int32)
        p1 = d.site_xpos[s1]
        p2 = d.site_xpos[s2]
        res_t = p1 - p2                                    # (NEQ, 3)
        q1 = quat_ops.from_mat(d.site_xmat[s1])
        q2 = quat_ops.from_mat(d.site_xmat[s2])
        # rotation residual = torquescale * vec(conj(q2) x q1) and its exact
        # quaternion-derivative Jacobian rows (calibrated vs mjData.efc_*)
        qd = quat_ops.mul(quat_ops.conj(q2), q1)           # (NEQ, 4)
        res_r = qd[:, 1:]
        Jt1, Jr1 = point_jacobians(m, d, sb[s1], p1)
        Jt2, Jr2 = point_jacobians(m, d, sb[s2], p2)
        # M[:, k] = vec(conj(q2) x (0, e_k) x q1); dres/domega1 = 0.5 M
        e3 = jnp.eye(3, dtype=dtype)
        def mcol(k):
            ek = jnp.concatenate(
                [jnp.zeros((neq, 1), dtype), jnp.tile(e3[k][None], (neq, 1))], 1
            )
            return quat_ops.mul(quat_ops.mul(quat_ops.conj(q2), ek), q1)[:, 1:]
        Mrot = jnp.stack([mcol(0), mcol(1), mcol(2)], axis=-1)  # (NEQ, 3, 3)
        Jrot = 0.5 * jnp.einsum("eij,ejv->eiv", Mrot, Jr1 - Jr2)
        Jeq = jnp.concatenate([Jt1 - Jt2, Jrot], axis=1)   # (NEQ, 6, nv)
        res = jnp.concatenate([res_t, res_r], axis=1)          # (NEQ, 6)
        imp = impedance(
            m.eq_solimp[:, None, :].repeat(6, 1), res
        )                                                       # (NEQ, 6)
        K, B = kb(m.eq_solref, m.eq_solimp[:, 1])
        vel = jnp.einsum("erv,v->er", Jeq, s.qvel)
        aref = -B[:, None] * vel - K[:, None] * imp * res
        binv = m.body_invweight0
        b1 = sb[s1]
        b2 = sb[s2]
        diag_t = binv[b1, 0] + binv[b2, 0]
        diag_r = binv[b1, 1] + binv[b2, 1]
        diag = jnp.concatenate(
            [jnp.tile(diag_t[:, None], (1, 3)), jnp.tile(diag_r[:, None], (1, 3))],
            axis=1,
        )
        R = jnp.maximum(MINVAL, (1 - imp) / imp * diag)
        nrows = neq * 6
        blocks.append((
            Jeq.reshape(nrows, nv), aref.reshape(-1), (1.0 / R).reshape(-1),
            R.reshape(-1), res.reshape(-1),
        ))

    # ---- joint equality rows: q1 - q01 = polycoef(q2 - q02) ----
    # (the Panda gripper's finger coupling, franka_emika_panda/panda_ee.xml
    # equality/joint; MuJoCo mjEQ_JOINT semantics)
    njeq = len(m.eq_jnt_q1)
    if njeq:
        q1a = jnp.asarray(m.eq_jnt_q1)
        q2a = jnp.asarray(m.eq_jnt_q2)
        v1a = jnp.asarray(m.eq_jnt_v1)
        v2a = jnp.asarray(m.eq_jnt_v2)
        c = m.eq_jnt_poly  # (NJEQ, 5)
        x = s.qpos[q2a] - m.qpos0[q2a]
        poly = c[:, 0] + x * (c[:, 1] + x * (c[:, 2] + x * (c[:, 3] + x * c[:, 4])))
        dpoly = c[:, 1] + x * (2 * c[:, 2] + x * (3 * c[:, 3] + x * 4 * c[:, 4]))
        res = (s.qpos[q1a] - m.qpos0[q1a]) - poly
        J = (
            jnp.zeros((njeq, nv), dtype)
            .at[jnp.arange(njeq), v1a].set(1.0)
            .at[jnp.arange(njeq), v2a].add(-dpoly)
        )
        vel = s.qvel[v1a] - dpoly * s.qvel[v2a]
        imp = impedance(m.eq_jnt_solimp, res)
        K, B = kb(m.eq_jnt_solref, m.eq_jnt_solimp[:, 1])
        aref = -B * vel - K * imp * res
        diag = m.dof_invweight0[v1a] + m.dof_invweight0[v2a]
        R = jnp.maximum(MINVAL, (1 - imp) / imp * diag)
        blocks.append((J, aref, 1.0 / R, R, res))

    return blocks


def make_efc(m: Model, d: Data, s: State, con: Contact) -> Efc:
    dtype = s.qpos.dtype
    nv = m.nv
    rows_J, rows_aref, rows_D, rows_R = [], [], [], []
    rows_pos, rows_floss, rows_isf, rows_isl = [], [], [], []

    # ---- equality rows (weld site pairs + joint couplings) ----
    for J, aref, D, R, pos in equality_rows(m, d, s):
        nrows = J.shape[0]
        rows_J.append(J)
        rows_aref.append(aref)
        rows_D.append(D)
        rows_R.append(R)
        rows_pos.append(pos)
        rows_floss.append(jnp.zeros(nrows, dtype))
        rows_isf.append(jnp.zeros(nrows, bool))
        rows_isl.append(jnp.zeros(nrows, bool))

    # ---- dof friction loss rows (static set: dofs with frictionloss > 0) ---
    fl_dofs = m.fl_dofs
    nf = len(fl_dofs)
    if nf:
        ids = jnp.asarray(fl_dofs)
        J = jnp.zeros((nf, nv), dtype).at[jnp.arange(nf), ids].set(1.0)
        imp = impedance(m.dof_solimp[ids], jnp.zeros(nf, dtype))
        K, B = kb(m.dof_solref[ids], m.dof_solimp[ids][:, 1])
        vel = s.qvel[ids]
        aref = -B * vel
        R = jnp.maximum(MINVAL, (1 - imp) / imp * m.dof_invweight0[ids])
        rows_J.append(J)
        rows_aref.append(aref)
        rows_D.append(1.0 / R)
        rows_R.append(R)
        rows_pos.append(jnp.zeros(nf, dtype))
        rows_floss.append(m.dof_frictionloss[ids])
        rows_isf.append(jnp.ones(nf, bool))
        rows_isl.append(jnp.zeros(nf, bool))

    # ---- joint limit rows (hinge/slide with limited=True) ----
    lim_jnts = tuple(
        j for j in range(len(m.jnt_type))
        if m.jnt_limited[j] and m.jnt_type[j] == JNT_HINGE
    )
    nl = len(lim_jnts)
    if nl:
        jids = jnp.asarray(lim_jnts)
        qadr = jnp.asarray([m.jnt_qposadr[j] for j in lim_jnts])
        vadr = jnp.asarray([m.jnt_dofadr[j] for j in lim_jnts])
        q = s.qpos[qadr]
        lo = m.jnt_range[jids, 0]
        hi = m.jnt_range[jids, 1]
        dist_lo = q - lo
        dist_hi = hi - q
        use_lo = dist_lo < dist_hi
        dist = jnp.where(use_lo, dist_lo, dist_hi)
        sign = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
        J = jnp.zeros((nl, nv), dtype).at[jnp.arange(nl), vadr].set(sign)
        active = dist < 0  # margin = 0
        pos = dist
        imp = impedance(m.jnt_solimp[jids], pos)
        K, B = kb(m.jnt_solref[jids], m.jnt_solimp[jids][:, 1])
        vel = sign * s.qvel[vadr]
        aref = -B * vel - K * imp * pos
        R = jnp.maximum(
            MINVAL, (1 - imp) / imp * m.dof_invweight0[vadr]
        )
        D = jnp.where(active, 1.0 / R, 0.0)
        rows_J.append(J)
        rows_aref.append(aref)
        rows_D.append(D)
        rows_R.append(R)
        rows_pos.append(pos)
        rows_floss.append(jnp.zeros(nl, dtype))
        rows_isf.append(jnp.zeros(nl, bool))
        rows_isl.append(jnp.ones(nl, bool))

    # ---- contact rows: K slots x CDIM ----
    Kslots = con.dist.shape[0]
    gb = jnp.asarray(m.geom_bodyid)
    b1 = gb[con.geom1]
    b2 = gb[con.geom2]
    Jt1, Jr1 = point_jacobians(m, d, b1, con.pos)
    Jt2, Jr2 = point_jacobians(m, d, b2, con.pos)
    dJt = Jt2 - Jt1  # (K, 3, nv)
    dJr = Jr2 - Jr1
    frame = con.frame  # (K, 3, 3) rows n, t1, t2
    Jn = jnp.einsum("ki,kiv->kv", frame[:, 0], dJt)
    Jt1r = jnp.einsum("ki,kiv->kv", frame[:, 1], dJt)
    Jt2r = jnp.einsum("ki,kiv->kv", frame[:, 2], dJt)
    Jtor = jnp.einsum("ki,kiv->kv", frame[:, 0], dJr)
    Jcon = jnp.stack([Jn, Jt1r, Jt2r, Jtor], axis=1)  # (K, CDIM, nv)

    imp = impedance(con.solimp, con.dist)  # (K,)
    Kk, Bk = kb(con.solref, con.solimp[:, 1])
    vel = jnp.einsum("krv,v->kr", Jcon, s.qvel)  # (K, CDIM)
    aref_n = -Bk * vel[:, 0] - Kk * imp * con.dist
    aref_f = -Bk[:, None] * vel[:, 1:]
    aref_con = jnp.concatenate([aref_n[:, None], aref_f], axis=1)

    binv = m.body_invweight0[:, 0]
    diag = binv[b1] + binv[b2]
    Rn = jnp.maximum(MINVAL, (1 - imp) / imp * diag)
    Dn = 1.0 / Rn
    ip = jnp.asarray(m.impratio, dtype)
    mu0 = con.friction[:, 0]
    # friction coefficients per friction row: [slide, slide, torsion]
    mus = jnp.stack(
        [con.friction[:, 0], con.friction[:, 0], con.friction[:, 1]], axis=1
    )
    # torsion row disabled for condim 3
    has_tor = con.condim >= 4
    mus = mus.at[:, 2].set(jnp.where(has_tor, mus[:, 2], 0.0))
    Df = Dn[:, None] * ip * (mus / jnp.maximum(mu0[:, None], MINVAL)) ** 2
    Dcon = jnp.concatenate([Dn[:, None], Df], axis=1)  # (K, CDIM)
    active = con.active & (con.dist < 0)
    Dcon = Dcon * active[:, None]

    mu = mu0 / jnp.sqrt(ip)
    uscale = jnp.concatenate(
        [
            jnp.ones((Kslots, 1), dtype),
            mus * jnp.sqrt(ip) / jnp.maximum(mu0[:, None], MINVAL),
        ],
        axis=1,
    )

    rows_J.append(Jcon.reshape(Kslots * CDIM, nv))
    rows_aref.append(aref_con.reshape(-1))
    rows_D.append(Dcon.reshape(-1))
    rows_R.append(jnp.tile(Rn[:, None], (1, CDIM)).reshape(-1))
    rows_pos.append(
        jnp.concatenate(
            [con.dist[:, None], jnp.zeros((Kslots, CDIM - 1), dtype)], 1
        ).reshape(-1)
    )
    rows_floss.append(jnp.zeros(Kslots * CDIM, dtype))
    rows_isf.append(jnp.zeros(Kslots * CDIM, bool))
    rows_isl.append(jnp.zeros(Kslots * CDIM, bool))

    return Efc(
        J=jnp.concatenate(rows_J),
        aref=jnp.concatenate(rows_aref),
        D=jnp.concatenate(rows_D),
        R=jnp.concatenate(rows_R),
        pos=jnp.concatenate(rows_pos),
        floss=jnp.concatenate(rows_floss),
        is_floss=jnp.concatenate(rows_isf),
        is_limit=jnp.concatenate(rows_isl),
        con_mu=mu,
        con_uscale=uscale,
        con_active=active,
        con_Dn=Dn * active,
        neq=len(m.eq_site1) * 6 + len(m.eq_jnt_q1),  # total equality rows
        nf=nf,
        nl=nl,
    )
