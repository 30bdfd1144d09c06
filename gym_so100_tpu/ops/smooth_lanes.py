"""Smooth dynamics in batch-last "lanes" form: the TPU throughput path.

Semantically identical to `smooth.forward_smooth` + `smooth.integrate`
(FK, CoM quantities, CRBA, RNE, affine actuation, semi-implicit Euler),
but every quantity carries the env batch as its MINOR axis: vectors are
(3, B), quaternions (4, B), matrices (3, 3, B), per-dof stacks (nv, B).
On TPU the minor axis maps to vector lanes, so a (3, B) array tiles at
full width where the vmapped AoS (B, 3) form pads 3 -> 128 (~2%
utilization); profiled at B=4096 the vmapped smooth stage costs ~5 ms per
substep, dominated by exactly that padding.

Tree loops stay unrolled over the 13 bodies / 12 dofs at trace time (same
strategy as smooth.py — the scene is small and static); only the layout
changes.  `tests/test_smooth_lanes.py` pins equivalence to the AoS engine
at f64.

Reference behavior replaced: the smooth-dynamics stages of MuJoCo's
mj_step (/root/reference/gym_so100/env.py step -> dm_control -> mj_step:
mj_kinematics, mj_comPos, mj_crb, mj_rne, actuation, mj_Euler).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import JNT_FREE, JNT_HINGE, JNT_SLIDE, Model, State

# ---------------------------------------------------------------------------
# lanes algebra: v = (3, B), q = (4, B), M = (3, 3, B)
# ---------------------------------------------------------------------------


def _cross(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def _qmul(q, p):
    w1, x1, y1, z1 = q
    w2, x2, y2, z2 = p
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _qrot(q, v):
    """Rotate v by quaternion q (MuJoCo convention, w first)."""
    w = q[0]
    u = q[1:]
    t = 2.0 * _cross(u, v)
    return v + w * t + _cross(u, t)


def _qnormalize(q, eps=1e-12):
    n = jnp.sqrt(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + q[3] ** 2)
    return q / jnp.maximum(n, eps)


def _qmat(q):
    """Quaternion -> rotation matrix (3, 3, B)."""
    w, x, y, z = q
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
    ])


def _axis_angle_q(axis, angle):
    """axis: (3,) static const; angle: (B,)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.stack([jnp.cos(half), axis[0] * s, axis[1] * s, axis[2] * s])


def _const_vec(v, B, dtype):
    """(3,) model constant -> broadcastable (3, 1) lanes column."""
    return jnp.asarray(v, dtype)[:, None]


def _motion_cross(v, m):
    """Spatial motion cross: v x m on 6-row lanes stacks (6, B)."""
    vang, vlin = v[:3], v[3:]
    mang, mlin = m[:3], m[3:]
    return jnp.concatenate([
        _cross(vang, mang),
        _cross(vlin, mang) + _cross(vang, mlin),
    ])


def _force_cross(v, f):
    vang, vlin = v[:3], v[3:]
    fang, flin = f[:3], f[3:]
    return jnp.concatenate([
        _cross(vang, fang) + _cross(vlin, flin),
        _cross(vang, flin),
    ])


def _inert_mul(I, h, mass, v):
    """Spatial inertia (I (3,3,B), h (3,B), mass (B or ())) x motion (6,B)."""
    w, vl = v[:3], v[3:]
    Iw = jnp.stack([
        I[0][0] * w[0] + I[0][1] * w[1] + I[0][2] * w[2],
        I[1][0] * w[0] + I[1][1] * w[1] + I[1][2] * w[2],
        I[2][0] * w[0] + I[2][1] * w[1] + I[2][2] * w[2],
    ])
    fang = Iw + _cross(h, vl)
    flin = mass * vl - _cross(h, w)
    return jnp.concatenate([fang, flin])


# ---------------------------------------------------------------------------
# forward pipeline
# ---------------------------------------------------------------------------


def forward_smooth_lanes(m: Model, s: State):
    """Full smooth pipeline on a batched State (leaves (B, ...)).

    Returns a dict with lanes quantities plus the AoS views downstream
    stages consume:
      body_xpos/body_xquat: lists of (3,B)/(4,B)
      geom_xpos (B, NG, 3), geom_xmat (B, NG, 3, 3)  [AoS for collide]
      site_xpos (B, NS, 3), site_xmat (B, NS, 3, 3)
      cdof (B, nv, 6), subtree_com0 (B, 3)
      qM (B, nv, nv), qacc_smooth (B, nv),
      qfrc_actuator/passive/bias (B, nv)
    """
    dtype = s.qpos.dtype
    B = s.qpos.shape[0]
    nb, nv = m.nbody, m.nv
    qp = s.qpos.T            # (nq, B)
    qv = s.qvel.T            # (nv, B)

    # ---- kinematics ----
    xpos = [None] * nb
    xquat = [None] * nb
    zero3 = jnp.zeros((3, B), dtype)
    xpos[0] = zero3
    xquat[0] = jnp.concatenate(
        [jnp.ones((1, B), dtype), jnp.zeros((3, B), dtype)]
    )
    mocap = None
    if s.mocap_pos.shape[-2]:
        mocap_pos = jnp.moveaxis(s.mocap_pos, 0, -1)    # (nmocap, 3, B)
        mocap_quat = jnp.moveaxis(s.mocap_quat, 0, -1)
        mocap = (mocap_pos, mocap_quat)

    for b in range(1, nb):
        p = m.body_parentid[b]
        if m.body_mocapid[b] >= 0:
            mid = m.body_mocapid[b]
            xpos[b] = mocap[0][mid]
            xquat[b] = mocap[1][mid]
            continue
        pos = xpos[p] + _qrot(xquat[p], _const_vec(m.body_pos[b], B, dtype))
        qt = _qmul(xquat[p], jnp.asarray(m.body_quat[b], dtype)[:, None] * jnp.ones((1, B), dtype))
        jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
        for ji in range(jadr, jadr + jnum):
            jt = m.jnt_type[ji]
            qadr = m.jnt_qposadr[ji]
            if jt == JNT_FREE:
                pos = qp[qadr : qadr + 3]
                qt = _qnormalize(qp[qadr + 3 : qadr + 7])
            elif jt == JNT_HINGE:
                angle = qp[qadr]
                axis_local = m.jnt_axis[ji]
                qloc = _axis_angle_q(axis_local, angle)
                anchor = pos + _qrot(qt, _const_vec(m.jnt_pos[ji], B, dtype))
                qt = _qmul(qt, qloc)
                pos = anchor - _qrot(qt, _const_vec(m.jnt_pos[ji], B, dtype))
            elif jt == JNT_SLIDE:
                pos = pos + _qrot(qt, _const_vec(m.jnt_axis[ji], B, dtype)) * qp[qadr]
            else:
                raise NotImplementedError("ball joints not supported")
        xpos[b] = pos
        xquat[b] = qt

    # inertial frames
    xipos = [
        xpos[b] + _qrot(xquat[b], _const_vec(m.body_ipos[b], B, dtype))
        for b in range(nb)
    ]
    ximat = [
        _qmat(_qmul(xquat[b], jnp.asarray(m.body_iquat[b], dtype)[:, None]))
        for b in range(nb)
    ]

    # geoms / sites (AoS views for the collision + constraint stages)
    def frames_for(bodyids, pos_c, quat_c):
        if len(bodyids) == 0:  # scene with no sites (or no geoms)
            return (
                jnp.zeros((B, 0, 3), dtype),
                jnp.zeros((B, 0, 3, 3), dtype),
            )
        px, mx = [], []
        for k, b in enumerate(bodyids):
            pk = xpos[b] + _qrot(xquat[b], _const_vec(pos_c[k], B, dtype))
            qk = _qmul(xquat[b], jnp.asarray(quat_c[k], dtype)[:, None])
            px.append(pk)
            mx.append(_qmat(qk))
        # (N, 3, B) -> (B, N, 3); (N, 3, 3, B) -> (B, N, 3, 3)
        P = jnp.moveaxis(jnp.stack(px), -1, 0)
        M = jnp.moveaxis(jnp.stack(mx), -1, 0)
        return P, M

    geom_xpos, geom_xmat = frames_for(m.geom_bodyid, m.geom_pos, m.geom_quat)
    site_xpos, site_xmat = frames_for(m.site_bodyid, m.site_pos, m.site_quat)

    # ---- subtree com ----
    mass = [jnp.asarray(m.body_mass[b], dtype) for b in range(nb)]
    sub_mass = list(mass)
    sub_mpos = [mass[b] * xipos[b] for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        p = m.body_parentid[b]
        sub_mass[p] = sub_mass[p] + sub_mass[b]
        sub_mpos[p] = sub_mpos[p] + sub_mpos[b]
    root_com = sub_mpos[0] / jnp.maximum(sub_mass[0], 1e-12)

    # ---- spatial inertia about root com ----
    eye = jnp.eye(3, dtype=dtype)
    cI, ch = [], []
    for b in range(nb):
        R = ximat[b]                      # (3,3,B)
        diag = jnp.asarray(m.body_inertia[b], dtype)  # (3,)
        # I_rot = R diag R^T
        Irot = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                Irot[i][j] = (
                    R[i][0] * diag[0] * R[j][0]
                    + R[i][1] * diag[1] * R[j][1]
                    + R[i][2] * diag[2] * R[j][2]
                )
        c = xipos[b] - root_com
        c2 = c[0] * c[0] + c[1] * c[1] + c[2] * c[2]
        I_full = jnp.stack([
            jnp.stack([
                Irot[i][j] + mass[b] * (c2 * eye[i, j] - c[i] * c[j])
                for j in range(3)
            ])
            for i in range(3)
        ])
        cI.append(I_full)
        ch.append(mass[b] * c)

    # ---- cdof ----
    cdof = [None] * nv
    for j in range(len(m.jnt_type)):
        jt = m.jnt_type[j]
        b = m.jnt_bodyid[j]
        vadr = m.jnt_dofadr[j]
        if jt == JNT_FREE:
            for k in range(3):
                e = jnp.zeros((3, 1), dtype).at[k, 0].set(1.0)
                cdof[vadr + k] = jnp.concatenate(
                    [jnp.zeros((3, B), dtype), jnp.broadcast_to(e, (3, B))]
                )
            anchor = xpos[b] + _qrot(xquat[b], _const_vec(m.jnt_pos[j], B, dtype))
            offset = anchor - root_com
            Rb = _qmat(xquat[b])
            for k in range(3):
                ax = jnp.stack([Rb[0][k], Rb[1][k], Rb[2][k]])
                lin = _cross(ax, -offset)
                cdof[vadr + 3 + k] = jnp.concatenate([ax, lin])
        elif jt == JNT_HINGE:
            ax = _qrot(xquat[b], _const_vec(m.jnt_axis[j], B, dtype))
            anchor = xpos[b] + _qrot(xquat[b], _const_vec(m.jnt_pos[j], B, dtype))
            offset = anchor - root_com
            lin = _cross(ax, -offset)
            cdof[vadr] = jnp.concatenate([ax, lin])
        elif jt == JNT_SLIDE:
            ax = _qrot(xquat[b], _const_vec(m.jnt_axis[j], B, dtype))
            cdof[vadr] = jnp.concatenate([jnp.zeros((3, B), dtype), ax])
        else:
            raise NotImplementedError

    # ---- CRBA ----
    crb_I = list(cI)
    crb_h = list(ch)
    crb_m = [mass[b] * jnp.ones((B,), dtype) for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        p = m.body_parentid[b]
        crb_I[p] = crb_I[p] + crb_I[b]
        crb_h[p] = crb_h[p] + crb_h[b]
        crb_m[p] = crb_m[p] + crb_m[b]

    F = [
        _inert_mul(crb_I[m.dof_bodyid[i]], crb_h[m.dof_bodyid[i]],
                   crb_m[m.dof_bodyid[i]], cdof[i])
        for i in range(nv)
    ]
    amask = _ancestor_mask(m)
    qM = [[None] * nv for _ in range(nv)]
    armature = m.dof_armature
    for i in range(nv):
        for j in range(i + 1):
            if amask[i][j] or amask[j][i] or i == j:
                v = (
                    F[i][0] * cdof[j][0] + F[i][1] * cdof[j][1]
                    + F[i][2] * cdof[j][2] + F[i][3] * cdof[j][3]
                    + F[i][4] * cdof[j][4] + F[i][5] * cdof[j][5]
                )
            else:
                v = jnp.zeros((B,), dtype)
            if i == j:
                v = v + jnp.asarray(armature[i], dtype)
            qM[i][j] = v
            qM[j][i] = v

    # ---- RNE (bias forces incl. gravity) ----
    cvel = [jnp.zeros((6, B), dtype)] * nb
    cdof_dot = [jnp.zeros((6, B), dtype)] * nv
    for b in range(1, nb):
        p = m.body_parentid[b]
        v = cvel[p]
        jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
        for ji in range(jadr, jadr + jnum):
            base = m.jnt_dofadr[ji]
            n = 6 if m.jnt_type[ji] == JNT_FREE else 1
            if m.jnt_type[ji] == JNT_FREE:
                v_trans = v
                for k in range(3):
                    v_trans = v_trans + cdof[base + k] * qv[base + k]
                for k in range(3, 6):
                    cdof_dot[base + k] = _motion_cross(v_trans, cdof[base + k])
            else:
                cdof_dot[base] = _motion_cross(v, cdof[base])
            for k in range(n):
                v = v + cdof[base + k] * qv[base + k]
        cvel[b] = v

    grav = jnp.concatenate([
        jnp.zeros((3, B), dtype),
        jnp.broadcast_to(-jnp.asarray(m.gravity, dtype)[:, None], (3, B)),
    ])
    cacc = [grav] * nb
    for b in range(1, nb):
        p = m.body_parentid[b]
        a = cacc[p]
        jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
        for ji in range(jadr, jadr + jnum):
            base = m.jnt_dofadr[ji]
            n = 6 if m.jnt_type[ji] == JNT_FREE else 1
            for k in range(n):
                a = a + cdof_dot[base + k] * qv[base + k]
        cacc[b] = a

    cfrc = []
    for b in range(nb):
        fb = _inert_mul(cI[b], ch[b], mass[b], cacc[b]) + _force_cross(
            cvel[b], _inert_mul(cI[b], ch[b], mass[b], cvel[b])
        )
        cfrc.append(fb)
    for b in range(nb - 1, 0, -1):
        p = m.body_parentid[b]
        cfrc[p] = cfrc[p] + cfrc[b]

    qfrc_bias = [
        jnp.sum(cdof[i] * cfrc[m.dof_bodyid[i]], axis=0) for i in range(nv)
    ]

    # ---- actuation + passive ----
    qfrc_act = [jnp.zeros((B,), dtype) for _ in range(nv)]
    for ai in range(m.nu):
        di = m.actuator_dofid[ai]
        length = qp[di]
        velocity = qv[di]
        ctrl = jnp.clip(
            s.ctrl[:, ai], m.actuator_ctrlrange[ai, 0], m.actuator_ctrlrange[ai, 1]
        )
        force = (
            m.actuator_kp[ai] * ctrl + m.actuator_bias0[ai]
            + m.actuator_bias1[ai] * length - m.actuator_kv[ai] * velocity
        )
        force = jnp.clip(
            force, m.actuator_forcerange[ai, 0], m.actuator_forcerange[ai, 1]
        )
        qfrc_act[di] = qfrc_act[di] + force
    qfrc_pass = [-jnp.asarray(m.dof_damping[i], dtype) * qv[i] for i in range(nv)]

    qfrc_smooth = [
        qfrc_pass[i] + qfrc_act[i] - qfrc_bias[i] for i in range(nv)
    ]

    # ---- qacc_smooth = M^-1 qfrc_smooth (unrolled scalar Cholesky) ----
    L = _chol_lanes(qM, nv, dtype)
    qacc_smooth = _chol_solve_lanes(L, qfrc_smooth, nv)

    # ---- AoS exports ----
    qM_aos = jnp.moveaxis(
        jnp.stack([jnp.stack(row) for row in qM]), -1, 0
    )  # (B, nv, nv)
    cdof_aos = jnp.moveaxis(jnp.stack(cdof), -1, 0)  # (B, nv, 6)
    to_vec = lambda rows: jnp.stack(rows, axis=-1)   # (B, nv)

    return dict(
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
        subtree_com0=root_com.T,          # (B, 3)
        cdof=cdof_aos,
        qM=qM_aos,
        qM_lanes=qM,                      # nv x nv nested lists of (B,)
        qL=L,                             # lanes lower factor (list form)
        qacc_smooth=to_vec(qacc_smooth),
        qfrc_actuator=to_vec(qfrc_act),
        qfrc_passive=to_vec(qfrc_pass),
        qfrc_bias=to_vec(qfrc_bias),
        qfrc_smooth=to_vec(qfrc_smooth),
    )


def _ancestor_mask(m: Model):
    """Static (nv, nv) ancestor-dof mask (see smooth._ancestor_mask)."""
    nv = m.nv

    def dofs_of_body_chain(b):
        dofs = []
        while b != 0:
            ja, jn = m.body_jntadr[b], m.body_jntnum[b]
            for ji in range(ja, ja + jn):
                base = m.jnt_dofadr[ji]
                n = 6 if m.jnt_type[ji] == JNT_FREE else 1
                dofs.extend(range(base, base + n))
            b = m.body_parentid[b]
        return set(dofs)

    mask = []
    for i in range(nv):
        chain = dofs_of_body_chain(m.dof_bodyid[i])
        mask.append(tuple(j in chain for j in range(nv)))
    return tuple(mask)


def _chol_lanes(A, n, dtype):
    """Lower Cholesky of A given as n x n nested lists of (B,) lanes."""
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        sval = A[j][j]
        for k in range(j):
            sval = sval - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(sval, tiny))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            sval = A[i][j]
            for k in range(j):
                sval = sval - L[i][k] * L[j][k]
            L[i][j] = sval * inv
    return L


def _chol_solve_lanes(L, b, n):
    y = [None] * n
    for i in range(n):
        sval = b[i]
        for k in range(i):
            sval = sval - L[i][k] * y[k]
        y[i] = sval / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        sval = y[i]
        for k in range(i + 1, n):
            sval = sval - L[k][i] * x[k]
        x[i] = sval / L[i][i]
    return x


def integrate_lanes(m: Model, s: State, qacc):
    """Semi-implicit Euler on the batched State (qacc (B, nv))."""
    h = jnp.asarray(m.timestep, dtype=s.qpos.dtype)
    qvel = s.qvel + h * qacc
    qp = s.qpos.T
    qv = qvel.T
    out = [None] * qp.shape[0]
    for i in range(qp.shape[0]):
        out[i] = qp[i]
    for j in range(len(m.jnt_type)):
        jt = m.jnt_type[j]
        qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        if jt == JNT_FREE:
            for k in range(3):
                out[qadr + k] = out[qadr + k] + h * qv[vadr + k]
            quat = jnp.stack([out[qadr + 3 + k] for k in range(4)])
            omega = jnp.stack([qv[vadr + 3 + k] for k in range(3)])
            # quat integrate: q * exp(h/2 * omega) (MuJoCo mju_quatIntegrate)
            angle = jnp.sqrt(omega[0] ** 2 + omega[1] ** 2 + omega[2] ** 2)
            half = 0.5 * h * angle
            sc = jnp.where(
                angle > 1e-12,
                jnp.sin(half) / jnp.maximum(angle, 1e-12),
                0.5 * h,
            )
            dq = jnp.stack([jnp.cos(half), omega[0] * sc, omega[1] * sc, omega[2] * sc])
            newq = _qnormalize(_qmul(quat, dq))
            for k in range(4):
                out[qadr + 3 + k] = newq[k]
        else:
            out[qadr] = out[qadr] + h * qv[vadr]
    qpos = jnp.stack(out, axis=-1)
    return s.replace(qpos=qpos, qvel=qvel)
