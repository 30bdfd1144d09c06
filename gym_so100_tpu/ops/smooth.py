"""Smooth (constraint-free) dynamics: kinematics, CRBA, RNE, actuation.

Pure-JAX re-implementation of the forward-dynamics pipeline that the reference
runs inside the MuJoCo C engine (hot loop at /root/reference/gym_so100/env.py
step -> dm_control -> mj_step).  The computation is specialized at trace time
to the scene topology (body tree, joint addressing are Python tuples on the
Model), so loops over bodies/joints unroll into straight-line XLA ops — there
are only 13 bodies and 12 dofs, so unrolling is both the fastest and the
simplest compilation strategy; the env batch dimension comes from vmap.

Conventions follow MuJoCo: quaternions (w,x,y,z); spatial 6-vectors are
[angular(3); linear(3)] expressed in the world frame about a common origin
(the whole-system CoM, like mjData's com-based frame); free-joint linear
velocity is world-frame, angular velocity body-local.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import (
    JNT_FREE,
    JNT_HINGE,
    JNT_SLIDE,
    Data,
    Model,
    State,
)
from . import linalg
from . import quat as quat_ops


# ---------------------------------------------------------------------------
# Spatial algebra helpers (6-vectors [ang, lin])
# ---------------------------------------------------------------------------

def motion_cross(v, m):
    """Spatial motion cross product v x m (both motion vectors)."""
    vang, vlin = v[..., :3], v[..., 3:]
    mang, mlin = m[..., :3], m[..., 3:]
    ang = quat_ops.cross(vang, mang)
    lin = quat_ops.cross(vlin, mang) + quat_ops.cross(vang, mlin)
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v, f):
    """Spatial force cross product v x* f (motion vector v, force vector f)."""
    vang, vlin = v[..., :3], v[..., 3:]
    fang, flin = f[..., :3], f[..., 3:]
    ang = quat_ops.cross(vang, fang) + quat_ops.cross(vlin, flin)
    lin = quat_ops.cross(vang, flin)
    return jnp.concatenate([ang, lin], axis=-1)


def inert_mul(inr, v):
    """Multiply spatial inertia (10-param) by motion vector -> force vector.

    inr = (I_3x3 (about origin, world frame), h = m*c (3,), m scalar) packed as
    a tuple; v = [ang, lin].  f_ang = I w + h x v_lin ; f_lin = m v_lin - h x w.
    """
    I, h, mass = inr
    w, vl = v[..., :3], v[..., 3:]
    fang = jnp.einsum("...ij,...j->...i", I, w) + quat_ops.cross(h, vl)
    flin = mass[..., None] * vl - quat_ops.cross(h, w)
    return jnp.concatenate([fang, flin], axis=-1)


# ---------------------------------------------------------------------------
# Forward kinematics
# ---------------------------------------------------------------------------

def kinematics(m: Model, s: State) -> Data:
    """Body/geom/site world poses from qpos (mj_kinematics equivalent)."""
    nb = m.nbody
    xpos = [None] * nb
    xquat = [None] * nb
    dtype = s.qpos.dtype
    xpos[0] = jnp.zeros(3, dtype)
    xquat[0] = jnp.array([1.0, 0, 0, 0], dtype)

    for b in range(1, nb):
        p = m.body_parentid[b]
        if m.body_mocapid[b] >= 0:
            mid = m.body_mocapid[b]
            xpos[b] = s.mocap_pos[mid]
            xquat[b] = s.mocap_quat[mid]
            continue
        pos = xpos[p] + quat_ops.rotate(xquat[p], m.body_pos[b])
        qt = quat_ops.mul(xquat[p], m.body_quat[b])
        jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
        for ji in range(jadr, jadr + jnum):
            jt = m.jnt_type[ji]
            qadr = m.jnt_qposadr[ji]
            if jt == JNT_FREE:
                pos = s.qpos[qadr : qadr + 3]
                qt = quat_ops.normalize(s.qpos[qadr + 3 : qadr + 7])
            elif jt == JNT_HINGE:
                angle = s.qpos[qadr]
                # anchor: joint position is fixed in the body frame; rotation
                # about the joint axis through that anchor.
                axis_local = m.jnt_axis[ji]
                qloc = quat_ops.from_axis_angle(axis_local, angle)
                # world anchor before joint rotation
                anchor = pos + quat_ops.rotate(qt, m.jnt_pos[ji])
                qt = quat_ops.mul(qt, qloc)
                pos = anchor - quat_ops.rotate(qt, m.jnt_pos[ji])
            elif jt == JNT_SLIDE:
                pos = pos + quat_ops.rotate(qt, m.jnt_axis[ji]) * s.qpos[qadr]
            else:
                raise NotImplementedError("ball joints not supported")
        xpos[b] = pos
        xquat[b] = qt

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = quat_ops.to_mat(xquat)

    # inertial frames
    xipos = xpos + _rot_vecs(xquat, m.body_ipos)
    ximat = quat_ops.to_mat(quat_ops.mul(xquat, m.body_iquat))

    # geoms / sites
    gb = jnp.asarray(m.geom_bodyid, jnp.int32)
    geom_xpos = xpos[gb] + _rot_vecs(xquat[gb], m.geom_pos)
    geom_xmat = quat_ops.to_mat(quat_ops.mul(xquat[gb], m.geom_quat))
    sb = jnp.asarray(m.site_bodyid, jnp.int32)
    site_xpos = xpos[sb] + _rot_vecs(xquat[sb], m.site_pos)
    site_xmat = quat_ops.to_mat(quat_ops.mul(xquat[sb], m.site_quat))

    return Data(
        xpos=xpos,
        xquat=xquat,
        xipos=xipos,
        ximat=ximat,
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
    )


def _rot_vecs(q, v):
    return quat_ops.rotate(q, v)


# ---------------------------------------------------------------------------
# CoM-based quantities: subtree com, spatial inertias, dof motion axes
# ---------------------------------------------------------------------------

def _subtree_com(m: Model, d: Data) -> jnp.ndarray:
    """subtree_com[b] = mass-weighted CoM of body b's subtree (mj_comPos)."""
    nb = m.nbody
    mass = m.body_mass
    # accumulate children into parents (reverse topological order)
    sub_mass = [mass[b] for b in range(nb)]
    sub_mpos = [mass[b] * d.xipos[b] for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        p = m.body_parentid[b]
        sub_mass[p] = sub_mass[p] + sub_mass[b]
        sub_mpos[p] = sub_mpos[p] + sub_mpos[b]
    com = [sub_mpos[b] / jnp.maximum(sub_mass[b], 1e-12) for b in range(nb)]
    return jnp.stack(com)


def com_quantities(m: Model, d: Data) -> Data:
    """Compute subtree_com, body spatial inertia about the root com frame
    (cinr), and per-dof motion axes (cdof).  Equivalent of mj_comPos."""
    subtree_com = _subtree_com(m, d)
    root_com = subtree_com[0]
    dtype = d.xpos.dtype

    # spatial inertia of each body about root_com in world frame:
    # I_world = R diag(inertia) R^T + m (c^T c 1 - c c^T) [parallel axis]
    R = d.ximat
    diagI = jax.vmap(jnp.diag)(m.body_inertia)
    I_rot = R @ diagI @ jnp.swapaxes(R, -1, -2)
    c = d.xipos - root_com  # com offset of body from frame origin
    cc = jnp.einsum("bi,bj->bij", c, c)
    c2 = jnp.sum(c * c, axis=-1)
    eye = jnp.eye(3, dtype=dtype)
    I_full = I_rot + m.body_mass[:, None, None] * (c2[:, None, None] * eye - cc)
    h = m.body_mass[:, None] * c
    cinr = (I_full, h, m.body_mass)

    # cdof: motion axes per dof, about root_com
    nv = m.nv
    cdof = [None] * nv
    for j in range(len(m.jnt_type)):
        jt = m.jnt_type[j]
        b = m.jnt_bodyid[j]
        vadr = m.jnt_dofadr[j]
        if jt == JNT_FREE:
            for k in range(3):
                e = jnp.zeros(3, dtype).at[k].set(1.0)
                cdof[vadr + k] = jnp.concatenate([jnp.zeros(3, dtype), e])
            # rotation dofs: axes = world-frame coordinate axes of the BODY
            # frame (qvel angular is body-local), anchored at the joint pos
            anchor = d.xpos[b] + quat_ops.rotate(d.xquat[b], m.jnt_pos[j])
            offset = anchor - root_com
            Rb = quat_ops.to_mat(d.xquat[b])
            for k in range(3):
                ax = Rb[:, k]
                lin = quat_ops.cross(ax, -offset)
                cdof[vadr + 3 + k] = jnp.concatenate([ax, lin])
        elif jt == JNT_HINGE:
            ax = quat_ops.rotate(d.xquat[b], m.jnt_axis[j])
            anchor = d.xpos[b] + quat_ops.rotate(d.xquat[b], m.jnt_pos[j])
            offset = anchor - root_com
            lin = quat_ops.cross(ax, -offset)
            cdof[vadr] = jnp.concatenate([ax, lin])
        elif jt == JNT_SLIDE:
            ax = quat_ops.rotate(d.xquat[b], m.jnt_axis[j])
            cdof[vadr] = jnp.concatenate([jnp.zeros(3, dtype), ax])
        else:
            raise NotImplementedError
    cdof = jnp.stack(cdof)

    return d.replace(subtree_com=subtree_com, cdof=cdof), cinr


# ---------------------------------------------------------------------------
# Mass matrix (CRBA) and bias forces (RNE)
# ---------------------------------------------------------------------------

def _ancestor_mask(m: Model) -> tuple:
    """mask[i][j] = True if dof j is on the path from dof i's body to root
    (inclusive).  Static Python structure -> baked into the trace."""
    nv = m.nv
    # ancestor bodies of each dof's body
    def dofs_of_body_chain(b):
        dofs = []
        while b != 0:
            jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
            for ji in range(jadr, jadr + jnum):
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


def crba(m: Model, d: Data, cinr) -> Data:
    """Dense mass matrix via composite rigid body algorithm + Cholesky."""
    nb, nv = m.nbody, m.nv
    I, h, mass = cinr
    # composite inertia: accumulate subtree
    crb_I = [I[b] for b in range(nb)]
    crb_h = [h[b] for b in range(nb)]
    crb_m = [mass[b] for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        p = m.body_parentid[b]
        crb_I[p] = crb_I[p] + crb_I[b]
        crb_h[p] = crb_h[p] + crb_h[b]
        crb_m[p] = crb_m[p] + crb_m[b]

    # F_i = crb[body(i)] * cdof_i
    F = []
    for i in range(nv):
        b = m.dof_bodyid[i]
        F.append(
            inert_mul((crb_I[b], crb_h[b], crb_m[b]), d.cdof[i])
        )
    F = jnp.stack(F)  # (nv, 6)

    # Mfull[i, j] = F_i . cdof_j, as 6 FMAs on (nv, nv) slices (a batched
    # 12x6x12 matmul would pad to MXU tiles under vmap)
    Mfull = F[:, None, 0] * d.cdof[None, :, 0]
    for k in range(1, 6):
        Mfull = Mfull + F[:, None, k] * d.cdof[None, :, k]
    mask = jnp.asarray(_ancestor_mask(m), dtype=bool)
    qM = jnp.where(mask, Mfull, 0.0)
    qM = jnp.where(mask.T, Mfull.T, qM)  # symmetrize using valid halves
    qM = qM + jnp.diag(m.dof_armature)
    qLD = linalg.chol_factor(qM)
    return d.replace(qM=qM, qLD=qLD)


def rne(m: Model, d: Data, s: State, cinr) -> Data:
    """Bias force C(qpos, qvel) via recursive Newton-Euler (mj_rne flg_acc=0),
    including gravity."""
    nb, nv = m.nbody, m.nv
    dtype = s.qpos.dtype
    I, h, mass = cinr

    # body velocities in com frame: cvel[b] = cvel[parent] + sum cdof_i qvel_i
    cvel = [jnp.zeros(6, dtype)] * nb
    # cdof_dot: time derivative of cdof = cvel[b_prev] x cdof (MuJoCo computes
    # with the velocity accumulated *before* the joint's own dofs).
    cdof_dot = [jnp.zeros(6, dtype)] * nv
    for b in range(1, nb):
        p = m.body_parentid[b]
        v = cvel[p]
        jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
        for ji in range(jadr, jadr + jnum):
            base = m.jnt_dofadr[ji]
            n = 6 if m.jnt_type[ji] == JNT_FREE else 1
            if m.jnt_type[ji] == JNT_FREE:
                # translation dofs have constant cdof; rotation dofs rotate
                # with the body: derivative = v_after_translation x cdof
                for k in range(3):
                    cdof_dot[base + k] = jnp.zeros(6, dtype)
                v_trans = v
                for k in range(3):
                    v_trans = v_trans + d.cdof[base + k] * s.qvel[base + k]
                for k in range(3, 6):
                    cdof_dot[base + k] = motion_cross(v_trans, d.cdof[base + k])
            else:
                cdof_dot[base] = motion_cross(v, d.cdof[base])
            for k in range(n):
                v = v + d.cdof[base + k] * s.qvel[base + k]
        cvel[b] = v

    # accelerations: cacc[0] = -gravity (spatial, lin part), recursive
    grav = jnp.concatenate([jnp.zeros(3, dtype), -m.gravity.astype(dtype)])
    cacc = [grav] * nb
    for b in range(1, nb):
        p = m.body_parentid[b]
        a = cacc[p]
        jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
        for ji in range(jadr, jadr + jnum):
            base = m.jnt_dofadr[ji]
            n = 6 if m.jnt_type[ji] == JNT_FREE else 1
            for k in range(n):
                a = a + cdof_dot[base + k] * s.qvel[base + k]
        cacc[b] = a

    # forces: f[b] = I a + v x* (I v)
    cfrc = []
    for b in range(nb):
        inr_b = (I[b], h[b], mass[b])
        fb = inert_mul(inr_b, cacc[b]) + force_cross(
            cvel[b], inert_mul(inr_b, cvel[b])
        )
        cfrc.append(fb)
    # backward accumulation
    for b in range(nb - 1, 0, -1):
        p = m.body_parentid[b]
        cfrc[p] = cfrc[p] + cfrc[b]

    qfrc_bias = jnp.stack(
        [jnp.dot(d.cdof[i], cfrc[m.dof_bodyid[i]]) for i in range(nv)]
    )
    return d.replace(qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# Actuation, passive forces, smooth acceleration
# ---------------------------------------------------------------------------

def actuation(m: Model, d: Data, s: State) -> Data:
    """Joint-transmission actuators with affine gain/bias (MuJoCo fixed-gain
    + affine-bias semantics): force = gain*ctrl + b0 + b1*length - kv*vel.

    Position servos are the special case gain=kp, b0=0, b1=-kp
    (reference arm: kp=50 dampratio=1 forcerange +-3.5,
    /root/reference/gym_so100/assets/trs_so_arm100/so_arm100.xml:33,156-163;
    kv resolved at build time exactly as MuJoCo's compiler does).  `general`
    actuators (the Panda EE scene, franka_emika_panda/panda_ee.xml:268-285)
    carry their gainprm/biasprm directly.
    """
    if m.nu == 0:
        return d.replace(qfrc_actuator=jnp.zeros(m.nv, dtype=s.qpos.dtype))
    dofid = jnp.asarray(m.actuator_dofid, jnp.int32)
    # joint transmissions with gear 1: length = qpos[dof], velocity = qvel[dof]
    qadr = dofid  # for 1-dof joints dofadr == qposadr in these scene layouts
    length = s.qpos[qadr]
    velocity = s.qvel[dofid]
    ctrl = jnp.clip(s.ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1])
    force = (
        m.actuator_kp * ctrl + m.actuator_bias0 + m.actuator_bias1 * length
        - m.actuator_kv * velocity
    )
    force = jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1])
    qfrc = jnp.zeros(m.nv, dtype=s.qpos.dtype).at[dofid].add(force)
    return d.replace(qfrc_actuator=qfrc)


def passive(m: Model, d: Data, s: State) -> Data:
    """Passive forces: joint damping (none in this scene; frictionloss is a
    constraint, handled by the solver)."""
    qfrc = -m.dof_damping * s.qvel
    return d.replace(qfrc_passive=qfrc)


def smooth_acc(m: Model, d: Data) -> Data:
    """qacc_smooth = M^-1 (actuator + passive - bias)."""
    qfrc_smooth = d.qfrc_passive + d.qfrc_actuator - d.qfrc_bias
    qacc_smooth = cho_solve(d.qLD, qfrc_smooth)
    return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def cho_solve(L, b):
    """Solve (L L^T) x = b for dense lower-triangular L (unrolled scalar —
    the library triangular_solve is a column-loop kernel, ~8x slower at
    these sizes on TPU; see ops/linalg.py)."""
    return linalg.chol_solve(L, b)


def forward_smooth(m: Model, s: State):
    """Full smooth pipeline: FK -> com -> CRBA -> RNE -> actuation -> qacc."""
    d = kinematics(m, s)
    d, cinr = com_quantities(m, d)
    d = crba(m, d, cinr)
    d = rne(m, d, s, cinr)
    d = actuation(m, d, s)
    d = passive(m, d, s)
    d = smooth_acc(m, d)
    return d


# ---------------------------------------------------------------------------
# Integration (semi-implicit Euler, MuJoCo mj_Euler semantics)
# ---------------------------------------------------------------------------

def integrate(m: Model, s: State, qacc: jnp.ndarray) -> State:
    h = jnp.asarray(m.timestep, dtype=s.qpos.dtype)
    qvel = s.qvel + h * qacc
    qpos = s.qpos
    for j in range(len(m.jnt_type)):
        jt = m.jnt_type[j]
        qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        if jt == JNT_FREE:
            qpos = qpos.at[qadr : qadr + 3].add(h * qvel[vadr : vadr + 3])
            quat = qpos[qadr + 3 : qadr + 7]
            omega = qvel[vadr + 3 : vadr + 6]
            newq = quat_ops.normalize(quat_ops.integrate(quat, omega, h))
            qpos = qpos.at[qadr + 3 : qadr + 7].set(newq)
        else:
            qpos = qpos.at[qadr].add(h * qvel[vadr])
    return s.replace(qpos=qpos, qvel=qvel)
