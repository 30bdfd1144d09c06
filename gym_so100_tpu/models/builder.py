"""MJCF -> Model compiler.

Flattens the parsed body tree into the static-array Model, resolving the same
derived quantities MuJoCo's compiler produces for the pieces of mjModel the
engine consumes:

* DFS pre-order body numbering, joint/dof/qpos addressing;
* box-canonicalization of meshes that are exact rectangular boxes (the
  reference scene's table mesh, assets/scene_so100.xml:19-21, is an 8-vertex
  box — treating it analytically makes cube/table contact a box-box pair);
* actuator kv from dampratio: kv = 2 * dampratio * sqrt(kp * M_ii(qpos0))
  with M the joint-space inertia matrix including armature (verified against
  MuJoCo 3.10 compiled biasprm in tests/test_oracle_smooth.py);
* dof/body invweight0 at qpos0 (constraint regularization weights);
* the static collision-pair table with MuJoCo's filtering semantics
  (contype/conaffinity, weld equivalence, parent-child filtering with the
  world exemption, explicit excludes) and per-pair mixed contact parameters
  (condim max, friction elementwise max, solref/solimp solmix-weighted mean).
"""

from __future__ import annotations

import numpy as np

from . import mjcf
from .scene import (
    GEOM_BOX,
    GEOM_MESH,
    JNT_FREE,
    JNT_HINGE,
    JNT_SLIDE,
    CollisionPairs,
    Model,
)

_JNT_CODE = {"free": JNT_FREE, "hinge": JNT_HINGE, "slide": JNT_SLIDE}
_GEOM_CODE = {"box": GEOM_BOX, "mesh": GEOM_MESH, "sphere": 2, "capsule": 3, "cylinder": 5, "plane": 0}

_DEFAULT_SOLREF = np.array([0.02, 1.0])
_DEFAULT_SOLIMP = np.array([0.9, 0.95, 0.001, 0.5, 2.0])


def build_model(
    path: str, max_contacts: int = 32, keep_visual: bool = False,
    ccd_manifolds: bool = False,
) -> tuple[Model, dict]:
    """Compile an MJCF file into a Model.

    Returns (model, aux) where aux holds build-only products (keyframes dict,
    render meshes with faces) that don't belong on the jitted model.

    ccd_manifolds=True additionally packs exact (non-decimated) convex hulls
    and coplanar-merged face polygons for every pair MuJoCo resolves with its
    native convex collider, and switches the per-env collide path to
    multi-point manifold contacts (ops/collision/manifold.py) — the strict
    parity configuration.  The batched f32 throughput path is unaffected.
    """
    import jax

    doc = mjcf.parse_mjcf(path)
    # Build on host: the model is tiny; callers jax.device_put it (or just
    # close over it in jitted code, which transfers it once at compile time).
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return _build(doc, max_contacts, keep_visual, ccd_manifolds)


def _dfs(body: mjcf.Body):
    """Yield bodies in MuJoCo's DFS pre-order (world first)."""
    yield body
    for c in body.children:
        yield from _dfs(c)


def _build(
    doc: mjcf.MjcfDoc, max_contacts: int, keep_visual: bool,
    ccd_manifolds: bool = False,
) -> tuple[Model, dict]:
    bodies = list(_dfs(doc.worldbody))
    nbody = len(bodies)
    body_index = {id(b): i for i, b in enumerate(bodies)}
    body_name_to_id = {b.name: i for i, b in enumerate(bodies)}

    body_parentid = [0] * nbody
    for i, b in enumerate(bodies):
        for c in b.children:
            body_parentid[body_index[id(c)]] = i

    # ---- joints / dofs ----
    jnt_type, jnt_bodyid, jnt_axis, jnt_pos, jnt_range, jnt_limited = [], [], [], [], [], []
    jnt_qposadr, jnt_dofadr, jnt_names = [], [], []
    body_jntadr = [-1] * nbody
    body_jntnum = [0] * nbody
    dof_bodyid, dof_jntid, dof_armature, dof_damping, dof_frictionloss = [], [], [], [], []
    nq = nv = 0
    for bi, b in enumerate(bodies):
        if b.joints:
            body_jntadr[bi] = len(jnt_type)
            body_jntnum[bi] = len(b.joints)
        for j in b.joints:
            code = _JNT_CODE[j.type]
            jnt_type.append(code)
            jnt_bodyid.append(bi)
            jnt_axis.append(j.axis)
            jnt_pos.append(j.pos)
            jnt_range.append(j.range)
            jnt_limited.append(bool(j.limited))
            jnt_names.append(j.name)
            jnt_qposadr.append(nq)
            jnt_dofadr.append(nv)
            ndof = {JNT_FREE: 6, JNT_HINGE: 1, JNT_SLIDE: 1}[code]
            nqj = {JNT_FREE: 7, JNT_HINGE: 1, JNT_SLIDE: 1}[code]
            for _ in range(ndof):
                dof_bodyid.append(bi)
                dof_jntid.append(len(jnt_type) - 1)
                dof_armature.append(j.armature)
                dof_damping.append(j.damping)
                dof_frictionloss.append(j.frictionloss)
            nq += nqj
            nv += ndof

    # ---- weld ids (body welded to parent when jointless) ----
    body_weldid = [0] * nbody
    for bi in range(1, nbody):
        body_weldid[bi] = bi if body_jntnum[bi] > 0 else body_weldid[body_parentid[bi]]

    # ---- mocap ----
    body_mocapid = [-1] * nbody
    nmocap = 0
    for bi, b in enumerate(bodies):
        if b.mocap:
            body_mocapid[bi] = nmocap
            nmocap += 1

    # ---- geoms (with mesh->box canonicalization) ----
    g_type, g_bodyid, g_pos, g_quat, g_size = [], [], [], [], []
    g_friction, g_solref, g_solimp, g_condim, g_rgba = [], [], [], [], []
    g_contype, g_conaffinity, g_names, g_meshname = [], [], [], []
    g_origmesh = []  # original MJCF type was "mesh" (pre box-canonicalization)
    render_geoms = []  # aux info incl. visual-only geoms for the rasterizer
    for bi, b in enumerate(bodies):
        for g in b.geoms:
            collidable = g.contype != 0 or g.conaffinity != 0
            gtype = _GEOM_CODE[g.type]
            pos, quat, size, meshname = g.pos, g.quat, g.size, g.mesh
            if gtype == GEOM_MESH:
                mesh = doc.meshes[g.mesh]
                box = _detect_box(mesh.verts)
                if box is not None:
                    center, half = box
                    pos = g.pos + _qrot(g.quat, center)
                    size = half
                    gtype = GEOM_BOX
                    meshname = None
            render_geoms.append(
                dict(body=bi, type=g.type, mesh=g.mesh, pos=g.pos, quat=g.quat,
                     size=g.size, rgba=g.rgba, group=g.group, name=g.name)
            )
            if not collidable and not keep_visual:
                continue
            if not collidable:
                continue
            g_type.append(gtype)
            g_bodyid.append(bi)
            g_pos.append(pos)
            g_quat.append(quat)
            g_size.append(size)
            g_friction.append(g.friction)
            g_solref.append(g.solref)
            g_solimp.append(g.solimp)
            g_condim.append(g.condim)
            g_rgba.append(g.rgba)
            g_contype.append(g.contype)
            g_conaffinity.append(g.conaffinity)
            g_names.append(g.name)
            g_meshname.append(meshname)
            g_origmesh.append(g.type == "mesh")
    ngeom = len(g_type)

    # ---- pack collision-mesh convex hulls ----
    # MuJoCo collides meshes by their convex hull (mesh_graph); we compute the
    # hull at build time (qhull) and decimate large hulls to <= HULL_MAX
    # support vertices so batched GJK support lookups stay cheap on TPU.
    mesh_vert_list = []
    geom_vertadr = [-1] * ngeom
    geom_vertnum = [0] * ngeom
    geom_meshid = [-1] * ngeom
    mesh_ids = {}
    for gi in range(ngeom):
        mn = g_meshname[gi]
        if mn is None:
            continue
        if mn not in mesh_ids:
            hull = _convex_hull(doc.meshes[mn].verts)
            vadr = sum(len(v) for v in mesh_vert_list)
            mesh_ids[mn] = (len(mesh_ids), vadr, len(hull))
            mesh_vert_list.append(hull)
        mid, vadr, vnum = mesh_ids[mn]
        geom_meshid[gi] = mid
        geom_vertadr[gi] = vadr
        geom_vertnum[gi] = vnum
    mesh_verts = (
        np.concatenate(mesh_vert_list, axis=0) if mesh_vert_list else np.zeros((0, 3))
    )

    # ---- sites / cameras ----
    s_bodyid, s_pos, s_quat, s_names = [], [], [], []
    c_bodyid, c_pos, c_quat, c_fovy, c_mode, c_target, c_names = [], [], [], [], [], [], []
    for bi, b in enumerate(bodies):
        for st in b.sites:
            s_bodyid.append(bi)
            s_pos.append(st.pos)
            s_quat.append(st.quat)
            s_names.append(st.name)
        for cam in b.cameras:
            c_bodyid.append(bi)
            c_pos.append(cam.pos)
            c_quat.append(cam.quat)
            c_fovy.append(cam.fovy)
            c_mode.append(cam.mode)
            c_target.append(cam.target)
            c_names.append(cam.name)
    cam_targetbodyid = tuple(
        body_name_to_id[t] if t is not None else -1 for t in c_target
    )

    # ---- inertials ----
    body_mass = np.zeros(nbody)
    body_ipos = np.zeros((nbody, 3))
    body_iquat = np.tile(np.array([1.0, 0, 0, 0]), (nbody, 1))
    body_inertia = np.zeros((nbody, 3))
    for bi, b in enumerate(bodies):
        if b.inertial is not None:
            body_mass[bi] = b.inertial.mass
            body_ipos[bi] = b.inertial.pos
            body_iquat[bi] = b.inertial.quat
            body_inertia[bi] = b.inertial.diaginertia
        elif bi > 0 and body_jntnum[bi] == 0:
            # massless jointless body: MuJoCo's compiled ipos equals the
            # body's pos-in-parent (observed on vx300s_left/camera_focus of
            # the reference arm); only body_invweight0 depends on this
            body_ipos[bi] = b.pos
        elif body_jntnum[bi] > 0:
            # A jointed body without explicit inertial would need mass
            # computed from geom volumes; no such body exists in the SO100
            # scenes (jointless/welded bodies may be massless).
            raise NotImplementedError(
                f"body {b.name!r} is jointed but has no <inertial>"
            )

    # ---- actuators ----
    jnt_name_to_id = {n: i for i, n in enumerate(jnt_names)}
    a_dofid, a_kp, a_kv_spec, a_dampratio, a_fr, a_cr, a_names = [], [], [], [], [], [], []
    a_bias0, a_bias1 = [], []
    for a in doc.actuators:
        ji = jnt_name_to_id[a.joint]
        a_dofid.append(jnt_dofadr[ji])
        a_kp.append(a.kp)
        a_kv_spec.append(a.kv)
        a_dampratio.append(a.dampratio)
        # MuJoCo semantics: a (0, 0) force/ctrl range means unlimited
        fr = np.asarray(a.forcerange, dtype=float)
        if fr[0] == 0.0 and fr[1] == 0.0:
            fr = np.array([-np.inf, np.inf])
        a_fr.append(fr)
        cr = np.array(jnt_range[ji]) if a.inheritrange else np.asarray(
            a.ctrlrange, dtype=float
        )
        if cr[0] == 0.0 and cr[1] == 0.0:
            cr = np.array([-np.inf, np.inf])
        a_cr.append(cr)
        a_names.append(a.name)
        # affine bias: force = kp*ctrl + bias0 + bias1*length - kv*velocity.
        # position actuators: bias = (0, -kp); general: biasprm[:2]
        # (franka_emika_panda/panda_ee.xml:268-285)
        if a.kind == "general":
            a_bias0.append(float(a.biasprm[0]))
            a_bias1.append(float(a.biasprm[1]))
        else:
            a_bias0.append(0.0)
            a_bias1.append(-a.kp)
    nu = len(a_dofid)

    # ---- joint equality couplings ----
    jeq = doc.joint_eqs
    jeq_q1 = tuple(jnt_qposadr[jnt_name_to_id[e.joint1]] for e in jeq)
    jeq_q2 = tuple(jnt_qposadr[jnt_name_to_id[e.joint2]] for e in jeq)
    jeq_v1 = tuple(jnt_dofadr[jnt_name_to_id[e.joint1]] for e in jeq)
    jeq_v2 = tuple(jnt_dofadr[jnt_name_to_id[e.joint2]] for e in jeq)

    # ---- qpos0 ----
    qpos0 = np.zeros(nq)
    for ji in range(len(jnt_type)):
        if jnt_type[ji] == JNT_FREE:
            adr = jnt_qposadr[ji]
            b = jnt_bodyid[ji]
            qpos0[adr : adr + 3] = bodies[b].pos
            qpos0[adr + 3 : adr + 7] = bodies[b].quat

    # ---- collision pairs ----
    pairs = _collision_pairs(
        ngeom, g_type, g_bodyid, g_contype, g_conaffinity,
        body_weldid, body_parentid, doc.excludes, body_name_to_id, g_meshname,
    )
    pair_list = pairs.box_box + pairs.hull_box + pairs.hull_hull
    np_pairs = len(pair_list)
    pair_friction = np.zeros((np_pairs, 3))
    pair_solref = np.zeros((np_pairs, 2))
    pair_solimp = np.zeros((np_pairs, 5))
    pair_condim = []
    pair_margin = np.zeros(np_pairs)
    for pi, (g1, g2) in enumerate(pair_list):
        pair_friction[pi] = np.maximum(g_friction[g1], g_friction[g2])
        pair_solref[pi] = 0.5 * (np.asarray(g_solref[g1]) + np.asarray(g_solref[g2]))
        pair_solimp[pi] = 0.5 * (np.asarray(g_solimp[g1]) + np.asarray(g_solimp[g2]))
        pair_condim.append(max(g_condim[g1], g_condim[g2]))

    # ---- hull-pair collision blocks (vmap-safe packed layout) ----
    HULL_BLOCK = 64
    hull_geoms = sorted({g for p in pairs.hull_box + pairs.hull_hull for g in p})
    hull_start = [-1] * ngeom
    blocks, lcens, lhalves = [], [], []
    for hg in hull_geoms:
        if g_type[hg] == GEOM_BOX:
            corners = np.array(
                [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                dtype=np.float64,
            )
            v = np.asarray(g_size[hg])[None] * corners
        else:
            adr, num = geom_vertadr[hg], geom_vertnum[hg]
            v = mesh_verts[adr : adr + num]
        assert len(v) <= HULL_BLOCK, (hg, len(v))
        hull_start[hg] = len(blocks) * HULL_BLOCK
        blocks.append(np.concatenate([v, np.tile(v[:1], (HULL_BLOCK - len(v), 1))]))
        lo_, hi_ = v.min(0), v.max(0)
        lcens.append((lo_ + hi_) / 2)
        lhalves.append((hi_ - lo_) / 2)
    hull_vertsT = (
        np.concatenate(blocks).T if blocks else np.zeros((3, 0))
    )
    hull_lcen = np.asarray(lcens) if lcens else np.zeros((0, 3))
    hull_lhalf = np.asarray(lhalves) if lhalves else np.zeros((0, 3))

    # ---- exact-hull manifold tables (nativeccd parity path) ----
    # MuJoCo resolves every pair that involves an (original) mesh geom with
    # its native convex collider; the strict-parity path mirrors that pair
    # set with full (non-decimated) hulls + coplanar-merged face polygons
    # (ops/collision/manifold.py).  Canonicalized box geoms (e.g. the table
    # mesh) and analytic boxes paired against meshes get synthetic 8-corner
    # hulls with 6 quad faces.
    exact_verts = np.zeros((0, 0, 3))
    exact_polyn = np.zeros((0, 0, 3))
    exact_polyvid = np.zeros((0, 0, 0), dtype=np.int32)
    exact_polynv = np.zeros((0, 0), dtype=np.int32)
    exact_nvert = ()
    if ccd_manifolds:
        from . import hullpoly

        flat_id = {pg: i for i, pg in enumerate(pair_list)}
        ccd_list = [
            pg for pg in pair_list if g_origmesh[pg[0]] or g_origmesh[pg[1]]
        ]
        xgeoms = sorted({g for pg in ccd_list for g in pg})
        xslot = {g: i for i, g in enumerate(xgeoms)}
        hv_list, poly_list = [], []
        for g in xgeoms:
            if g_meshname[g] is not None:
                hv, polys = hullpoly.hull_polygons(
                    doc.meshes[g_meshname[g]].verts
                )
            else:
                hv, polys = hullpoly.box_polygons(np.asarray(g_size[g]))
            hv_list.append(np.asarray(hv, np.float64))
            poly_list.append(polys)
        VX = max(len(h) for h in hv_list)
        PX = max(len(p) for p in poly_list)
        PVX = max(max(len(loop) for _, loop in p) for p in poly_list)
        GX = len(xgeoms)
        exact_verts = np.zeros((GX, VX, 3))
        exact_polyn = np.zeros((GX, PX, 3))
        exact_polyvid = np.zeros((GX, PX, PVX), dtype=np.int32)
        exact_polynv = np.zeros((GX, PX), dtype=np.int32)
        nvert = []
        for i, (hv, polys_i) in enumerate(zip(hv_list, poly_list)):
            exact_verts[i, : len(hv)] = hv
            exact_verts[i, len(hv):] = hv[0]  # support-safe padding
            nvert.append(len(hv))
            for pi, (pnrm, loop) in enumerate(polys_i):
                exact_polyn[i, pi] = pnrm
                exact_polyvid[i, pi, : len(loop)] = loop
                exact_polynv[i, pi] = len(loop)
        exact_nvert = tuple(nvert)
        import dataclasses as _dc

        pairs = _dc.replace(
            pairs,
            ccd=tuple(
                (pg[0], pg[1], flat_id[pg], xslot[pg[0]], xslot[pg[1]])
                for pg in ccd_list
            ),
        )

    import jax.numpy as jnp

    f = lambda x: jnp.asarray(np.asarray(x, dtype=np.float64))

    model = Model(
        nq=nq, nv=nv, nu=nu, nbody=nbody, ngeom=ngeom,
        nsite=len(s_bodyid), ncam=len(c_bodyid), nmocap=nmocap,
        body_parentid=tuple(body_parentid),
        body_jntadr=tuple(body_jntadr),
        body_jntnum=tuple(body_jntnum),
        body_weldid=tuple(body_weldid),
        body_mocapid=tuple(body_mocapid),
        jnt_type=tuple(jnt_type),
        jnt_bodyid=tuple(jnt_bodyid),
        jnt_qposadr=tuple(jnt_qposadr),
        jnt_dofadr=tuple(jnt_dofadr),
        jnt_limited=tuple(jnt_limited),
        dof_bodyid=tuple(dof_bodyid),
        dof_jntid=tuple(dof_jntid),
        geom_type=tuple(g_type),
        geom_bodyid=tuple(g_bodyid),
        geom_condim=tuple(g_condim),
        geom_meshid=tuple(geom_meshid),
        geom_vertadr=tuple(geom_vertadr),
        geom_vertnum=tuple(geom_vertnum),
        site_bodyid=tuple(s_bodyid),
        cam_bodyid=tuple(c_bodyid),
        cam_mode=tuple(c_mode),
        cam_targetbodyid=cam_targetbodyid,
        actuator_dofid=tuple(a_dofid),
        names_body=tuple(b.name for b in bodies),
        names_joint=tuple(jnt_names),
        names_geom=tuple(g_names),
        names_site=tuple(s_names),
        names_cam=tuple(c_names),
        names_actuator=tuple(a_names),
        timestep=doc.option.timestep,
        impratio=doc.option.impratio,
        cone=doc.option.cone,
        solver_iterations=doc.option.iterations,
        solver_tolerance=doc.option.tolerance,
        ls_iterations=doc.option.ls_iterations,
        pairs=pairs,
        max_contacts=max_contacts,
        fl_dofs=tuple(i for i in range(nv) if dof_frictionloss[i] > 0),
        hull_start=tuple(hull_start),
        eq_site1=tuple(s_names.index(w.site1) for w in doc.welds),
        eq_site2=tuple(s_names.index(w.site2) for w in doc.welds),
        eq_jnt_q1=jeq_q1,
        eq_jnt_q2=jeq_q2,
        eq_jnt_v1=jeq_v1,
        eq_jnt_v2=jeq_v2,
        gravity=f(doc.option.gravity),
        body_pos=f([b.pos for b in bodies]),
        body_quat=f([b.quat for b in bodies]),
        body_ipos=f(body_ipos),
        body_iquat=f(body_iquat),
        body_mass=f(body_mass),
        body_inertia=f(body_inertia),
        body_invweight0=f(np.zeros((nbody, 2))),
        jnt_axis=f(jnt_axis) if jnt_axis else f(np.zeros((0, 3))),
        jnt_pos=f(jnt_pos) if jnt_pos else f(np.zeros((0, 3))),
        jnt_range=f(jnt_range) if jnt_range else f(np.zeros((0, 2))),
        jnt_solref=f(np.tile(_DEFAULT_SOLREF, (len(jnt_type), 1))),
        jnt_solimp=f(np.tile(_DEFAULT_SOLIMP, (len(jnt_type), 1))),
        dof_armature=f(dof_armature),
        dof_damping=f(dof_damping),
        dof_frictionloss=f(dof_frictionloss),
        dof_invweight0=f(np.zeros(nv)),
        dof_solref=f(np.tile(_DEFAULT_SOLREF, (nv, 1))),
        dof_solimp=f(np.tile(_DEFAULT_SOLIMP, (nv, 1))),
        geom_pos=f(g_pos) if g_pos else f(np.zeros((0, 3))),
        geom_quat=f(g_quat) if g_quat else f(np.zeros((0, 4))),
        geom_size=f(g_size) if g_size else f(np.zeros((0, 3))),
        geom_friction=f(g_friction) if g_friction else f(np.zeros((0, 3))),
        geom_solref=f(g_solref) if g_solref else f(np.zeros((0, 2))),
        geom_solimp=f(g_solimp) if g_solimp else f(np.zeros((0, 5))),
        geom_rgba=f(g_rgba) if g_rgba else f(np.zeros((0, 4))),
        mesh_verts=f(mesh_verts),
        exact_verts=f(exact_verts),
        exact_polyn=f(exact_polyn),
        exact_polyvid=jnp.asarray(exact_polyvid),
        exact_polynv=jnp.asarray(exact_polynv),
        exact_nvert=exact_nvert,
        site_pos=f(s_pos) if s_pos else f(np.zeros((0, 3))),
        site_quat=f(s_quat) if s_quat else f(np.zeros((0, 4))),
        cam_pos=f(c_pos) if c_pos else f(np.zeros((0, 3))),
        cam_quat=f(c_quat) if c_quat else f(np.zeros((0, 4))),
        cam_fovy=f(c_fovy) if c_fovy else f(np.zeros(0)),
        actuator_kp=f(a_kp) if a_kp else f(np.zeros(0)),
        actuator_kv=f(np.zeros(nu)),
        actuator_bias0=f(a_bias0) if a_bias0 else f(np.zeros(0)),
        actuator_bias1=f(a_bias1) if a_bias1 else f(np.zeros(0)),
        actuator_forcerange=f(a_fr) if a_fr else f(np.zeros((0, 2))),
        actuator_ctrlrange=f(a_cr) if a_cr else f(np.zeros((0, 2))),
        qpos0=f(qpos0),
        pair_friction=f(pair_friction),
        pair_solref=f(pair_solref),
        pair_solimp=f(pair_solimp),
        pair_condim=tuple(pair_condim),
        pair_margin=f(pair_margin),
        hull_vertsT=f(hull_vertsT),
        hull_lcen=f(hull_lcen),
        hull_lhalf=f(hull_lhalf),
        eq_solref=f([w.solref for w in doc.welds]) if doc.welds else f(np.zeros((0, 2))),
        eq_solimp=f([w.solimp for w in doc.welds]) if doc.welds else f(np.zeros((0, 5))),
        eq_jnt_poly=f([e.polycoef for e in jeq]) if jeq else f(np.zeros((0, 5))),
        eq_jnt_solref=f([e.solref for e in jeq]) if jeq else f(np.zeros((0, 2))),
        eq_jnt_solimp=f([e.solimp for e in jeq]) if jeq else f(np.zeros((0, 5))),
    )

    model = _compute_derived(model, a_kp, a_kv_spec, a_dampratio)

    aux = dict(
        keyframes={k.name: (k.qpos, k.ctrl) for k in doc.keyframes},
        meshes=doc.meshes,
        render_geoms=render_geoms,
        welds=doc.welds,
    )
    return model, aux


def _compute_derived(model: Model, kp, kv_spec, dampratio) -> Model:
    """Fill kv-from-dampratio, dof/body invweight0 via the smooth dynamics at
    qpos0 (mirrors MuJoCo compiler's mj_setConst stage).

    Build-time math is pinned to the host CPU backend: it is a handful of
    tiny unjitted ops, and dispatching them one-by-one to a (possibly remote)
    TPU turns a <1s build into minutes.
    """
    import dataclasses
    import jax
    import jax.numpy as jnp

    from ..ops import smooth
    from .scene import State

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return _compute_derived_on_host(model, kp, kv_spec, dampratio)


def _compute_derived_on_host(model: Model, kp, kv_spec, dampratio) -> Model:
    import dataclasses
    import jax.numpy as jnp

    from ..ops import smooth
    from .scene import State

    import jax

    ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    nq, nv, nu = model.nq, model.nv, model.nu
    s0 = State(
        qpos=model.qpos0,
        qvel=jnp.zeros(nv, dtype=ftype),
        ctrl=jnp.zeros(nu, dtype=ftype),
        mocap_pos=jnp.zeros((model.nmocap, 3), dtype=ftype),
        mocap_quat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=ftype), (model.nmocap, 1)),
    )
    d = smooth.kinematics(model, s0)
    d, cinr = smooth.com_quantities(model, d)
    d = smooth.crba(model, d, cinr)
    qM = np.asarray(d.qM)
    model = dataclasses.replace(
        model, stat_meaninertia=float(np.trace(qM) / model.nv)
    )
    Minv = np.linalg.inv(qM)
    dof_invweight0 = np.diag(Minv)

    # body invweight0: mean diagonal of J M^-1 J^T for point jacobian at xipos
    # (translation) and rotation jacobian, like mj_setConst.
    xipos = np.asarray(d.xipos)
    cdof = np.asarray(d.cdof)
    subtree_com = np.asarray(d.subtree_com)
    body_invw = np.zeros((model.nbody, 2))
    for b in range(1, model.nbody):
        if model.body_weldid[b] == 0:
            continue
        Jt = np.zeros((3, nv))
        Jr = np.zeros((3, nv))
        # dofs on chain from b to root
        bb = b
        chain = []
        while bb != 0:
            ja, jn = model.body_jntadr[bb], model.body_jntnum[bb]
            for ji in range(ja, ja + jn):
                base = model.jnt_dofadr[ji]
                n = 6 if model.jnt_type[ji] == 0 else 1
                chain.extend(range(base, base + n))
            bb = model.body_parentid[bb]
        offset = xipos[b] - subtree_com[0]
        for i in chain:
            ang = cdof[i, :3]
            lin = cdof[i, 3:] + np.cross(ang, offset)
            Jt[:, i] = lin
            Jr[:, i] = ang
        At = Jt @ Minv @ Jt.T
        Ar = Jr @ Minv @ Jr.T
        body_invw[b, 0] = np.trace(At) / 3.0
        body_invw[b, 1] = np.trace(Ar) / 3.0

    # kv from dampratio (MuJoCo compiler rule, validated vs oracle):
    # kv = 2 * dampratio * sqrt(kp * M_ii(qpos0)), M including armature.
    kv = np.zeros(nu)
    for ai in range(nu):
        if kv_spec[ai] != 0:
            kv[ai] = kv_spec[ai]
        elif dampratio[ai] > 0:
            i = model.actuator_dofid[ai]
            kv[ai] = 2.0 * dampratio[ai] * np.sqrt(kp[ai] * qM[i, i])

    import jax.numpy as jnp
    return dataclasses.replace(
        model,
        dof_invweight0=jnp.asarray(dof_invweight0),
        body_invweight0=jnp.asarray(body_invw),
        actuator_kv=jnp.asarray(kv),
    )


HULL_MAX = 64


def _convex_hull(verts: np.ndarray) -> np.ndarray:
    """Convex hull vertices, decimated to <= HULL_MAX support points.

    Decimation keeps the argmax-support vertex along a Fibonacci-sphere
    direction set, which bounds the support-function error for the GJK
    narrowphase while keeping vert counts TPU-friendly."""
    from scipy.spatial import ConvexHull

    if len(verts) > 3:
        try:
            hull = verts[np.unique(ConvexHull(verts).vertices)]
        except Exception:
            hull = verts
    else:
        hull = verts
    if len(hull) <= HULL_MAX:
        return np.asarray(hull, dtype=np.float64)
    # Fibonacci sphere directions
    n = 4 * HULL_MAX
    i = np.arange(n)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1 - 2 * (i + 0.5) / n
    r = np.sqrt(np.maximum(0, 1 - y * y))
    dirs = np.stack([r * np.cos(phi * i), y, r * np.sin(phi * i)], -1)
    support = np.unique(np.argmax(dirs @ hull.T, axis=1))
    pts = hull[support]
    if len(pts) > HULL_MAX:
        # greedy farthest-point thinning
        keep = [0]
        d = np.linalg.norm(pts - pts[0], axis=1)
        for _ in range(HULL_MAX - 1):
            j = int(np.argmax(d))
            keep.append(j)
            d = np.minimum(d, np.linalg.norm(pts - pts[j], axis=1))
        pts = pts[sorted(keep)]
    return np.asarray(pts, dtype=np.float64)


def _detect_box(verts: np.ndarray):
    """If the vertex set is exactly the 8 corners of an axis-aligned box in
    mesh frame, return (center, half_extents); else None."""
    if len(verts) != 8:
        return None
    lo, hi = verts.min(0), verts.max(0)
    center, half = (lo + hi) / 2, (hi - lo) / 2
    if np.any(half <= 0):
        return None
    corners = center + half * np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    d = np.abs(verts[:, None, :] - corners[None, :, :]).sum(-1)
    # every corner matched by exactly one vertex
    if (d.min(0) < 1e-9 * max(1.0, np.abs(hi).max())).all():
        return center, half
    return None


def _qrot(q, v):
    w, x, y, z = q
    t = 2 * np.cross([x, y, z], v)
    return v + w * t + np.cross([x, y, z], t)


def _collision_pairs(
    ngeom, g_type, g_bodyid, g_contype, g_conaffinity,
    body_weldid, body_parentid, excludes, body_name_to_id, g_meshname,
) -> CollisionPairs:
    """Enumerate candidate pairs with MuJoCo's filtering semantics."""
    excl = set()
    for b1, b2 in excludes:
        i, j = body_name_to_id[b1], body_name_to_id[b2]
        excl.add((min(i, j), max(i, j)))

    box_box, hull_box, hull_hull = [], [], []
    for a in range(ngeom):
        for b in range(a + 1, ngeom):
            b1, b2 = g_bodyid[a], g_bodyid[b]
            if b1 == b2:
                continue
            w1, w2 = body_weldid[b1], body_weldid[b2]
            if w1 == w2:
                continue
            # parent-child filter (world-exempt), on weld bodies
            wp1 = body_weldid[body_parentid[w1]] if w1 else 0
            wp2 = body_weldid[body_parentid[w2]] if w2 else 0
            if w1 != 0 and w2 != 0 and (wp1 == w2 or wp2 == w1):
                continue
            if (min(b1, b2), max(b1, b2)) in excl:
                continue
            if not (
                (g_contype[a] & g_conaffinity[b])
                or (g_contype[b] & g_conaffinity[a])
            ):
                continue
            t1, t2 = g_type[a], g_type[b]
            if t1 == GEOM_BOX and t2 == GEOM_BOX:
                box_box.append((a, b))
            elif t1 == GEOM_MESH and t2 == GEOM_BOX:
                hull_box.append((a, b))
            elif t1 == GEOM_BOX and t2 == GEOM_MESH:
                hull_box.append((b, a))  # mesh first
            elif t1 == GEOM_MESH and t2 == GEOM_MESH:
                hull_hull.append((a, b))
            else:
                raise NotImplementedError(
                    f"collision pair types {t1},{t2} not supported"
                )
    return CollisionPairs(
        box_box=tuple(box_box),
        hull_box=tuple(hull_box),
        hull_hull=tuple(hull_hull),
    )
