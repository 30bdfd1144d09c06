"""Static scene model and dynamic state pytrees for the TPU physics core.

`Model` is the compile-time product of the MJCF builder: every array is a jnp
array of static shape, every structural quantity (tree topology, joint
addressing, collision pair table) is a hashable Python tuple stored as pytree
metadata, so a jitted function specializes on the structure and traces only
the numerics.  This is the TPU-native replacement for the MuJoCo mjModel the
reference loads via dm_control (/root/reference/gym_so100/env.py:97-98).

`State` is the minimal dynamic state carried across steps (qpos/qvel/ctrl);
`Data` holds per-step derived quantities (FK results, contacts, forces) that
tasks consume for observations and rewards.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

# Geom type codes (subset of MJCF geom types we support).
GEOM_PLANE = 0
GEOM_SPHERE = 2
GEOM_CAPSULE = 3
GEOM_CYLINDER = 5
GEOM_BOX = 6
GEOM_MESH = 7

# Joint type codes.
JNT_FREE = 0
JNT_BALL = 1
JNT_SLIDE = 2
JNT_HINGE = 3


def _pytree(cls):
    """Register a dataclass as a pytree; fields with metadata static=True are
    aux data (must be hashable)."""
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


def static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@_pytree
@dataclass(frozen=True)
class CollisionPairs:
    """Precomputed static collision pair table, grouped by collider kind.

    Each group is a tuple of (geom1, geom2) index pairs; per-pair mixed contact
    parameters (friction, solref, solimp, condim) live in the aligned arrays of
    the Model (indexed by a flat pair id = offset of group + index in group).
    MuJoCo's broadphase is replaced by this static table + cheap AABB culling
    masks at runtime; the *set* of candidate pairs is identical to what
    MuJoCo's filter produces (contype/conaffinity, weld and parent filtering,
    explicit excludes; see engine semantics notes in builder.py).
    """

    box_box: tuple = static(default=())      # box/box (incl. meshes canonicalized to boxes)
    hull_box: tuple = static(default=())     # convex mesh vs box (mesh first)
    hull_hull: tuple = static(default=())    # convex mesh vs convex mesh
    # strict-parity manifold pairs: every pair MuJoCo resolves with its
    # native convex collider (at least one original mesh geom).  Entries are
    # (geom1, geom2, flat_pair_id, exact_slot1, exact_slot2); populated only
    # by build_model(ccd_manifolds=True) and consumed by
    # ops/collision/manifold.py — empty tuple selects the legacy
    # single-point hull path.
    ccd: tuple = static(default=())


@_pytree
@dataclass(frozen=True)
class Model:
    # --- sizes and topology (static) ---
    nq: int = static(default=0)
    nv: int = static(default=0)
    nu: int = static(default=0)
    nbody: int = static(default=0)
    ngeom: int = static(default=0)
    nsite: int = static(default=0)
    ncam: int = static(default=0)
    nmocap: int = static(default=0)
    body_parentid: tuple = static(default=())
    body_jntadr: tuple = static(default=())   # first joint id per body (-1 none)
    body_jntnum: tuple = static(default=())
    body_weldid: tuple = static(default=())
    body_mocapid: tuple = static(default=())  # -1 if not mocap
    jnt_type: tuple = static(default=())
    jnt_bodyid: tuple = static(default=())
    jnt_qposadr: tuple = static(default=())
    jnt_dofadr: tuple = static(default=())
    jnt_limited: tuple = static(default=())
    dof_bodyid: tuple = static(default=())
    dof_jntid: tuple = static(default=())
    geom_type: tuple = static(default=())
    geom_bodyid: tuple = static(default=())
    geom_condim: tuple = static(default=())
    geom_meshid: tuple = static(default=())   # -1 if primitive
    geom_vertadr: tuple = static(default=())  # into packed mesh_verts (-1 primitive)
    geom_vertnum: tuple = static(default=())
    site_bodyid: tuple = static(default=())
    cam_bodyid: tuple = static(default=())
    cam_mode: tuple = static(default=())      # "fixed" | "targetbody"
    cam_targetbodyid: tuple = static(default=())
    actuator_dofid: tuple = static(default=())  # joint transmission -> dof index
    names_body: tuple = static(default=())
    names_joint: tuple = static(default=())
    names_geom: tuple = static(default=())
    names_site: tuple = static(default=())
    names_cam: tuple = static(default=())
    names_actuator: tuple = static(default=())
    # options (static: they select compiled code paths / constants)
    timestep: float = static(default=0.002)
    impratio: float = static(default=1.0)
    cone: str = static(default="pyramidal")
    solver_iterations: int = static(default=100)
    solver_tolerance: float = static(default=1e-8)
    ls_iterations: int = static(default=50)
    pairs: CollisionPairs = static(default_factory=CollisionPairs)
    max_contacts: int = static(default=32)
    stat_meaninertia: float = static(default=1.0)  # trace(M(qpos0))/nv
    fl_dofs: tuple = static(default=())  # dofs with frictionloss > 0
    # hull-pair collision blocks (built in builder; see narrowphase)
    hull_start: tuple = static(default=())  # per-geom block offset (-1 none)
    # weld equality constraints (site pairs), static ids
    eq_site1: tuple = static(default=())
    eq_site2: tuple = static(default=())
    # joint equality couplings q1 - q01 = polycoef(q2 - q02), static addressing
    eq_jnt_q1: tuple = static(default=())   # qpos addresses of joint1
    eq_jnt_q2: tuple = static(default=())
    eq_jnt_v1: tuple = static(default=())   # dof addresses
    eq_jnt_v2: tuple = static(default=())

    # --- numeric arrays (traced) ---
    gravity: jnp.ndarray = None
    body_pos: jnp.ndarray = None      # (NB, 3) frame offset in parent
    body_quat: jnp.ndarray = None     # (NB, 4)
    body_ipos: jnp.ndarray = None     # (NB, 3) inertial frame in body
    body_iquat: jnp.ndarray = None    # (NB, 4)
    body_mass: jnp.ndarray = None     # (NB,)
    body_inertia: jnp.ndarray = None  # (NB, 3) principal inertia
    body_invweight0: jnp.ndarray = None  # (NB, 2) [trans, rot]
    jnt_axis: jnp.ndarray = None      # (NJ, 3)
    jnt_pos: jnp.ndarray = None       # (NJ, 3)
    jnt_range: jnp.ndarray = None     # (NJ, 2)
    jnt_solref: jnp.ndarray = None    # (NJ, 2) for limits
    jnt_solimp: jnp.ndarray = None    # (NJ, 5)
    dof_armature: jnp.ndarray = None  # (NV,)
    dof_damping: jnp.ndarray = None   # (NV,)
    dof_frictionloss: jnp.ndarray = None  # (NV,)
    dof_invweight0: jnp.ndarray = None    # (NV,)
    dof_solref: jnp.ndarray = None    # (NV, 2) for friction loss
    dof_solimp: jnp.ndarray = None    # (NV, 5)
    geom_pos: jnp.ndarray = None      # (NG, 3)
    geom_quat: jnp.ndarray = None     # (NG, 4)
    geom_size: jnp.ndarray = None     # (NG, 3)
    geom_friction: jnp.ndarray = None  # (NG, 3)
    geom_solref: jnp.ndarray = None   # (NG, 2)
    geom_solimp: jnp.ndarray = None   # (NG, 5)
    geom_rgba: jnp.ndarray = None     # (NG, 4)
    mesh_verts: jnp.ndarray = None    # (sum V, 3) packed hull vertices
    site_pos: jnp.ndarray = None      # (NS, 3)
    site_quat: jnp.ndarray = None     # (NS, 4)
    cam_pos: jnp.ndarray = None       # (NC, 3)
    cam_quat: jnp.ndarray = None      # (NC, 4)
    cam_fovy: jnp.ndarray = None      # (NC,)
    actuator_kp: jnp.ndarray = None   # (NU,) gain (general: gainprm[0])
    actuator_kv: jnp.ndarray = None   # (NU,) velocity damping (-biasprm[2])
    actuator_bias0: jnp.ndarray = None  # (NU,) constant bias (biasprm[0])
    actuator_bias1: jnp.ndarray = None  # (NU,) length bias; position: -kp
    actuator_forcerange: jnp.ndarray = None  # (NU, 2)
    actuator_ctrlrange: jnp.ndarray = None   # (NU, 2)
    qpos0: jnp.ndarray = None         # (NQ,)
    # per-collision-pair mixed contact params, flat over all pair groups in
    # CollisionPairs order (box_box ++ hull_box ++ hull_hull)
    pair_friction: jnp.ndarray = None  # (NP, 3)
    pair_solref: jnp.ndarray = None    # (NP, 2)
    pair_solimp: jnp.ndarray = None    # (NP, 5)
    pair_condim: tuple = static(default=())  # (NP,) python ints
    pair_margin: jnp.ndarray = None    # (NP,)
    hull_vertsT: jnp.ndarray = None   # (3, nblocks*HULL_BLOCK) packed hulls
    hull_lcen: jnp.ndarray = None     # (nblocks, 3) local AABB centers
    hull_lhalf: jnp.ndarray = None    # (nblocks, 3) local AABB half extents
    # exact-hull manifold tables (pairs.ccd; geom-frame; see builder)
    exact_verts: jnp.ndarray = None    # (GX, VX, 3) full hulls, padded
    exact_polyn: jnp.ndarray = None    # (GX, PX, 3) face polygon normals
    exact_polyvid: jnp.ndarray = None  # (GX, PX, PVX) int32 polygon vert ids
    exact_polynv: jnp.ndarray = None   # (GX, PX) int32 polygon sizes
    exact_nvert: tuple = static(default=())  # (GX,) hull vert counts
    eq_solref: jnp.ndarray = None     # (NEQ, 2)
    eq_solimp: jnp.ndarray = None     # (NEQ, 5)
    eq_jnt_poly: jnp.ndarray = None    # (NJEQ, 5) polycoef
    eq_jnt_solref: jnp.ndarray = None  # (NJEQ, 2)
    eq_jnt_solimp: jnp.ndarray = None  # (NJEQ, 5)

    def body_id(self, name: str) -> int:
        return self.names_body.index(name)

    def geom_id(self, name: str) -> int:
        return self.names_geom.index(name)

    def site_id(self, name: str) -> int:
        return self.names_site.index(name)

    def cam_id(self, name: str) -> int:
        return self.names_cam.index(name)

    def joint_id(self, name: str) -> int:
        return self.names_joint.index(name)

    def astype(self, dtype) -> "Model":
        """Cast all float arrays to dtype (f32 for throughput, f64 parity)."""
        def cast(x):
            if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x
        return jax.tree_util.tree_map(cast, self)


@_pytree
@dataclass(frozen=True)
class State:
    """Minimal dynamic state; a pytree suitable for vmap over an env batch."""

    qpos: jnp.ndarray  # (NQ,)
    qvel: jnp.ndarray  # (NV,)
    ctrl: jnp.ndarray  # (NU,)
    mocap_pos: jnp.ndarray = None   # (NMOCAP, 3)
    mocap_quat: jnp.ndarray = None  # (NMOCAP, 4)
    qacc_warmstart: jnp.ndarray = None  # (NV,) solver warmstart (MuJoCo-style)

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)


@_pytree
@dataclass(frozen=True)
class Contact:
    """Fixed-size selected contact buffer (K = model.max_contacts)."""

    dist: jnp.ndarray    # (K,) signed distance (negative = penetrating)
    pos: jnp.ndarray     # (K, 3) world midpoint
    frame: jnp.ndarray   # (K, 3, 3) rows: normal, tangent1, tangent2
    friction: jnp.ndarray  # (K, 3) slide, torsion, roll
    solref: jnp.ndarray  # (K, 2)
    solimp: jnp.ndarray  # (K, 5)
    geom1: jnp.ndarray   # (K,) int32
    geom2: jnp.ndarray   # (K,) int32
    condim: jnp.ndarray  # (K,) int32 (3 or 4 here)
    active: jnp.ndarray  # (K,) bool
    # Optional per-contact statics, precomputed by the batched narrowphase
    # so constraint assembly needs NO index gathers (serialized small-table
    # gathers by (K, B) indices were ~20% of the control step on TPU;
    # see PERF_NOTES "round 3").  None on the single-env path, where
    # constraint.py derives them from geom1/geom2 instead.
    dof_dmask: jnp.ndarray = None  # (K, nv) per-dof Jacobian sign mask
    invw_diag: jnp.ndarray = None  # (K,) body_invweight0 sum of the pair
    # Number of active narrowphase candidates BEFORE the deepest-K cull.
    # ncand > K means the fixed buffer overflowed and shallow contacts were
    # dropped — surfaced as info["ncon"] by BatchedEnv so training can see
    # saturation instead of silently losing contacts.
    ncand: jnp.ndarray = None      # () int32 (or (B,) batched)


@_pytree
@dataclass(frozen=True)
class ContactLanes:
    """Selected contact buffer in batch-last lanes form (fields (K, B)).

    The TPU throughput layout: every per-contact scalar component is its
    own (K, B) lane array (B minor — fully-utilized 8x128 tiles), so the
    narrowphase candidate selection and the constraint assembly never
    materialize (..., 3)-minor tensors or transpose the batch axis.
    Spatial components are tuples (x, y, z); `frame` is rows-major nested
    tuples fr[row][comp].  Produced by narrowphase.collide_batched_lanes,
    consumed by constraint_lanes.make_efc_from_lanes."""

    dist: jnp.ndarray     # (K, B)
    pos: tuple            # 3 x (K, B) world midpoint
    frame: tuple          # 3 x 3 x (K, B) rows: normal, t1, t2
    friction0: jnp.ndarray  # (K, B) slide
    friction1: jnp.ndarray  # (K, B) torsion
    solref0: jnp.ndarray    # (K, B)
    solref1: jnp.ndarray    # (K, B)
    solimp: tuple           # 5 x (K, B)
    geom1: jnp.ndarray    # (K, B) int32
    geom2: jnp.ndarray    # (K, B) int32
    condim: jnp.ndarray   # (K, B) int32
    active: jnp.ndarray   # (K, B) bool
    dof_dmask: tuple      # nv x (K, B) per-dof Jacobian sign mask
    invw_diag: jnp.ndarray  # (K, B)
    ncand: jnp.ndarray    # (B,) int32 active candidates before the cull


@_pytree
@dataclass(frozen=True)
class Data:
    """Per-step derived quantities (the parts of mjData the envs consume)."""

    xpos: jnp.ndarray = None        # (NB, 3) body frame origin, world
    xquat: jnp.ndarray = None       # (NB, 4)
    xipos: jnp.ndarray = None       # (NB, 3) body CoM, world
    ximat: jnp.ndarray = None       # (NB, 3, 3) inertial frame, world
    site_xpos: jnp.ndarray = None   # (NS, 3)
    site_xmat: jnp.ndarray = None   # (NS, 3, 3)
    geom_xpos: jnp.ndarray = None   # (NG, 3)
    geom_xmat: jnp.ndarray = None   # (NG, 3, 3)
    subtree_com: jnp.ndarray = None  # (NB, 3)
    cdof: jnp.ndarray = None        # (NV, 6) dof motion axes [ang, lin] about subtree com
    qM: jnp.ndarray = None          # (NV, NV) dense mass matrix
    qLD: jnp.ndarray = None         # (NV, NV) Cholesky factor of qM
    qfrc_bias: jnp.ndarray = None   # (NV,)
    qfrc_passive: jnp.ndarray = None  # (NV,)
    qfrc_actuator: jnp.ndarray = None  # (NV,)
    qfrc_smooth: jnp.ndarray = None    # (NV,)
    qacc_smooth: jnp.ndarray = None    # (NV,)
    qacc: jnp.ndarray = None           # (NV,)
    qfrc_constraint: jnp.ndarray = None  # (NV,)
    contact: Contact = None
    solver_niter: jnp.ndarray = None   # () int32
    # max active narrowphase candidates over the substeps (see Contact.ncand);
    # set by the batched control step on its position-stage Data
    ncon: jnp.ndarray = None           # () int32

    def replace(self, **kw) -> "Data":
        return dataclasses.replace(self, **kw)
