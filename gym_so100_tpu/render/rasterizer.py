"""Pure-JAX triangle rasterizer for pixel observations.

Replaces the reference's OpenGL render path (physics.render via dm_control,
/root/reference/gym_so100/tasks/single_arm.py:88-102, env.py:89).  The
reference registers its envs nondeterministic because GL renders differ
across runs (gym_so100/__init__.py:8-10), so pixel bit-parity is explicitly
out of scope — this renderer produces geometrically faithful flat-shaded
frames from the same cameras/fovy/poses, entirely on-device (this image has
no GL at all), jit/vmap-able for batched pixel observations.

Design: triangle soup packed at build time (visual meshes decimated by
vertex clustering), per-vertex body ids; at render time vertices are posed
by FK, projected by a look-at pinhole camera (model cameras incl.
targetbody mode), and rasterized by a z-buffered edge-function pass chunked
over triangles so memory stays O(chunk * pixels).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..models.scene import Model, State
from ..ops import quat as quat_ops
from ..ops import smooth

TRI_CHUNK = 1024


def _quat_rot_np(q, v):
    w, x, y, z = q
    t = 2 * np.cross([x, y, z], v)
    return v + w * t + np.cross([x, y, z], t)


def _decimate(verts, faces, target):
    """Vertex-clustering decimation to <= target triangles."""
    if len(faces) <= target:
        return verts, faces
    lo_, hi_ = verts.min(0), verts.max(0)
    diag = np.linalg.norm(hi_ - lo_) + 1e-9
    cell = diag / 64
    for _ in range(24):
        snapped = np.round(verts / cell)
        uniq, inv = np.unique(snapped, axis=0, return_inverse=True)
        f = inv[faces]
        ok = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        f = f[ok]
        # drop duplicate triangles regardless of winding order
        key = np.sort(f, axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        f = f[np.sort(first)]
        if len(f) <= target:
            # new vertex positions: mean of clustered verts
            nv = np.zeros((len(uniq), 3))
            cnt = np.zeros(len(uniq))
            np.add.at(nv, inv, verts)
            np.add.at(cnt, inv, 1)
            nv /= cnt[:, None]
            return nv, f
        cell *= 1.5
    return nv, f  # pragma: no cover


class Renderer:
    """Flat-shaded rasterizer bound to a compiled Model.

    `tri_chunk` bounds the per-pass (chunk x pixels) working set; lower it
    for vmapped batched rendering so the edge-function tensors stay small
    per env lane."""

    def __init__(self, m: Model, aux: dict, max_tris_per_mesh=700,
                 tri_chunk=TRI_CHUNK):
        self._m = m
        self._tri_chunk = tri_chunk
        verts_l, vbody_l, faces_l, fcol_l = [], [], [], []
        voff = 0
        body_name_to_id = {n: i for i, n in enumerate(m.names_body)}
        for g in aux["render_geoms"]:
            rgba = np.asarray(g["rgba"], dtype=np.float64)
            if g.get("group", 0) not in (0, 1, 2) or rgba[3] <= 0.1:
                continue
            if g["type"] == "mesh":
                mesh = aux["meshes"][g["mesh"]]
                v, f = _decimate(
                    np.asarray(mesh.verts), np.asarray(mesh.faces),
                    max_tris_per_mesh,
                )
            elif g["type"] == "box":
                s = np.asarray(g["size"])
                v = np.array(
                    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
                ) * s
                f = np.array(
                    [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                     [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                     [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]]
                )
            else:
                # fail loudly: silently skipping a geom type renders
                # half-empty frames on scenes beyond the vendored ones
                raise NotImplementedError(
                    f"rasterizer: unsupported geom type {g['type']!r} "
                    f"(body {g['body']}); supported: mesh, box"
                )
            # place in geom frame within the body
            q = np.asarray(g["quat"], dtype=np.float64)
            v = np.stack([_quat_rot_np(q, vv) for vv in v]) + np.asarray(g["pos"])
            verts_l.append(v)
            vbody_l.append(np.full(len(v), g["body"], np.int32))
            faces_l.append(np.asarray(f, np.int32) + voff)
            fcol_l.append(np.tile(rgba[:3], (len(f), 1)))
            voff += len(v)

        self._verts = jnp.asarray(np.concatenate(verts_l), jnp.float32)
        self._vbody = jnp.asarray(np.concatenate(vbody_l))
        faces = np.concatenate(faces_l)
        fcol = np.concatenate(fcol_l)
        # pad triangle count to a chunk multiple with degenerate tris
        pad = (-len(faces)) % self._tri_chunk
        if pad:
            faces = np.concatenate([faces, np.zeros((pad, 3), np.int32)])
            fcol = np.concatenate([fcol, np.zeros((pad, 3))])
        self._faces = jnp.asarray(faces)
        self._fcol = jnp.asarray(fcol, jnp.float32)
        self._pad = pad
        self._npad_valid = len(faces) - pad
        self._cam = {
            name: i for i, name in enumerate(m.names_cam)
        }

    # -- camera pose --------------------------------------------------------

    def _camera(self, xpos, xquat, cam_id, dtype):
        m = self._m
        b = m.cam_bodyid[cam_id]
        cpos = xpos[b] + quat_ops.rotate(xquat[b], m.cam_pos[cam_id].astype(dtype))
        if m.cam_mode[cam_id] == "targetbody":
            tgt = xpos[m.cam_targetbodyid[cam_id]]
            fwd = tgt - cpos
            fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-9)
            up_w = jnp.asarray([0.0, 0, 1], dtype)
            # degenerate straight-down view: fall back to +y up
            degen = jnp.abs(fwd @ up_w) > 0.999
            up_w = jnp.where(degen, jnp.asarray([0.0, 1, 0], dtype), up_w)
            right = jnp.cross(fwd, up_w)
            right = right / jnp.maximum(jnp.linalg.norm(right), 1e-9)
            up = jnp.cross(right, fwd)
        else:
            R = quat_ops.to_mat(
                quat_ops.mul(xquat[b], m.cam_quat[cam_id].astype(dtype))
            )
            # mujoco camera looks along -z of its frame, x right, y up
            right, up, fwd = R[:, 0], R[:, 1], -R[:, 2]
        return cpos, right, up, fwd

    # -- main entry ---------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
    def _render_impl(self, s: State, height, width, cam_id):
        m = self._m
        dtype = jnp.float32
        d = smooth.kinematics(m, s)
        xpos = d.xpos.astype(dtype)
        xquat = d.xquat.astype(dtype)

        # pose all verts
        vq = xquat[self._vbody]
        vw = xpos[self._vbody] + quat_ops.rotate(vq, self._verts)

        cpos, right, up, fwd = self._camera(xpos, xquat, cam_id, dtype)
        rel = vw - cpos[None]
        cx = rel @ right
        cy = rel @ up
        cz = rel @ fwd                        # depth along view dir (>0 front)

        fovy = jnp.deg2rad(m.cam_fovy[cam_id].astype(dtype))
        fscale = 1.0 / jnp.tan(fovy / 2)
        aspect = width / height
        near = 0.01
        safe_z = jnp.maximum(cz, near)
        sx = (cx / safe_z) * fscale / aspect
        sy = (cy / safe_z) * fscale
        # pixel coords
        px = (sx * 0.5 + 0.5) * width
        py = (1.0 - (sy * 0.5 + 0.5)) * height

        P = height * width
        gx = (jnp.arange(width, dtype=dtype) + 0.5)[None, :].repeat(height, 0).reshape(-1)
        gy = (jnp.arange(height, dtype=dtype) + 0.5)[:, None].repeat(width, 1).reshape(-1)

        TC = self._tri_chunk
        F = self._faces.shape[0]
        nchunks = F // TC

        # ---- per-triangle affine coefficients, computed ONCE (O(F)) ----
        # Every per-pixel quantity is affine in pixel coords: the edge
        # function e0 = A0 gx + B0 gy + C0, their sum e0+e1+e2 = 2 x the
        # signed pixel-space area (a per-triangle CONSTANT), and the
        # interpolated depth (az e1 + bz e2 + qz e0)/area.  The old form
        # recomputed vertex differences, the area, and three divides per
        # (triangle, pixel) element (~50 VPU ops); this form is 3 FMA
        # chains + a 3-way min + select (~24) with no per-pixel divide.
        fidx = self._faces
        ax, ay, az = px[fidx[:, 0]], py[fidx[:, 0]], cz[fidx[:, 0]]
        bx, by, bz = px[fidx[:, 1]], py[fidx[:, 1]], cz[fidx[:, 1]]
        qx, qy, qz = px[fidx[:, 2]], py[fidx[:, 2]], cz[fidx[:, 2]]
        # C terms in difference-first form: the naive ax*by - bx*ay is FMA-
        # contracted by XLA, which leaves a rounding-sized NONZERO residue
        # for degenerate triangles (the chunk-padding tris have all three
        # vertices equal) — they then pass the area cull and shade every
        # pixel black.  Difference-first multiplies by an exact zero
        # instead, which no FMA can perturb.
        A0, B0, C0 = ay - by, bx - ax, ax * (by - ay) - (bx - ax) * ay
        A1, B1, C1 = by - qy, qx - bx, bx * (qy - by) - (qx - bx) * by
        A2, B2, C2 = qy - ay, ax - qx, qx * (ay - qy) - (ax - qx) * qy
        area2 = C0 + C1 + C2                       # 2 * signed area
        # normalize orientation so inside == (all edges >= 0), two-sided
        flip = jnp.where(area2 < 0, -1.0, 1.0).astype(dtype)
        A0, B0, C0 = A0 * flip, B0 * flip, C0 * flip
        A1, B1, C1 = A1 * flip, B1 * flip, C1 * flip
        A2, B2, C2 = A2 * flip, B2 * flip, C2 * flip
        area_n = area2 * flip                      # |2 area|
        # area cull at 1e-2 px^2 (not eps-level): f32 rounding of the C
        # terms is ~coordinate^2 * 2^-24 ~ 6e-4 here, and a sub-centipixel
        # triangle cannot contribute to a 64x48 frame anyway
        keep = (area_n > 1e-2) & (az > near) & (bz > near) & (qz > near)
        inv_area = 1.0 / jnp.where(keep, area_n, 1.0)
        # depth as an affine form, area folded in (all 3 verts in front of
        # the near plane => interpolated depth inside is > near, so no
        # per-pixel near test is needed)
        An = (az * A1 + bz * A2 + qz * A0) * inv_area
        Bn = (az * B1 + bz * B2 + qz * B0) * inv_area
        Cn = (az * C1 + bz * C2 + qz * C0) * inv_area
        # culled triangles (degenerate / behind near / chunk padding) can
        # never win: force edge 0 hugely negative
        C0 = jnp.where(keep, C0, -1e30)

        # flat shading from world-space normals (O(F), once)
        a3 = vw[fidx[:, 0]]
        n3 = jnp.cross(vw[fidx[:, 1]] - a3, vw[fidx[:, 2]] - a3)
        n3 = n3 / jnp.maximum(jnp.linalg.norm(n3, axis=-1, keepdims=True), 1e-12)
        lambert = jnp.abs(n3 @ fwd)                # two-sided headlight
        rgb = self._fcol * (0.35 + 0.65 * lambert)[:, None]   # (F, 3)

        def chunk_body(ci, carry):
            zbuf, cbuf = carry
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * TC, TC)
            e0 = sl(A0)[:, None] * gx[None] + sl(B0)[:, None] * gy[None] + sl(C0)[:, None]
            e1 = sl(A1)[:, None] * gx[None] + sl(B1)[:, None] * gy[None] + sl(C1)[:, None]
            e2 = sl(area_n)[:, None] - e0 - e1     # edge sum is constant
            zpix = sl(An)[:, None] * gx[None] + sl(Bn)[:, None] * gy[None] + sl(Cn)[:, None]
            emin = jnp.minimum(jnp.minimum(e0, e1), e2)
            zmask = jnp.where(emin >= 0, zpix, jnp.inf)
            # best triangle in this chunk per pixel
            best = jnp.argmin(zmask, axis=0)          # (P,)
            bestz = jnp.take_along_axis(zmask, best[None], 0)[0]
            bestc = sl(rgb)[best]                      # (P, 3)
            better = bestz < zbuf
            zbuf = jnp.where(better, bestz, zbuf)
            cbuf = jnp.where(better[:, None], bestc, cbuf)
            return zbuf, cbuf

        sky = jnp.asarray([0.72, 0.8, 0.89], dtype)
        zbuf0 = jnp.full((P,), jnp.inf, dtype)
        cbuf0 = jnp.tile(sky[None], (P, 1))
        zbuf, cbuf = jax.lax.fori_loop(0, nchunks, chunk_body, (zbuf0, cbuf0))

        img = jnp.clip(cbuf.reshape(height, width, 3), 0.0, 1.0)
        return (img * 255).astype(jnp.uint8)

    def render(self, s: State, height=480, width=640, camera="top"):
        cam_id = self._cam[camera] if isinstance(camera, str) else camera
        return self._render_impl(s, height, width, cam_id)
