"""Quaternion and rotation utilities (MuJoCo conventions: quats are (w, x, y, z)).

Pure jnp functions, shape-polymorphic over leading batch dims where noted, and
safe under jit/vmap/grad. These are the scalar building blocks of the physics
core; everything operates on small fixed-size arrays so XLA fuses them freely.

Reference behavior being reproduced (not copied): quaternion conventions of the
MuJoCo C engine that the reference drives through dm_control
(/root/reference/gym_so100/env.py:97-98).
"""

from __future__ import annotations

import jax.numpy as jnp


def mul(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q * p for (…, 4) quaternions (w, x, y, z)."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def conj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v (…, 3) by unit quaternion(s) q (…, 4).

    Uses the expanded 15-mul form rather than q*v*q' to keep the op count low.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    # t = 2 * cross(q.xyz, v)
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    # v + w*t + cross(q.xyz, t)
    return jnp.stack(
        [
            vx + w * tx + (y * tz - z * ty),
            vy + w * ty + (z * tx - x * tz),
            vz + w * tz + (x * ty - y * tx),
        ],
        axis=-1,
    )


def rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q."""
    return rotate(conj(q), v)


def to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (…, 4) -> rotation matrix (…, 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion from rotation axis (…, 3) and angle (…,)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by angular velocity over dt.

    Matches MuJoCo's mju_quatIntegrate: rotates q by the LOCAL-frame angular
    velocity omega for time dt using the exact exponential map.  For a free
    joint MuJoCo stores angular velocity in the body-local frame and applies
    q_new = q * exp(omega * dt / 2); we replicate that here.
    """
    angle = jnp.linalg.norm(omega, axis=-1)
    # Safe normalize: when |omega| == 0 the axis is irrelevant since sin(0)=0.
    safe = jnp.where(angle > 0, angle, 1.0)
    axis = omega / safe[..., None]
    dq = from_axis_angle(axis, angle * dt)
    return mul(q, dq)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) to unit length."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def from_euler_xyz(euler: jnp.ndarray) -> jnp.ndarray:
    """MJCF 'euler' attribute (default eulerseq 'xyz', extrinsic) -> quaternion.

    MuJoCo composes R = Rz(ez) @ Ry(ey) @ Rx(ex) for eulerseq='xyz' (lowercase
    means extrinsic/world axes applied in sequence order).
    """
    ex, ey, ez = euler[..., 0], euler[..., 1], euler[..., 2]
    zero = jnp.zeros_like(ex)
    one = jnp.ones_like(ex)
    qx = from_axis_angle(jnp.stack([one, zero, zero], -1), ex)
    qy = from_axis_angle(jnp.stack([zero, one, zero], -1), ey)
    qz = from_axis_angle(jnp.stack([zero, zero, one], -1), ez)
    return mul(qz, mul(qy, qx))


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product for (…, 3) arrays (jnp.cross is slow on TPU for small ops)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def from_mat(R):
    """Rotation matrix -> quaternion (w, x, y, z), batched, branchless
    (Shepperd's method via where-select over the four stable cases)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # candidate 0: trace
    w0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-30)) / 2
    q0 = jnp.stack([
        w0,
        (R[..., 2, 1] - R[..., 1, 2]) / (4 * w0),
        (R[..., 0, 2] - R[..., 2, 0]) / (4 * w0),
        (R[..., 1, 0] - R[..., 0, 1]) / (4 * w0),
    ], -1)
    # candidate i: dominant diagonal element i
    def cand(i, j, k):
        s = jnp.sqrt(jnp.maximum(1.0 + R[..., i, i] - R[..., j, j] - R[..., k, k], 1e-30)) * 2
        comp = {  # components by index
            "w": (R[..., k, j] - R[..., j, k]) / s,
            i: s / 4,
            j: (R[..., j, i] + R[..., i, j]) / s,
            k: (R[..., k, i] + R[..., i, k]) / s,
        }
        vec = [comp["w"], None, None, None]
        for idx in (i, j, k):
            vec[idx + 1] = comp[idx]
        return jnp.stack(vec, -1)

    q1 = cand(0, 1, 2)
    q2 = cand(1, 2, 0)
    q3 = cand(2, 0, 1)
    d0, d1, d2 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    use0 = tr > 0
    m01 = (d0 >= d1) & (d0 >= d2)
    m1 = d1 >= d2
    q = jnp.where(
        use0[..., None], q0,
        jnp.where(m01[..., None], q1, jnp.where(m1[..., None], q2, q3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def conj(q):
    return q * jnp.asarray([1.0, -1, -1, -1], q.dtype)


def sub_quat(qa, qb):
    """MuJoCo mju_subQuat: 3D rotational 'difference' velocity v such that
    quat_integrate(qb, v, 1) = qa; v = 2*log(qb^-1 * qa), batched."""
    qd = mul(conj(qb), qa)
    # shortest arc
    qd = jnp.where(qd[..., :1] < 0, -qd, qd)
    vn = jnp.linalg.norm(qd[..., 1:], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, qd[..., :1])
    axis = qd[..., 1:] / jnp.maximum(vn, 1e-15)
    return axis * angle
