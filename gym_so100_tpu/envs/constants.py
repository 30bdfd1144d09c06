"""Env-layer constants and action scaling.

Mirrors /root/reference/gym_so100/constants.py (DT=0.02 at constants.py:4,
joint lists at :8-26, bin goal bounds at :29-30, start pose at :32-39, and
the per-joint [-1,1] <-> radians scaling at :44-96) as pure jnp/numpy
functions usable both inside jit (batched envs) and on the host (adapters).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

DT = 0.02
FPS = 50
N_SUBSTEPS = 10  # DT / model timestep (0.002)

SO100_JOINTS = [
    "left_arm_waist",
    "left_arm_shoulder",
    "left_arm_elbow",
    "left_arm_forearm_roll",
    "left_arm_wrist_rotate",
    "left_arm_gripper",
]
SO100_ACTIONS = list(SO100_JOINTS)

# per-joint ranges used by the action (un)normalizers
JOINT_RANGES = np.array(
    [
        [-1.92, 1.92],    # waist
        [-3.32, 0.174],   # shoulder
        [-0.174, 3.14],   # elbow
        [-1.66, 1.66],    # wrist pitch
        [-2.79, 2.79],    # wrist roll
        [-0.174, 1.75],   # gripper
    ]
)

bin_min = np.array([-0.25, 0.7, 0.01], dtype=np.float32)
bin_max = np.array([-0.14, 0.76, 0.05], dtype=np.float32)

SO100_START_ARM_POSE = np.array([0.0, -0.96, 1.16, 0.0, 0.0, 0.02239])

# cube spawn ranges (utils.py:18-29)
BOX_X_RANGE = (-0.25, -0.15)
BOX_Y_RANGE = (0.3, 0.6)
BOX_Z = 0.05


def unnormalize_so100(action):
    """[-1, 1]^6 -> radians, clipped to joint ranges (constants.py:78-86)."""
    lo = jnp.asarray(JOINT_RANGES[:, 0], dtype=jnp.asarray(action).dtype)
    hi = jnp.asarray(JOINT_RANGES[:, 1], dtype=jnp.asarray(action).dtype)
    scaled = (action + 1.0) / 2.0 * (hi - lo) + lo
    return jnp.clip(scaled, lo, hi)


def normalize_so100(q):
    """radians -> [-1, 1]^6, clipped."""
    lo = jnp.asarray(JOINT_RANGES[:, 0], dtype=jnp.asarray(q).dtype)
    hi = jnp.asarray(JOINT_RANGES[:, 1], dtype=jnp.asarray(q).dtype)
    scaled = (q - lo) / (hi - lo) * 2.0 - 1.0
    return jnp.clip(scaled, -1.0, 1.0)


def normalize_gym_so100_to_lerobot(action):
    """radians -> LeRobot units: +-100 for arm joints, 0..100 for the gripper
    (constants.py:60-68)."""
    a = jnp.asarray(action)
    lo = jnp.asarray(JOINT_RANGES[:, 0], a.dtype)
    hi = jnp.asarray(JOINT_RANGES[:, 1], a.dtype)
    tmin = jnp.asarray([-100.0, -100, -100, -100, -100, 0], a.dtype)
    tmax = jnp.asarray([100.0, 100, 100, 100, 100, 100], a.dtype)
    scaled = (a - lo) / (hi - lo) * (tmax - tmin) + tmin
    return jnp.clip(scaled, tmin, tmax)


def normalize_lerobot_to_gym_so100(action):
    """LeRobot units -> [-1, 1] normalized actions (constants.py:89-96)."""
    a = jnp.asarray(action)
    tmin = jnp.asarray([-100.0, -100, -100, -100, -100, 0], a.dtype)
    tmax = jnp.asarray([100.0, 100, 100, 100, 100, 100], a.dtype)
    scaled = (a - tmin) / (tmax - tmin) * 2.0 - 1.0
    return jnp.clip(scaled, -1.0, 1.0)


def sample_so100_box_pose_np(seed=None):
    """Host-side cube spawn with the reference's exact RandomState stream
    (utils.py:18-29: fresh RandomState(seed) per call)."""
    rng = np.random.RandomState(seed)
    ranges = np.array([BOX_X_RANGE, BOX_Y_RANGE, (BOX_Z, BOX_Z)])
    pos = rng.uniform(ranges[:, 0], ranges[:, 1])
    return np.concatenate([pos, [1.0, 0, 0, 0]])


def fixed_so100_box_pose_np(seed=None):
    return np.array([-0.2, 0.45, 0.05, 1.0, 0, 0, 0])


def sample_so100_box_pose(key, dtype=jnp.float32):
    """JAX-PRNG cube spawn for the batched path (same distribution; the
    RandomState bit-stream itself is host-only parity, kept in the adapter)."""
    import jax

    u = jax.random.uniform(key, (2,), dtype=dtype)
    x = BOX_X_RANGE[0] + u[0] * (BOX_X_RANGE[1] - BOX_X_RANGE[0])
    y = BOX_Y_RANGE[0] + u[1] * (BOX_Y_RANGE[1] - BOX_Y_RANGE[0])
    return jnp.concatenate(
        [jnp.stack([x, y, jnp.asarray(BOX_Z, dtype)]),
         jnp.asarray([1.0, 0, 0, 0], dtype)]
    )
