"""gym_so100_tpu: TPU-native SO-ARM100 simulation + RL framework.

A from-scratch JAX/XLA re-architecture of the capabilities of
`gym-so100-c` (reference mounted at /root/reference): pure-JAX physics with
MuJoCo-parity contact dynamics, functional task/env transforms, Gymnasium
adapters, batched vmap/shard_map execution, and on-device rendering.
"""

from .envs.registration import register_envs

register_envs()

__version__ = "0.1.0"
