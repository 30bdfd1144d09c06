"""Gymnasium registration: same env ids/limits/kwargs as the reference
(/root/reference/gym_so100/__init__.py:4-32), under the gym_so100_tpu
namespace."""

from gymnasium.envs.registration import register


def register_envs():
    specs = [
        ("SO100TouchCube-v0", "so100_touch_cube", 300),
        ("SO100TouchCubeSparse-v0", "so100_touch_cube_sparse", 300),
        ("SO100CubeToBin-v0", "so100_cube_to_bin", 700),
    ]
    for name, task, max_steps in specs:
        register(
            id=f"gym_so100_tpu/{name}",
            entry_point="gym_so100_tpu.envs.gym_env:SO100Env",
            max_episode_steps=max_steps,
            # renders are deterministic here (pure-JAX rasterizer), but the
            # reference marks these nondeterministic; we keep determinism.
            nondeterministic=False,
            kwargs={"obs_type": "so100_pixels_agent_pos", "task": task},
        )
