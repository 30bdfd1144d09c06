"""Periphery: BC training, teleop input layer, demo format, interop schema."""

import pickle

import numpy as np
import pytest


def test_bc_fits_linear_policy(tmp_path):
    from gym_so100_tpu.agents.bc import load_demo_transitions, train_bc

    rng = np.random.RandomState(0)
    # synthetic demos in the reference pickle format
    episodes = []
    W = rng.randn(6, 15).astype(np.float32) * 0.1
    for e in range(3):
        obs = rng.randn(40, 15).astype(np.float32)
        acts = np.tanh(obs @ W.T).astype(np.float32)
        episodes.append(
            dict(
                observations=list(obs), actions=list(acts),
                rewards=[0.0] * 40, infos=[{}] * 40,
            )
        )
    path = tmp_path / "demos.pkl"
    with open(path, "wb") as f:
        pickle.dump(episodes, f)

    o, a = load_demo_transitions([str(path)])
    assert o.shape == (120, 15) and a.shape == (120, 6)
    lines = []
    actor, params = train_bc(o, a, epochs=30, batch_size=32, progress=lines.append)
    assert lines[-1]["bc_loss"] < lines[0]["bc_loss"]
    import jax.numpy as jnp

    mean, _ = actor.apply(params, jnp.asarray(o[:10]))
    pred = np.tanh(np.asarray(mean))
    err = np.abs(pred - a[:10]).mean()
    assert err < 0.2, err


def test_input_controller_contract():
    from gym_so100_tpu.teleop.input import InputController, KeyboardController

    c = InputController()
    assert c.gripper_command() == "no-op"
    c.open_gripper_command = True
    assert c.gripper_command() == "open"
    assert not c.should_save()
    c.episode_end_status = "success"
    assert c.should_save()
    # keyboard map covers all 6 joints in both directions
    km = KeyboardController.KEYMAP
    joints = {j for j, _ in km.values()}
    assert joints == set(range(6))


def test_lerobot_unit_conversions_roundtrip():
    from gym_so100_tpu.envs import constants as C

    q = np.array([0.5, -1.0, 1.5, 0.3, -2.0, 0.8])
    lr = np.asarray(C.normalize_gym_so100_to_lerobot(q))
    assert lr.shape == (6,)
    norm = np.asarray(C.normalize_lerobot_to_gym_so100(lr))
    back = np.asarray(C.unnormalize_so100(norm))
    np.testing.assert_allclose(back, q, atol=1e-5)


def test_lerobot_interop_gated():
    from gym_so100_tpu.interop import lerobot as lri

    assert "observation.images.top" in lri.FEATURES
    with pytest.raises(RuntimeError, match="lerobot"):
        lri.load_pretrained_policy("act", "nonexistent")


def test_scripts_importable():
    import importlib.util
    import pathlib

    for name in ("train_sac", "example", "record_teleop", "evaluate_policy",
                 "merge_demonstrations"):
        p = pathlib.Path("scripts") / f"{name}.py"
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)  # imports run; main() guarded
        assert hasattr(mod, "main")
