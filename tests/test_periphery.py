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


def test_gamepad_decode_logitech_layout():
    """Synthetic HID reports through the Logitech RumblePad 2 layout —
    the one device the reference actually decodes (gamepad_utils.py:
    174-232): dpad nibble, stick axes with deadzone, trigger bitfield
    (RB intervention, RT open, LT close), face-button episode tags."""
    from gym_so100_tpu.teleop.input import GamepadControllerHID, LAYOUTS

    c = GamepadControllerHID(x_step_size=1.0, y_step_size=1.0, z_step_size=1.0)
    c.layout = LAYOUTS["Logitech"]

    # idle report: centered sticks, hat 15 (released), nothing pressed
    idle = [0, 15, 128, 128, 128, 128, 0, 0, 0]
    c._decode(idle)
    assert c.direction is None
    assert c.get_deltas() == (0.0, 0.0, 0.0)
    assert c.gripper_command() == "no-op"
    assert not c.intervention_flag and c.episode_end_status is None

    # full-left left stick (byte 3 = left_x -> 0), dpad up, RB held
    rep = [0, 0, 128, 0, 128, 128, 0x02, 0, 0]
    c._decode(rep)
    assert c.direction == "up"
    assert c.intervention_flag
    dx, dy, dz = c.get_deltas()
    assert dx == 1.0 and dy == 0.0 and dz == 0.0  # -(-1.0) * step

    # RT opens, LT closes, both -> no-op
    c._decode([0, 15, 128, 128, 128, 128, 0x08, 0, 0])
    assert c.gripper_command() == "open"
    c._decode([0, 15, 128, 128, 128, 128, 0x04, 0, 0])
    assert c.gripper_command() == "close"
    c._decode([0, 15, 128, 128, 128, 128, 0x0C, 0, 0])
    assert c.gripper_command() == "no-op"

    # face buttons: Y(bit7)=success, X(bit5)=failure, A(bit4)=rerecord
    c._decode([0, 15, 128, 128, 128, 128, 0, 0, 1 << 7])
    assert c.episode_end_status == "success"
    c._decode([0, 15, 128, 128, 128, 128, 0, 0, 1 << 5])
    assert c.episode_end_status == "failure"
    c._decode([0, 15, 128, 128, 128, 128, 0, 0, 1 << 4])
    assert c.episode_end_status == "rerecord_episode"
    c._decode(idle)
    assert c.episode_end_status is None

    # deadzone: small stick offsets stay zero
    c._decode([0, 15, 128, 133, 128, 128, 0, 0, 0])
    assert c.get_deltas() == (0.0, 0.0, 0.0)

    # every known product key has a layout with the required fields
    for lay in LAYOUTS.values():
        assert len(lay.axes) == 4 and lay.min_len >= max(lay.axes) + 1


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


def test_mjpeg_server_stream_and_keys():
    """The recorder/viewer visual channel: page, MJPEG stream, browser
    keydown forwarding (the reference's cv2 window analog,
    /root/reference/scripts/record_teleop.py:158-494)."""
    import http.client
    import json

    from gym_so100_tpu.render.mjpeg import MjpegServer

    keys = []
    srv = MjpegServer(
        port=0, fps=30.0, title="t", help_text="h", key_handler=keys.append
    ).start()
    try:
        frame = np.zeros((8, 8, 3), np.uint8)
        frame[:, :, 0] = 255
        srv.publish(frame)

        conn = http.client.HTTPConnection("localhost", srv.port, timeout=5)
        conn.request("GET", "/")
        r = conn.getresponse()
        assert r.status == 200 and b"t" in r.read()

        conn2 = http.client.HTTPConnection("localhost", srv.port, timeout=5)
        conn2.request("GET", "/stream")
        r2 = conn2.getresponse()
        assert r2.status == 200
        assert "multipart/x-mixed-replace" in r2.getheader("Content-Type")
        chunk = r2.read(400)           # one boundary + jpeg header
        assert b"--frame" in chunk and b"image/jpeg" in chunk
        assert b"\xff\xd8" in chunk    # JPEG SOI marker
        conn2.close()

        conn3 = http.client.HTTPConnection("localhost", srv.port, timeout=5)
        body = json.dumps({"key": "a"})
        conn3.request("POST", "/key", body=body)
        assert conn3.getresponse().status == 204
        assert keys == ["a"]
    finally:
        srv.stop()


def test_keyboard_inject_drives_recorder_loop(monkeypatch):
    """Browser keys injected into KeyboardController act exactly like
    terminal keys on the next update() (the --watch recording loop)."""
    import io
    import os as _os
    import sys as _sys

    from gym_so100_tpu.teleop.input import KeyboardController

    # update() drains stdin via select; point stdin at an empty pipe so the
    # injected-queue path is isolated and select never blocks
    rfd, wfd = _os.pipe()
    monkeypatch.setattr(_sys, "stdin", _os.fdopen(rfd, "r"))

    ctl = KeyboardController()
    ctl.inject("a")
    ctl.inject("a")
    ctl.inject("z")
    ctl.update()
    assert abs(ctl.joint_deltas[0] - ctl.step) < 1e-9   # +2 -1 steps
    ctl.update()
    assert ctl.joint_deltas[0] == 0.0                   # deltas are per-tick
    ctl.inject("1")
    ctl.update()
    assert ctl.episode_end_status == "success"
    ctl.inject("q")
    ctl.update()
    assert not ctl.running
    _os.close(wfd)
