"""Teleoperation input layer: controller abstraction + gamepad/keyboard.

Host-side port of /root/reference/gym_so100/teleop/gamepad_utils.py — input
devices are inherently host peripherals, so this layer intentionally stays
plain Python (SURVEY 2.3: not TPU work).  The `InputController` contract
(deltas, episode status flags, context manager) matches the reference
(gamepad_utils.py:7-56); `GamepadControllerHID` replicates the hidapi
byte-offset decoding (gamepad_utils.py:106-232) and degrades gracefully to
unavailable when the `hid` module or device is missing (this container has
no HID devices)."""

from __future__ import annotations

import time


class InputController:
    """Base class: accumulates deltas and episode status."""

    def __init__(self, x_step_size=1.0, y_step_size=1.0, z_step_size=1.0):
        self.x_step_size = x_step_size
        self.y_step_size = y_step_size
        self.z_step_size = z_step_size
        self.running = True
        self.episode_end_status = None
        self.intervention_flag = False
        self.open_gripper_command = False
        self.close_gripper_command = False

    def start(self):
        pass

    def stop(self):
        pass

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    def get_deltas(self):
        return 0.0, 0.0, 0.0

    def update(self):
        pass

    def should_save(self):
        return self.episode_end_status is not None

    def should_quit(self):
        return not self.running

    def gripper_command(self):
        if self.open_gripper_command == self.close_gripper_command:
            return "no-op"
        return "open" if self.open_gripper_command else "close"


KNOWN_PRODUCTS = (
    "Logitech", "Xbox", "Wireless Controller", "DualSense", "8BitDo",
)


class GamepadControllerHID(InputController):
    """hidapi-based gamepad reader (reference gamepad_utils.py:69-232)."""

    def __init__(self, *args, deadzone=0.1, **kw):
        super().__init__(*args, **kw)
        self.deadzone = deadzone
        self.device = None
        self.left_x = self.left_y = self.right_x = self.right_y = 0.0

    def start(self):
        try:
            import hid
        except ImportError as e:
            raise RuntimeError(
                "gamepad support needs the 'hid' package (hidapi)"
            ) from e
        for info in hid.enumerate():
            prod = (info.get("product_string") or "")
            if any(k in prod for k in KNOWN_PRODUCTS):
                self.device = hid.device()
                self.device.open_path(info["path"])
                self.device.set_nonblocking(True)
                return
        raise RuntimeError("no known gamepad found")

    def stop(self):
        if self.device is not None:
            self.device.close()
            self.device = None

    @staticmethod
    def _axis(v, deadzone):
        x = (v - 128) / 128.0
        return 0.0 if abs(x) < deadzone else x

    def update(self):
        if self.device is None:
            return
        # drain up to 10 reports per update (gamepad_utils.py:157-163)
        for _ in range(10):
            data = self.device.read(64)
            if not data:
                break
            if len(data) < 10:
                continue
            self.left_x = self._axis(data[1], self.deadzone)
            self.left_y = self._axis(data[2], self.deadzone)
            self.right_x = self._axis(data[3], self.deadzone)
            self.right_y = self._axis(data[4], self.deadzone)
            buttons = data[5] if len(data) > 5 else 0
            # face buttons tag episode status (gamepad_utils.py:225-232)
            if buttons & 0x20:
                self.episode_end_status = "success"
            elif buttons & 0x10:
                self.episode_end_status = "failure"
            elif buttons & 0x40:
                self.episode_end_status = "rerecord_episode"
            self.open_gripper_command = bool(buttons & 0x01)
            self.close_gripper_command = bool(buttons & 0x02)

    def get_deltas(self):
        return (
            self.left_x * self.x_step_size,
            -self.left_y * self.y_step_size,
            -self.right_y * self.z_step_size,
        )


class KeyboardController(InputController):
    """stdin-based fallback (the reference falls back to keyboard when no
    gamepad is present, record_teleop.py:199-206).  Non-blocking reads via
    termios/select; works in any terminal, no display needed."""

    KEYMAP = {
        "a": (0, +1), "z": (0, -1),
        "s": (1, +1), "x": (1, -1),
        "d": (2, +1), "c": (2, -1),
        "f": (3, +1), "v": (3, -1),
        "g": (4, +1), "b": (4, -1),
        "h": (5, +1), "n": (5, -1),
    }

    def __init__(self, *args, step=0.05, **kw):
        super().__init__(*args, **kw)
        self.step = step
        self.joint_deltas = [0.0] * 6
        self._old = None

    def start(self):
        import sys, termios, tty

        self._old = termios.tcgetattr(sys.stdin)
        tty.setcbreak(sys.stdin.fileno())

    def stop(self):
        if self._old is not None:
            import sys, termios

            termios.tcsetattr(sys.stdin, termios.TCSADRAIN, self._old)
            self._old = None

    def update(self):
        import select
        import sys

        self.joint_deltas = [0.0] * 6
        while select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1)
            if ch == "q":
                self.running = False
            elif ch == "1":
                self.episode_end_status = "success"
            elif ch == "2":
                self.episode_end_status = "failure"
            elif ch == "3":
                self.episode_end_status = "rerecord_episode"
            elif ch in self.KEYMAP:
                j, s = self.KEYMAP[ch]
                self.joint_deltas[j] += s * self.step
