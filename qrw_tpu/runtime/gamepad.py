"""Host gamepad reader feeding the controller's command channel.

Re-design of the reference's gamepad client (scripts/gamepadClient.py:
16-88: a multiprocessing.Process polling evdev events from the `inputs`
library into shared Values). Here the reader is a background process
that publishes the latest (axes, buttons) frame into a native seqlock
shared-memory mailbox (qrw_tpu.runtime.ipc.Mailbox — same transport as
the async MPC service), and the control host reads the freshest frame
wait-free at 500 Hz. The analog scaling/low-pass into a 6-DoF velocity
command is the jitted `qrw_tpu.core.joystick.gamepad_update`
(scripts/Joystick.py:81-158 semantics).

The evdev dependency is optional: when the `inputs` package or a
physical gamepad is absent (headless hosts, CI), `GamepadReader` can be
driven by any callable event source — `SyntheticGamepad` provides a
scripted one for tests and demos.
"""

from __future__ import annotations

import multiprocessing as mp
import time
from typing import Callable, Optional

import numpy as np

# frame layout: [lx, ly, rx, ry, btn_start, btn_back, btn_L1,
#                btn_gait0, btn_gait1, btn_gait2, btn_gait3]
FRAME_SIZE = 11


def _read_evdev_frame(state: np.ndarray) -> np.ndarray:  # pragma: no cover
    """Poll one batch of evdev events into the frame (blocking).

    Mirrors the event decoding of scripts/gamepadClient.py:50-88."""
    from inputs import get_gamepad
    events = get_gamepad()
    for e in events:
        if e.code == "ABS_X":
            state[0] = e.state / 32768.0
        elif e.code == "ABS_Y":
            state[1] = e.state / 32768.0
        elif e.code == "ABS_RX":
            state[2] = e.state / 32768.0
        elif e.code == "ABS_RY":
            state[3] = e.state / 32768.0
        elif e.code == "BTN_START":
            state[4] = e.state
        elif e.code == "BTN_SELECT":
            state[5] = e.state
        elif e.code == "BTN_TL":
            state[6] = e.state
        elif e.code in ("BTN_SOUTH", "BTN_EAST", "BTN_NORTH", "BTN_WEST"):
            idx = {"BTN_SOUTH": 7, "BTN_EAST": 8,
                   "BTN_NORTH": 9, "BTN_WEST": 10}[e.code]
            state[idx] = e.state
    return state


def _reader_main(mailbox_name: str, source: Optional[Callable],
                 period_s: float, stop_flag):
    from qrw_tpu.runtime.ipc import Mailbox
    box = Mailbox(mailbox_name, (FRAME_SIZE,), create=False)
    state = np.zeros(FRAME_SIZE)
    read = source if source is not None else _read_evdev_frame
    while not stop_flag.value:
        try:
            state = np.asarray(read(state), dtype=np.float64)
        except Exception:
            break
        box.write(state)
        if period_s > 0:
            time.sleep(period_s)
    box.close()


class GamepadReader:
    """Background gamepad publisher + wait-free consumer.

    source: optional callable(state)->state replacing the evdev poll
    (synthetic input, replayed input, tests). The consumer side
    (`read()`) never blocks: it returns the freshest published frame,
    like the shared Values of the reference client."""

    def __init__(self, source: Optional[Callable] = None,
                 period_s: float = 0.002, name: Optional[str] = None):
        from qrw_tpu.runtime.ipc import Mailbox
        self.name = name or f"qrw_gamepad_{mp.current_process().pid}"
        self._box = Mailbox(self.name, (FRAME_SIZE,), create=True)
        self._box.write(np.zeros(FRAME_SIZE))
        self._stop = mp.Value("b", False)
        self._proc = mp.Process(
            target=_reader_main,
            args=(self.name, source, period_s, self._stop), daemon=True)
        self._proc.start()
        self._last = np.zeros(FRAME_SIZE)

    def read(self) -> np.ndarray:
        """Freshest (FRAME_SIZE,) frame (never blocks)."""
        frame = self._box.read()
        if frame is not None:
            self._last = np.asarray(frame)
        return self._last

    @property
    def axes(self) -> np.ndarray:
        return self.read()[0:4]

    @property
    def buttons(self) -> np.ndarray:
        return self.read()[4:]

    def stop(self):
        self._stop.value = True
        self._proc.join(timeout=2.0)
        if self._proc.is_alive():  # pragma: no cover
            self._proc.terminate()
        self._box.close()


class SyntheticGamepad:
    """Scripted event source: a (T, FRAME_SIZE) table played back one
    row per poll (wraps around). Stands in for a physical gamepad."""

    def __init__(self, frames: np.ndarray):
        self.frames = np.atleast_2d(np.asarray(frames, dtype=np.float64))
        self._k = mp.Value("i", 0)

    def __call__(self, state: np.ndarray) -> np.ndarray:
        with self._k.get_lock():
            k = self._k.value
            self._k.value = k + 1
        return self.frames[k % len(self.frames)]
