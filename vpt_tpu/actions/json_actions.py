"""Convert recorder jsonl steps into MineRL env actions.

Reference: run_inverse_dynamics_model.py:17-125 (keyboard mapping, noop
template, camera sensitivity scaler, null-action detection).
"""

from __future__ import annotations

import numpy as np

KEYBOARD_BUTTON_MAPPING = {
    "key.keyboard.escape": "ESC",
    "key.keyboard.s": "back",
    "key.keyboard.q": "drop",
    "key.keyboard.w": "forward",
    "key.keyboard.1": "hotbar.1",
    "key.keyboard.2": "hotbar.2",
    "key.keyboard.3": "hotbar.3",
    "key.keyboard.4": "hotbar.4",
    "key.keyboard.5": "hotbar.5",
    "key.keyboard.6": "hotbar.6",
    "key.keyboard.7": "hotbar.7",
    "key.keyboard.8": "hotbar.8",
    "key.keyboard.9": "hotbar.9",
    "key.keyboard.e": "inventory",
    "key.keyboard.space": "jump",
    "key.keyboard.a": "left",
    "key.keyboard.d": "right",
    "key.keyboard.left.shift": "sneak",
    "key.keyboard.left.control": "sprint",
    "key.keyboard.f": "swapHands",
}

# Template action (all buttons up, no camera motion)
NOOP_ACTION = {
    "ESC": 0,
    "back": 0,
    "drop": 0,
    "forward": 0,
    "hotbar.1": 0,
    "hotbar.2": 0,
    "hotbar.3": 0,
    "hotbar.4": 0,
    "hotbar.5": 0,
    "hotbar.6": 0,
    "hotbar.7": 0,
    "hotbar.8": 0,
    "hotbar.9": 0,
    "inventory": 0,
    "jump": 0,
    "left": 0,
    "right": 0,
    "sneak": 0,
    "sprint": 0,
    "swapHands": 0,
    "camera": np.array([0, 0]),
    "attack": 0,
    "use": 0,
    "pickItem": 0,
}

# Recorder mouse sensitivity → model camera degrees
# (matches the constant in the MineRL Java code; reference:
#  run_inverse_dynamics_model.py:75-77)
CAMERA_SCALER = 360.0 / 2400.0

# Recorder mouse button index → env button name
MOUSE_BUTTON_NAMES = {0: "attack", 1: "use", 2: "pickItem"}


def parse_recorder_step(json_action):
    """Structured view of one recorder jsonl step.

    :returns: (held_buttons, (pitch, yaw), mouse_moved) where held_buttons is
        the set of env button names down on this step (keyboard + mouse; the
        keyboard table ignores unmapped keys, and ESC is kept as-is — original
        VPT training rewrote it to "inventory" when the GUI was open, but
        BASALT needs ESC to quit so the data format keeps it) and
        (pitch, yaw) is the camera delta in model degrees.
    """
    mouse = json_action["mouse"]
    held = {
        KEYBOARD_BUTTON_MAPPING[k]
        for k in json_action["keyboard"]["keys"]
        if k in KEYBOARD_BUTTON_MAPPING
    }
    held.update(
        name for idx, name in MOUSE_BUTTON_NAMES.items() if idx in mouse["buttons"]
    )
    moved = mouse["dx"] != 0 or mouse["dy"] != 0
    return held, (mouse["dy"] * CAMERA_SCALER, mouse["dx"] * CAMERA_SCALER), moved


def json_action_to_env_action(json_action):
    """Convert one recorder jsonl step into a MineRL action dict.

    Returns (env_action, is_null_action).  A step is null when no button is
    held and the mouse didn't move — these steps are dropped by the BC data
    pipeline the same way the VPT paper dropped them.

    Quirk preserved bit-for-bit from the reference (whose training pipeline
    routes through the same parser, data_loader.py:14,97): the camera slot is
    an *integer* array, so scaled deltas truncate toward zero to whole
    degrees on assignment (reference run_inverse_dynamics_model.py:88,103-104
    — ``np.array([0, 0])`` is int64).  The reference's >180° glitch guard
    sits in the no-motion branch where the deltas are already zero, so it
    never fires and is not reproduced here.
    """
    held, (pitch, yaw), moved = parse_recorder_step(json_action)

    env_action = dict(NOOP_ACTION, camera=np.array([0, 0]))
    for name in held:
        env_action[name] = 1
    if moved:
        camera = env_action["camera"]
        camera[0] = pitch  # int array: truncates toward zero, as upstream
        camera[1] = yaw

    return env_action, not (held or moved)


def json_actions_to_env_actions(json_actions):
    """Batch form: list of steps → (list of env actions, bool null mask)."""
    parsed = [json_action_to_env_action(step) for step in json_actions]
    actions = [a for a, _ in parsed]
    return actions, np.array([null for _, null in parsed], bool)


# ---------------------------------------------------------------------------
# The inverse direction: env actions → recorder jsonl.
#
# The reference documents the contractor recorder's jsonl format (its README
# points at the recorder sources, README.md:150-160) and consumes it
# (run_inverse_dynamics_model.py:80-125, data_loader.py:97), but ships no
# code that PRODUCES it.  These helpers write that format from env action
# dicts, so agent play recorded by tools/record_demonstrations.py is
# loadable by the same BC data pipeline as contractor data.
# ---------------------------------------------------------------------------

_INV_KEYBOARD = {v: k for k, v in KEYBOARD_BUTTON_MAPPING.items()}
_INV_MOUSE = {name: idx for idx, name in MOUSE_BUTTON_NAMES.items()}


class RecorderJsonlWriter:
    """Stateful env-action → recorder-jsonl-step converter.

    The recorder format carries per-step *state* the env action dict doesn't:
    ``newButtons`` (mouse buttons pressed this step that were up last step),
    the selected ``hotbar`` slot, and ``isGuiOpen``.  This class tracks all
    three across steps: newButtons from the previous step's held set, the
    hotbar slot from hotbar.N presses, and the GUI flag toggled by fresh
    ``inventory`` presses and closed by fresh ``ESC`` presses.

    The GUI flag is exact for mock/scripted rollouts but APPROXIMATE for
    real-env recordings: the game also opens a GUI through paths the action
    stream can't see (``use`` on a chest / crafting table / furnace, death
    screens), so ``isGuiOpen`` can diverge from true game state there —
    which shifts which frames the BC loader composites the cursor onto and
    applies GUI-only fixups to.  Real contractor recordings don't have this
    problem (their recorder reads the flag from the game); treat self-
    recorded real-env data accordingly.

    Exact inverse of ``json_action_to_env_action`` up to that parser's own
    camera-int-truncation quirk: camera degrees divide back through
    CAMERA_SCALER into mouse dx/dy, so re-parsing returns the integer-degree
    truncation of the recorded action — identical to how real contractor
    recordings lose sub-degree camera motion.
    """

    def __init__(self, gui_open: bool = False, hotbar_slot: int = 0):
        self._prev_mouse: set = set()
        self._prev_inventory = False
        self._prev_esc = False
        self._gui = bool(gui_open)
        self._hotbar = int(hotbar_slot)

    def step(self, env_action, mouse_xy=(640.0, 360.0)) -> dict:
        """One recorder jsonl row for ``env_action``.  ``mouse_xy`` is the
        cursor position in the recorder's 1280×720 screen coordinates (the
        loader rescales by video height / 720, data_loader.py:52-56); it only
        matters while the GUI is open (cursor compositing)."""
        held_keys = sorted(
            _INV_KEYBOARD[name]
            for name in KEYBOARD_BUTTON_MAPPING.values()
            if _scalar(env_action.get(name, 0))
        )
        mouse_buttons = sorted(
            idx for name, idx in _INV_MOUSE.items()
            if _scalar(env_action.get(name, 0))
        )
        new_buttons = sorted(set(mouse_buttons) - self._prev_mouse)
        self._prev_mouse = set(mouse_buttons)

        inventory = bool(_scalar(env_action.get("inventory", 0)))
        if inventory and not self._prev_inventory:
            self._gui = not self._gui
        self._prev_inventory = inventory

        # ESC closes any open GUI (the common close path besides pressing
        # inventory again); a fresh press with no GUI open is just the key
        esc = bool(_scalar(env_action.get("ESC", 0)))
        if esc and not self._prev_esc:
            self._gui = False
        self._prev_esc = esc

        for slot in range(9):
            if _scalar(env_action.get(f"hotbar.{slot + 1}", 0)):
                self._hotbar = slot
                break

        camera = np.asarray(env_action.get("camera", (0.0, 0.0)), np.float64)
        pitch, yaw = float(camera[0]), float(camera[1])

        return {
            "keyboard": {"keys": held_keys},
            "mouse": {
                "x": float(mouse_xy[0]),
                "y": float(mouse_xy[1]),
                "dx": yaw / CAMERA_SCALER,
                "dy": pitch / CAMERA_SCALER,
                "buttons": mouse_buttons,
                "newButtons": new_buttons,
            },
            "hotbar": self._hotbar,
            "isGuiOpen": self._gui,
        }


def _scalar(v) -> int:
    return int(np.asarray(v).reshape(-1)[0])


def env_action_to_json_action(env_action) -> dict:
    """Stateless single-step form of :class:`RecorderJsonlWriter` (newButtons
    == buttons, hotbar slot from this step only, GUI closed)."""
    return RecorderJsonlWriter().step(env_action)
