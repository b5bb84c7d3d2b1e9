import itertools

import numpy as np
import pytest

from vpt_tpu.actions.buttons import Buttons
from vpt_tpu.actions.mapping import CameraHierarchicalMapping, IDMActionMapping


@pytest.fixture(scope="module")
def mapper():
    return CameraHierarchicalMapping(n_camera_bins=11)


def test_cardinalities(mapper):
    space = mapper.get_action_space_update()
    assert space["buttons"].eltype.n == 8641
    assert space["camera"].eltype.n == 121


def test_full_bijection_buttons(mapper):
    """to_factored → from_factored is identity over ALL 8641 joint buttons."""
    n = 8641
    joint = {
        "buttons": np.arange(n)[:, None],
        # a non-null camera for rows whose meta button is on; null otherwise is
        # forced by the decode, so pick arbitrary non-null bins
        "camera": np.full((n, 1), 3 * 11 + 7),
    }
    factored = mapper.to_factored(joint)
    back = mapper.from_factored(factored)
    # joint buttons survive exactly
    assert np.array_equal(back["buttons"][:, 0], joint["buttons"][:, 0])


def test_full_bijection_camera(mapper):
    """All 121 camera combos survive a round trip when the meta button is on."""
    n = 121
    # buttons joint index with camera meta ON: choose index 1 (all none + camera)
    joint = {
        "buttons": np.ones((n, 1), dtype=np.int64),
        "camera": np.arange(n)[:, None],
    }
    factored = mapper.to_factored(joint)
    back = mapper.from_factored(factored)
    # null camera decodes to camera-meta-off, which re-encodes to null camera idx
    null = mapper.camera_null_idx
    expect = np.arange(n)
    assert np.array_equal(np.where(expect == null, null, back["camera"][:, 0]), expect)


def test_null_action(mapper):
    assert mapper.get_zero_action() == {"buttons": 0}
    factored = mapper.to_factored({"buttons": np.array([[0]]), "camera": np.array([[mapper.camera_null_idx]])})
    assert np.all(factored["buttons"] == 0)
    assert np.all(factored["camera"] == mapper.camera_null_bin)


def test_camera_meta_off_forces_null_bins(mapper):
    # buttons joint 0 = everything none incl. camera meta → camera decode nulls
    out = mapper.to_factored({"buttons": np.array([[0]]), "camera": np.array([[0]])})
    assert np.all(out["camera"] == mapper.camera_null_bin)


def test_inventory_exclusive(mapper):
    buttons = np.zeros((1, 20), dtype=np.int64)
    buttons[0, Buttons.ALL.index("inventory")] = 1
    buttons[0, Buttons.ALL.index("attack")] = 1  # pressed together
    camera = np.array([[2, 9]])
    enc = mapper.from_factored({"buttons": buttons, "camera": camera})
    assert enc["buttons"][0, 0] == mapper.inventory_idx
    assert enc["camera"][0, 0] == mapper.camera_null_idx
    dec = mapper.to_factored(enc)
    expect = np.zeros(20, dtype=np.int64)
    expect[Buttons.ALL.index("inventory")] = 1
    assert np.array_equal(dec["buttons"][0], expect)


def test_later_button_wins(mapper):
    buttons = np.zeros((1, 20), dtype=np.int64)
    buttons[0, Buttons.ALL.index("hotbar.1")] = 1
    buttons[0, Buttons.ALL.index("hotbar.2")] = 1
    camera = np.full((1, 2), mapper.camera_null_bin)
    enc = mapper.from_factored({"buttons": buttons, "camera": camera})
    dec = mapper.to_factored(enc)
    assert dec["buttons"][0, Buttons.ALL.index("hotbar.2")] == 1
    assert dec["buttons"][0, Buttons.ALL.index("hotbar.1")] == 0


@pytest.mark.parametrize("a,b", [("forward", "back"), ("left", "right")])
def test_opposing_buttons_cancel(mapper, a, b):
    buttons = np.zeros((1, 20), dtype=np.int64)
    buttons[0, Buttons.ALL.index(a)] = 1
    buttons[0, Buttons.ALL.index(b)] = 1
    camera = np.full((1, 2), mapper.camera_null_bin)
    enc = mapper.from_factored({"buttons": buttons, "camera": camera})
    dec = mapper.to_factored(enc)
    assert dec["buttons"][0, Buttons.ALL.index(a)] == 0
    assert dec["buttons"][0, Buttons.ALL.index(b)] == 0


def test_independent_groups_compose(mapper):
    buttons = np.zeros((2, 20), dtype=np.int64)
    for name in ("forward", "sprint", "jump", "attack"):
        buttons[0, Buttons.ALL.index(name)] = 1
    camera = np.full((2, 2), mapper.camera_null_bin)
    camera[1] = [0, 10]
    enc = mapper.from_factored({"buttons": buttons, "camera": camera})
    dec = mapper.to_factored(enc)
    assert np.array_equal(dec["buttons"], buttons)
    assert np.array_equal(dec["camera"], camera)


def test_joint_index_matches_itertools_enumeration(mapper):
    """The vectorized mixed-radix joint index must reproduce the reference's
    itertools.product enumeration order (action_mapping.py:130)."""
    groups = list(mapper.BUTTONS_GROUPS.values())
    combos = list(itertools.product(*groups))
    rng = np.random.default_rng(0)
    for idx in rng.choice(len(combos), size=50, replace=False):
        combo = combos[idx]
        buttons = np.zeros((1, 20), dtype=np.int64)
        for choice in combo[:-1]:
            if choice != "none":
                buttons[0, Buttons.ALL.index(choice)] = 1
        cam_on = combo[-1] == "camera"
        camera = np.full((1, 2), mapper.camera_null_bin)
        if cam_on:
            camera[0] = [1, 2]
        enc = mapper.from_factored({"buttons": buttons, "camera": camera})
        assert enc["buttons"][0, 0] == idx, combo


def test_idm_mapping_is_identity():
    m = IDMActionMapping(n_camera_bins=11)
    ac = {"buttons": np.zeros((2, 20)), "camera": np.ones((2, 2))}
    assert m.from_factored(ac) is ac
    assert m.to_factored(ac) is ac
    space = m.get_action_space_update()
    assert space["buttons"].shape == (20,)
    assert space["camera"].eltype.n == 11
