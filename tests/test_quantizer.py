import numpy as np
import pytest

from vpt_tpu.actions.quantizer import CameraQuantizer, QuantizationScheme
from vpt_tpu.actions.transformer import ActionTransformer
from vpt_tpu.actions.buttons import Buttons

MU_LAW = dict(
    camera_maxval=10, camera_binsize=2,
    quantization_scheme=QuantizationScheme.MU_LAW, mu=10.0,
)


def test_bin_count_and_null_bin():
    q = CameraQuantizer(**MU_LAW)
    assert q.n_bins == 11
    assert q.null_bin == 5


def test_zero_maps_to_null_bin():
    q = CameraQuantizer(**MU_LAW)
    assert np.all(q.discretize(np.zeros((4, 2))) == 5)
    assert np.allclose(q.undiscretize(np.full((4, 2), 5)), 0.0)


def test_round_trip_bins():
    """undiscretize → discretize is the identity on every bin index."""
    q = CameraQuantizer(**MU_LAW)
    bins = np.arange(11)
    assert np.array_equal(q.discretize(q.undiscretize(bins)), bins)


def test_round_trip_linear():
    q = CameraQuantizer(camera_maxval=10, camera_binsize=2)
    bins = np.arange(11)
    assert np.array_equal(q.discretize(q.undiscretize(bins)), bins)
    # linear centers are exact multiples
    assert np.allclose(q.undiscretize(bins), bins * 2 - 10)


def test_clipping():
    q = CameraQuantizer(**MU_LAW)
    assert q.discretize(np.array([1000.0])) == 10
    assert q.discretize(np.array([-1000.0])) == 0


def test_mu_law_golden():
    """Golden values computed independently from the mu-law formula
    sign(x)·log(1+mu|x|/max)/log(1+mu)·max, binned by round((v+max)/binsize)."""
    q = CameraQuantizer(**MU_LAW)
    x = np.array([0.5, -0.5, 2.0, -2.0, 10.0])
    v = np.sign(x) * np.log1p(10.0 * np.abs(x) / 10.0) / np.log1p(10.0) * 10.0
    expected = np.round((v + 10.0) / 2.0).astype(np.int64)
    assert np.array_equal(q.discretize(x), expected)


def test_mu_law_finer_near_zero():
    q = CameraQuantizer(**MU_LAW)
    lin = CameraQuantizer(camera_maxval=10, camera_binsize=2)
    # 0.6 degrees: invisible to linear binning, visible to mu-law
    assert lin.discretize(np.array([0.6]))[0] == lin.null_bin
    assert q.discretize(np.array([0.6]))[0] != q.null_bin


def test_monotonic():
    q = CameraQuantizer(**MU_LAW)
    x = np.linspace(-10, 10, 401)
    b = q.discretize(x)
    assert np.all(np.diff(b) >= 0)


def test_action_transformer_round_trip():
    at = ActionTransformer(camera_maxval=10, camera_binsize=2,
                           camera_quantization_scheme="mu_law", camera_mu=10)
    acs = {
        "buttons": np.array([[1] + [0] * 19, [0] * 20]),
        "camera": np.array([[3, 7], [5, 5]]),
    }
    env = at.policy2env(acs)
    assert env["attack"].tolist() == [1, 0]
    back = at.env2policy(env)
    assert np.array_equal(back["camera"], acs["camera"])
    assert np.array_equal(back["buttons"], acs["buttons"])


def test_env2policy_missing_buttons_default_zero():
    at = ActionTransformer()
    out = at.env2policy({"camera": np.zeros((3, 2))})
    assert out["buttons"].shape == (3, len(Buttons.ALL))
    assert np.all(out["buttons"] == 0)
