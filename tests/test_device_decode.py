"""Device-side action decode must exactly match the host decode path."""

import jax.numpy as jnp
import numpy as np

from vpt_tpu.actions.device_decode import DeviceActionDecoder, env_action_from_decoded
from vpt_tpu.actions.mapping import CameraHierarchicalMapping
from vpt_tpu.actions.transformer import ActionTransformer
from vpt_tpu.config import ACTION_TRANSFORMER_KWARGS


def test_device_decode_matches_host():
    mapper = CameraHierarchicalMapping(n_camera_bins=11)
    at = ActionTransformer(**ACTION_TRANSFORMER_KWARGS)
    decoder = DeviceActionDecoder(mapper, at.quantizer)

    rng = np.random.default_rng(0)
    buttons = rng.integers(0, 8641, 500)
    camera = rng.integers(0, 121, 500)

    decoded = np.asarray(decoder.decode(jnp.asarray(buttons), jnp.asarray(camera)))
    dev = env_action_from_decoded(decoded)

    host = at.policy2env(mapper.to_factored({"buttons": buttons[:, None], "camera": camera[:, None]}))
    for k in host:
        if k == "camera":
            np.testing.assert_allclose(dev[k], host[k], rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_array_equal(dev[k], host[k])


def test_agent_device_decode_equals_host_decode():
    from vpt_tpu.agent import MineRLAgent

    kwargs = dict(
        hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[64, 64, 3],
        init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
        impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2, timesteps=4,
        attention_heads=4, attention_memory_size=8, recurrence_type="transformer",
        attention_mask_style="clipped_causal", use_pre_lstm_ln=False,
        obs_processing_width=32,
    )
    a_dev = MineRLAgent(policy_kwargs=kwargs, pi_head_kwargs={"temperature": 2.0},
                        decode_on_device=True)
    a_host = MineRLAgent(policy_kwargs=kwargs, pi_head_kwargs={"temperature": 2.0},
                         decode_on_device=False)
    a_dev._ensure_variables()
    a_host.variables = a_dev.variables
    obs = {"pov": np.random.default_rng(1).integers(0, 255, (360, 640, 3), dtype=np.uint8)}
    x = a_dev.get_action(obs, stochastic=False)
    y = a_host.get_action(obs, stochastic=False)
    for k in x:
        np.testing.assert_allclose(x[k], y[k], rtol=1e-5, atol=1e-5)
    # vpred populated from the packed array
    v = a_dev.predict_value(obs)
    assert np.isfinite(v)
