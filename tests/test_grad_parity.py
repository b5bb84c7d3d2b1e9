"""End-to-end GRADIENT parity vs the reference torch implementation.

Forward parity (test_reference_oracle) bounds inference fidelity; this bounds
training fidelity at its root: from shared weights, the BC loss gradient of
every parameter must match torch's autograd within float32 noise.  This also
calibrates the endpoint tolerance of test_bc_loss_curve_parity — with grads
equal to ~1e-6, any final-parameter divergence is Adam sign-noise on
noise-dominated entries (bounded by n_steps · lr), not a modeling error.
"""

import numpy as np
import pytest

from test_reference_oracle import _install_reference, _torch_sd

SMALL_KWARGS = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[64, 64, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=2,
    attention_heads=4,
    attention_memory_size=6,
    recurrence_type="transformer",
    attention_mask_style="clipped_causal",
    use_pre_lstm_ln=False,
    obs_processing_width=256,
)


def test_bc_gradient_matches_torch():
    _install_reference()
    import jax
    import jax.numpy as jnp
    import torch as th
    from lib.action_mapping import CameraHierarchicalMapping as RefMapping
    from lib.policy import MinecraftAgentPolicy as RefPolicy

    import vpt_tpu.spaces as spaces
    from vpt_tpu.actions.mapping import CameraHierarchicalMapping
    from vpt_tpu.config import PolicyConfig
    from vpt_tpu.models.heads import dict_logprob, head_specs_from_space
    from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state
    from vpt_tpu.spaces import DictType

    cfg = PolicyConfig.from_kwargs(SMALL_KWARGS)
    mapper = CameraHierarchicalMapping(n_camera_bins=11)
    specs = head_specs_from_space(DictType(**mapper.get_action_space_update()))
    model = MinecraftAgentPolicy(cfg=cfg, head_specs=specs, temperature=2.0)

    B, T = 2, 2
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (B, T, 64, 64, 3), dtype=np.uint8)
    firsts = np.zeros((B, T), bool)
    firsts[:, 0] = True
    buttons = rng.integers(0, 8641, (B, T)).astype(np.int32)
    camera = rng.integers(0, 121, (B, T)).astype(np.int32)

    state0 = policy_initial_state(cfg, B)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(2), jnp.asarray(imgs), jnp.asarray(firsts), state0
    )

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "stats": variables["stats"]},
            jnp.asarray(imgs), jnp.asarray(firsts), state0,
        )
        logp = dict_logprob(
            out["pi_logits"],
            {"buttons": jnp.asarray(buttons)[..., None], "camera": jnp.asarray(camera)[..., None]},
            specs,
        )
        return -logp.sum() / (B * T)

    our_loss, our_grads = jax.value_and_grad(loss_fn)(variables["params"])
    from vpt_tpu.checkpoint.torch_import import variables_to_state_dict

    our_grad_sd = variables_to_state_dict({"params": our_grads, "stats": variables["stats"]})

    # ---- same loss, reference model, torch autograd
    ref_mapper = RefMapping(n_camera_bins=11)
    ref = RefPolicy(
        action_space=spaces.DictType(**ref_mapper.get_action_space_update()),
        policy_kwargs=SMALL_KWARGS,
        pi_head_kwargs={"temperature": 2.0},
    ).float().train()
    ref.load_state_dict(_torch_sd(variables), strict=True)

    th.set_grad_enabled(True)
    (pd, _, _), _ = ref(
        {"img": th.from_numpy(imgs)}, th.from_numpy(firsts), ref.initial_state(B)
    )
    action = {
        "buttons": th.from_numpy(buttons[..., None].astype(np.int64)),
        "camera": th.from_numpy(camera[..., None].astype(np.int64)),
    }
    ref_logp = ref.pi_head.logprob(action, pd)
    ref_loss = -ref_logp.sum() / (B * T)
    ref_loss.backward()
    th.set_grad_enabled(False)

    np.testing.assert_allclose(float(our_loss), float(ref_loss), rtol=1e-6)

    ref_grads = {name: p.grad for name, p in ref.named_parameters()}
    checked = 0
    for key, ours in our_grad_sd.items():
        if key.startswith("value_head"):
            continue  # no gradient flows there in either framework
        theirs = ref_grads.get(key)
        if theirs is None:
            continue
        ours = np.asarray(ours, np.float64)
        theirs = theirs.numpy().astype(np.float64).reshape(ours.shape)
        scale = max(np.abs(theirs).max(), 1e-8)
        assert np.abs(ours - theirs).max() <= max(2e-6, 1e-4 * scale), (
            key, np.abs(ours - theirs).max(), scale
        )
        checked += 1
    assert checked > 20, f"only {checked} gradient tensors compared"
