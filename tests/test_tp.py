"""Tensor-parallel sharding: forward under a (dp, tp) mesh must match the
replicated result, with kernels actually sharded over tp."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.heads import HeadSpec
from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state
from vpt_tpu.parallel.mesh import make_mesh
from vpt_tpu.parallel.tp import param_spec, shard_variables, variables_shardings

TINY = PolicyConfig(
    impala_width=1,
    impala_chans=(4, 8),
    obs_processing_width=32,
    img_shape=(32, 32, 3),
    group_norm_groups=1,
    impala_post_pool_groups=1,
    hidsize=64,
    recurrence_type="transformer",
    n_recurrence_layers=2,
    timesteps=4,
    attention_heads=4,
    attention_memory_size=8,
    use_pre_lstm_ln=False,
)
SPECS = (HeadSpec("buttons", (1,), 23), HeadSpec("camera", (1,), 9))


def test_param_spec_rules():
    assert param_spec(("net", "recurrent_layer", "blocks_0", "r", "orc_block", "q_layer", "kernel")) == P(None, "tp")
    assert param_spec(("net", "recurrent_layer", "blocks_0", "r", "orc_block", "proj_layer", "kernel")) == P("tp", None)
    assert param_spec(("net", "recurrent_layer", "blocks_0", "mlp0", "layer", "kernel")) == P(None, "tp")
    assert param_spec(("pi_head", "buttons", "linear_layer", "kernel")) == P(None, "tp")
    assert param_spec(("net", "final_ln", "scale")) == P()
    assert param_spec(("net", "img_process", "cnn", "stacks_0", "firstconv", "layer", "kernel")) == P()


def test_tp_forward_matches_replicated():
    mesh = make_mesh(n_dp=2, n_tp=4)
    model = MinecraftAgentPolicy(cfg=TINY, head_specs=SPECS, temperature=2.0)
    img = np.random.default_rng(0).integers(0, 255, (4, 4, 32, 32, 3), dtype=np.uint8)
    state = policy_initial_state(TINY, 4)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.zeros((4, 4), bool), state
    )
    out_repl, _ = model.apply(variables, jnp.asarray(img), jnp.zeros((4, 4), bool), state)

    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        sharded = shard_variables(variables, mesh)
    # kernels really are split over tp
    qk = sharded["params"]["net"]["recurrent_layer"]["blocks_0"]["r"]["orc_block"]["q_layer"]["kernel"]
    assert qk.sharding.spec == P(None, "tp")

    data_sh = NamedSharding(mesh, P("dp"))
    img_s = jax.device_put(jnp.asarray(img), data_sh)
    state_s = jax.device_put(state, data_sh)
    fwd = jax.jit(model.apply)
    out_tp, _ = fwd(sharded, img_s, jax.device_put(jnp.zeros((4, 4), bool), data_sh), state_s)
    np.testing.assert_allclose(
        np.asarray(out_tp["pi_logits"]["buttons"]),
        np.asarray(out_repl["pi_logits"]["buttons"]),
        rtol=2e-4, atol=2e-5,
    )


def test_tp_training_matches_single_device():
    """One BC train step on a (dp=2, tp=4) mesh must equal the 1-device step."""
    import numpy as np

    from vpt_tpu.training.bc import BCHyperparams, BCTrainer

    kwargs = dict(
        hidsize=64, impala_width=1, impala_chans=[4, 8], img_shape=[32, 32, 3],
        init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
        impala_kwargs={"post_pool_groups": 1}, n_recurrence_layers=2, timesteps=4,
        attention_heads=4, attention_memory_size=8, recurrence_type="transformer",
        attention_mask_style="clipped_causal", use_pre_lstm_ln=False,
        obs_processing_width=32,
    )
    rng = np.random.default_rng(7)
    batch = {
        "frames": rng.integers(0, 255, (8, 4, 32, 32, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (8, 4)).astype(np.int32),
        "camera": rng.integers(0, 121, (8, 4)).astype(np.int32),
        "firsts": np.zeros((8, 4), bool),
        "mask": np.ones((8, 4), bool),
    }

    def run(mesh):
        hp = BCHyperparams(batch_size=8, chunk_len=4, learning_rate=1e-3)
        t = BCTrainer(kwargs, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
        t.init()
        _, loss, gn = t.train_step(batch, t.initial_state(8))
        return float(loss), float(gn), jax.tree.map(np.asarray, t.variables["params"])

    loss_tp, gn_tp, p_tp = run(make_mesh(n_dp=2, n_tp=4))
    loss_1, gn_1, p_1 = run(make_mesh(n_dp=1))
    np.testing.assert_allclose(loss_tp, loss_1, rtol=1e-5)
    np.testing.assert_allclose(gn_tp, gn_1, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p_tp), jax.tree.leaves(p_1)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6)


def test_dp_tp_mesh_geometry():
    mesh = make_mesh(n_dp=4, n_tp=2)
    assert mesh.shape == {"pp": 1, "dp": 4, "fsdp": 1, "sp": 1, "tp": 2}
    mesh2 = make_mesh()  # all devices on dp
    assert mesh2.shape["dp"] == len(jax.devices())
