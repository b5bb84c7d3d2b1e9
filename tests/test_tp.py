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


def test_dp_tp_mesh_geometry():
    mesh = make_mesh(n_dp=4, n_tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh2 = make_mesh()  # all devices on dp
    assert mesh2.shape["dp"] == len(jax.devices())
