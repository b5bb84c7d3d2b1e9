"""BC loss-semantics parity: the T=1 chunked step must equal the reference's
per-sample accumulation sum(-logprob)/BATCH_SIZE (behavioural_cloning.py:117),
and bfloat16 compute must track float32 within tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.heads import HeadSpec, dict_logprob
from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state
from vpt_tpu.parallel.mesh import make_mesh
from vpt_tpu.training.bc import BCHyperparams, BCTrainer

TINY_KWARGS = dict(
    hidsize=64,
    impala_width=1,
    impala_chans=[4, 8],
    img_shape=[32, 32, 3],
    init_norm_kwargs={"batch_norm": False, "group_norm_groups": 1},
    impala_kwargs={"post_pool_groups": 1},
    n_recurrence_layers=2,
    timesteps=1,
    attention_heads=4,
    attention_memory_size=5,
    recurrence_type="transformer",
    attention_mask_style="clipped_causal",
    use_pre_lstm_ln=False,
    obs_processing_width=32,
)


def test_t1_loss_equals_reference_accumulation():
    mesh = make_mesh(n_dp=1)
    hp = BCHyperparams(batch_size=4, chunk_len=1)
    trainer = BCTrainer(TINY_KWARGS, {"temperature": 2.0}, hp=hp, mesh=mesh, seed=0)
    trainer.init()

    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "frames": rng.integers(0, 255, (B, 1, 32, 32, 3), dtype=np.uint8),
        "buttons": rng.integers(0, 8641, (B, 1)).astype(np.int32),
        "camera": rng.integers(0, 121, (B, 1)).astype(np.int32),
        "firsts": np.ones((B, 1), bool),
        "mask": np.ones((B, 1), bool),
    }
    state = trainer.initial_state(B)
    variables_before = jax.tree.map(np.asarray, trainer.variables)
    _, loss, _ = trainer.train_step(batch, state)

    # reference semantics: per-sample forward, loss = sum(-logprob) / B
    model = trainer.policy
    total = 0.0
    for i in range(B):
        s = policy_initial_state(trainer.cfg, 1)
        out, _ = model.apply(
            variables_before,
            jnp.asarray(batch["frames"][i : i + 1]),
            jnp.asarray(batch["firsts"][i : i + 1]),
            s,
        )
        lp = dict_logprob(
            out["pi_logits"],
            {
                "buttons": jnp.asarray(batch["buttons"][i : i + 1][..., None]),
                "camera": jnp.asarray(batch["camera"][i : i + 1][..., None]),
            },
            trainer.head_specs,
        )
        total += float(-lp[0, 0])
    np.testing.assert_allclose(float(loss), total / B, rtol=1e-5)


def test_bf16_forward_tracks_f32():
    cfg = PolicyConfig.from_kwargs(TINY_KWARGS).replace(timesteps=4, attention_memory_size=8)
    specs = (HeadSpec("buttons", (1,), 23), HeadSpec("camera", (1,), 9))
    img = np.random.default_rng(1).integers(0, 255, (2, 4, 32, 32, 3), dtype=np.uint8)
    state = policy_initial_state(cfg, 2)

    m32 = MinecraftAgentPolicy(cfg=cfg, head_specs=specs, temperature=2.0)
    variables = jax.jit(m32.init)(jax.random.PRNGKey(0), jnp.asarray(img), jnp.zeros((2, 4), bool), state)
    out32, _ = m32.apply(variables, jnp.asarray(img), jnp.zeros((2, 4), bool), state)

    mbf = MinecraftAgentPolicy(
        cfg=cfg.replace(compute_dtype="bfloat16"), head_specs=specs, temperature=2.0
    )
    state_bf = policy_initial_state(cfg.replace(compute_dtype="bfloat16"), 2)
    outbf, _ = mbf.apply(variables, jnp.asarray(img), jnp.zeros((2, 4), bool), state_bf)

    p32 = np.exp(np.asarray(out32["pi_logits"]["buttons"]))
    pbf = np.exp(np.asarray(outbf["pi_logits"]["buttons"]))
    # probabilities drift by at most a couple of percent absolute
    assert np.abs(p32 - pbf).max() < 0.05, np.abs(p32 - pbf).max()
