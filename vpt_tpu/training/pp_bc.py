"""Pipeline-parallel BC training of the full policy.

Composes the three split points of ``MinecraftAgentPolicy`` (models/policy.py:
``embed`` → recurrent block stack → ``heads_from_recurrent``) into one jitted
train step where the block stack runs as a GPipe pipeline over the mesh's
``pp`` axis (parallel/pp.py) while the CNN front and head tail stay
data-parallel.  The published VPT configs (≤0.5B params) never need this —
dp/fsdp cover them — so this trainer is the *scale-out geometry* for
hypothetical much-deeper stacks; the replicated/fsdp ``BCTrainer`` stays the
production default.

Layout: the per-block parameters live STACKED on a leading layer axis,
sharded ``P("pp")``; everything else (CNN, heads, Adam moments of both trees)
follows the standard rules.  ``split_policy_params`` / ``merge_policy_params``
convert to/from the standard checkpoint layout, so weights round-trip to the
reference ``.weights`` format unchanged.

Numerics are IDENTICAL to ``BCTrainer``: same loss, same optimizer chain
(global-norm clip runs over the union of both trees — the same leaf set),
proven by ``tests/test_pp_bc.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.actions.mapping import CameraHierarchicalMapping
from vpt_tpu.config import PolicyConfig
from vpt_tpu.models.heads import dict_logprob, head_specs_from_space
from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state
from vpt_tpu.models.transformer import ResidualRecurrentBlock
from vpt_tpu.parallel.mesh import batch_sharded, make_mesh, replicated
from vpt_tpu.parallel.pp import pipelined_blocks, stack_block_params, unstack_block_params
from vpt_tpu.spaces import DictType
from vpt_tpu.training.bc import BCHyperparams, make_optimizer


def split_policy_params(params: Dict, n_block: int):
    """(standard params tree) → (rest tree, stacked block params)."""
    rl = dict(params["net"]["recurrent_layer"])
    blocks = [rl.pop(f"blocks_{i}") for i in range(n_block)]
    rest = {**params, "net": {**params["net"], "recurrent_layer": rl}}
    return rest, stack_block_params(blocks)


def merge_policy_params(rest: Dict, stacked, n_block: int) -> Dict:
    """Inverse of :func:`split_policy_params` (checkpoint layout)."""
    rl = dict(rest["net"]["recurrent_layer"])
    for i, p in enumerate(unstack_block_params(stacked, n_block)):
        rl[f"blocks_{i}"] = p
    return {**rest, "net": {**rest["net"], "recurrent_layer": rl}}


def block_from_config(cfg: PolicyConfig) -> ResidualRecurrentBlock:
    """One stack block with the exact construction the policy's
    ResidualRecurrentBlocks uses (models/transformer.py:408-429)."""
    from vpt_tpu.models.policy import _compute_dtype

    init_scale = cfg.n_recurrence_layers ** -0.5 if cfg.recurrence_is_residual else 1.0
    return ResidualRecurrentBlock(
        hidsize=cfg.hidsize,
        timesteps=cfg.timesteps,
        init_scale=init_scale,
        recurrence_type=cfg.recurrence_type,
        is_residual=cfg.recurrence_is_residual,
        use_pointwise_layer=cfg.use_pointwise_layer,
        pointwise_ratio=cfg.pointwise_ratio,
        pointwise_use_activation=cfg.pointwise_use_activation,
        attention_heads=cfg.attention_heads,
        attention_memory_size=cfg.attention_memory_size,
        attention_mask_style=cfg.attention_mask_style,
        dtype=_compute_dtype(cfg),
    )


class PPBCTrainer:
    """Sequence-chunked BC with the transformer stack pipelined over ``pp``.

    Mirrors ``BCTrainer``'s step semantics (loss, optimizer, truncated BPTT);
    see the module docstring for when to prefer it.
    """

    def __init__(
        self,
        policy_kwargs: Dict[str, Any],
        pi_head_kwargs: Dict[str, Any],
        hp: Optional[BCHyperparams] = None,
        mesh=None,
        n_micro: int = 4,
        compute_dtype: str = "float32",
        seed: int = 0,
    ):
        self.hp = hp or BCHyperparams()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_micro = n_micro
        self.cfg = PolicyConfig.from_kwargs(dict(policy_kwargs)).replace(
            compute_dtype=compute_dtype
        )
        assert self.cfg.recurrence_type == "transformer", "pp pipelines the transformer stack"
        self.n_block = self.cfg.n_recurrence_layers
        assert self.n_block % self.mesh.shape["pp"] == 0, (self.n_block, self.mesh.shape)
        self.temperature = float(pi_head_kwargs.get("temperature", 1.0))
        self.action_mapper = CameraHierarchicalMapping(n_camera_bins=11)
        space = DictType(**self.action_mapper.get_action_space_update())
        self.head_specs = head_specs_from_space(space)
        self.policy = MinecraftAgentPolicy(
            cfg=self.cfg, head_specs=self.head_specs, temperature=self.temperature
        )
        self.block = block_from_config(self.cfg)
        self.optimizer = make_optimizer(self.hp)
        self._seed = seed
        self.rest_params = None      # CNN + heads (replicated)
        self.stacked_params = None   # (n_block, ...) block params, P("pp")
        self.stats = None
        self.opt_state = None
        self.step_count = 0
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------ setup

    def init(self):
        if self.rest_params is not None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        img = jnp.zeros((1, 1) + tuple(self.cfg.img_shape), jnp.uint8)
        state = policy_initial_state(self.cfg, 1)
        variables = jax.jit(self.policy.init)(
            jax.random.PRNGKey(self._seed), img, jnp.zeros((1, 1), bool), state
        )
        rest, stacked = split_policy_params(variables["params"], self.n_block)
        repl = replicated(self.mesh)
        self.rest_params = jax.device_put(rest, repl)
        self.stacked_params = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(self.mesh, P("pp"))), stacked
        )
        self.stats = jax.device_put(variables["stats"], repl)
        # one optimizer over the (rest, stacked) pair: eager init preserves
        # each tree's placement (see parallel/fsdp.py:init_opt_state)
        from vpt_tpu.parallel.fsdp import init_opt_state

        self.opt_state = init_opt_state(
            self.optimizer, (self.rest_params, self.stacked_params), self.mesh
        )

    def checkpoint_params(self) -> Dict:
        """Standard-layout params tree (for save_weights / the converter)."""
        return merge_policy_params(
            jax.tree.map(np.asarray, self.rest_params),
            jax.tree.map(np.asarray, self.stacked_params),
            self.n_block,
        )

    # ------------------------------------------------------------------- step

    def _build_train_step(self):
        policy, specs, optimizer = self.policy, self.head_specs, self.optimizer
        block, mesh, n_micro = self.block, self.mesh, self.n_micro

        def block_apply(p, x, first, s):
            return block.apply({"params": p}, x, first, s)

        def loss_fn(rest, stacked, stats, batch, stacked_state):
            latents = policy.apply(
                {"params": rest, "stats": stats}, batch["frames"],
                method=lambda m, img: m.embed(img),
            )
            y, state_out = pipelined_blocks(
                block_apply, stacked, latents, batch["firsts"], stacked_state,
                mesh=mesh, n_micro=n_micro,
            )
            out = policy.apply(
                {"params": rest, "stats": stats}, y,
                method=lambda m, x: m.heads_from_recurrent(x),
            )
            actions = {
                "buttons": batch["buttons"][..., None],
                "camera": batch["camera"][..., None],
            }
            logp = dict_logprob(out["pi_logits"], actions, specs)
            mask = batch["mask"].astype(jnp.float32)
            loss = -(logp * mask).sum() / (logp.shape[0] * logp.shape[1])
            return loss, state_out

        def train_step(rest, stacked, stats, opt_state, batch, stacked_state):
            (loss, state_out), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(rest, stacked, stats, batch, stacked_state)
            import optax

            grad_norm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, (rest, stacked))
            # BC never backprops into the value head; torch Adam skips
            # grad-less params (no update, no weight decay) — mirror it
            # (see training/bc.py and tests/test_bc_loss_curve_parity.py)
            rest_up, stacked_up = updates
            rest_up = {
                k: (jax.tree.map(jnp.zeros_like, v) if k == "value_head" else v)
                for k, v in rest_up.items()
            }
            rest, stacked = optax.apply_updates((rest, stacked), (rest_up, stacked_up))
            state_out = jax.tree.map(jax.lax.stop_gradient, state_out)
            return rest, stacked, opt_state, state_out, loss, grad_norm

        return jax.jit(train_step, donate_argnums=(0, 1, 3, 5))

    def initial_state(self, batch_size: int):
        """Stacked recurrent state: leaves (n_block, B, ...), P("pp") on the
        layer axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = policy_initial_state(self.cfg, batch_size)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *state)
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(self.mesh, P("pp"))), stacked
        )

    def train_step(self, batch: Dict[str, np.ndarray], stacked_state):
        self.init()
        placed = {
            "frames": jnp.asarray(batch["frames"]),
            "buttons": jnp.asarray(batch["buttons"], jnp.int32),
            "camera": jnp.asarray(batch["camera"], jnp.int32),
            "firsts": jnp.asarray(batch["firsts"], bool),
            "mask": jnp.asarray(batch["mask"], bool),
        }
        placed = jax.tree.map(
            lambda x: jax.device_put(x, batch_sharded(self.mesh)), placed
        )
        (self.rest_params, self.stacked_params, self.opt_state,
         stacked_state, loss, grad_norm) = self._train_step(
            self.rest_params, self.stacked_params, self.stats,
            self.opt_state, placed, stacked_state,
        )
        self.step_count += 1
        return stacked_state, loss, grad_norm
