"""RL fine-tuning: PPO with a KL anchor to the frozen foundation policy.

The VPT paper's third phase fine-tunes the behaviour-cloned policy with
reinforcement learning, regularized by an auxiliary KL-divergence loss to the
frozen pretrained policy so exploration does not destroy the prior (the
published "rl-from-foundation/house/early-game" checkpoints, reference
README.md:63-79).  The reference release ships those checkpoints but **no RL
code** — this module supplies the capability TPU-natively:

  * batched rollout collection over N env streams driven by ONE jitted act
    step (same hot-loop design as the serving runtime, agent/agent.py);
  * recurrent PPO: the collected window is re-forwarded as a full (B, T)
    sequence chunk from the hidden-state snapshot taken at collection start
    (stepwise == chunkwise under the windowed-attention cache is proven by
    tests/test_kv_cache.py), so the update path is the same big-matmul
    geometry the MXU wants — no per-step Python in the update;
  * GAE(γ, λ) as a `lax.scan` over time with episode resets from `first`
    flags (the same flags that drive the attention-mask resets);
  * clipped-surrogate policy loss + value loss in EWMA-normalized return
    space (ScaledMSEHead semantics, reference lib/scaled_mse_head.py:37-43,
    with the normalizer statistics folded once per collected batch) + KL(π₀‖π_θ)
    anchor with a decaying coefficient;
  * the anchor policy's logits are computed ONCE per collected batch (they
    are constants w.r.t. θ) instead of re-running the frozen net every epoch;
  * the update step is jitted and data-parallel over the device mesh
    (minibatches shard streams on ``dp``, parameters replicated, XLA psums
    the gradients over ICI) — the same distribution scheme as BCTrainer,
    including fsdp/tp meshes: with an ``fsdp`` axis the trainable params,
    Adam moments, AND the frozen anchor copy all shard ZeRO-3 style
    (parallel/fsdp.py), tripling the HBM headroom PPO needs vs BC.

Exact RL-phase hyperparameters were not published in the reference release;
defaults below follow the paper's stated shape (PPO, γ close to 1 for
long-horizon Minecraft, KL anchor decayed over training) and are all
configurable.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vpt_tpu.actions import ActionTransformer
from vpt_tpu.actions.mapping import CameraHierarchicalMapping
from vpt_tpu.checkpoint import load_model_parameters, load_weights, save_weights, state_dict_to_variables
from vpt_tpu.config import ACTION_TRANSFORMER_KWARGS, PolicyConfig
from vpt_tpu.models.heads import (
    dict_entropy,
    dict_kl,
    dict_logprob,
    dict_sample,
    ewma_normalize,
    ewma_updated_stats,
    head_specs_from_space,
)
from vpt_tpu.models.policy import MinecraftAgentPolicy, policy_initial_state
from vpt_tpu.parallel.mesh import (
    batch_sharded,
    cross_host_barrier,
    host_tree,
    local_batch_rows,
    make_mesh,
    place_host_array,
    place_local_batch,
    replicated,
)
from vpt_tpu.spaces import DictType
from vpt_tpu.utils.metrics import MetricsLogger


@dataclasses.dataclass
class PPOHyperparams:
    learning_rate: float = 3e-5
    weight_decay: float = 0.0
    max_grad_norm: float = 5.0          # same clip as the BC phase
    gamma: float = 0.999                # long-horizon discount
    lam: float = 0.95                   # GAE
    clip_eps: float = 0.2               # PPO clipped-surrogate epsilon
    vf_coef: float = 0.5
    ent_coef: float = 0.0               # the KL anchor already regularizes
    kl_coef: float = 0.2                # ρ₀: weight of KL(π₀ ‖ π_θ)
    kl_decay: float = 0.9995            # ρ ← ρ·decay per update
    n_epochs: int = 3                   # PPO epochs per collected batch
    n_minibatches: int = 2              # stream-axis splits per epoch
    rollout_len: int = 40               # T steps collected per update
    normalize_advantages: bool = True
    # Pipelined collection: split the stream axis into G round-robin groups
    # so host work (env stepping, resize, decode) of group g overlaps the
    # device step of group g+1 — the same latency-hiding trick as the
    # serving runtime's GroupedRolloutRunner (agent/rollout.py:153).  The
    # update path is unchanged: per-group window snapshots concatenate into
    # the one (B, …) initial_state the chunkwise re-forward consumes
    # (equivalence proven by tests/test_rl.py::test_collect_snapshot_*).
    n_collect_groups: int = 1
    # Phasic policy gradient (Cobbe et al. 2021; the VPT paper's RL
    # algorithm): every ``aux_phase_every`` policy updates, run
    # ``aux_epochs`` of an auxiliary phase over the buffered rollouts that
    # trains the (trunk-shared) value head hard while a behavioral-cloning
    # KL to the pre-aux policy keeps π fixed.  0 = plain PPO.
    aux_phase_every: int = 0
    aux_epochs: int = 4
    beta_clone: float = 1.0
    # The anchor forward is the one graph in the update that sees the FULL
    # (B, T) window at once; at production geometries (64 streams x 64
    # steps, 2x width = 4096 frames) that single XLA program exceeds the
    # compiler's memory on constrained toolchains (observed: remote
    # tpu_compile_helper crash) and holds the whole window's activations
    # alive.  Batches over this many frames run the anchor forward in
    # stream-axis chunks — identical math (streams are independent given
    # their initial state), bounded compile + HBM.  0 disables chunking.
    anchor_fwd_max_frames: int = 1024


def compute_gae(rewards, values, firsts, last_value, last_first,
                gamma: float, lam: float):
    """Generalized advantage estimation over (B, T) with episode boundaries.

    ``firsts[:, t]`` is True when step t begins a new episode (so no reward
    or value flows backward across t−1 → t).  ``last_value`` bootstraps the
    step after the window; ``last_first`` marks a boundary there.

    :returns: (advantages, returns), both (B, T) float32.
    """
    rewards = rewards.astype(jnp.float32)
    values = values.astype(jnp.float32)
    next_firsts = jnp.concatenate(
        [firsts[:, 1:], last_first[:, None]], axis=1
    ).astype(jnp.float32)
    nonterm = 1.0 - next_firsts                        # (B, T)
    next_values = jnp.concatenate([values[:, 1:], last_value[:, None]], axis=1)
    deltas = rewards + gamma * next_values * nonterm - values

    def body(adv_next, xs):
        delta_t, nonterm_t = xs
        adv = delta_t + gamma * lam * nonterm_t * adv_next
        return adv, adv

    _, adv_rev = jax.lax.scan(
        body,
        jnp.zeros_like(last_value, jnp.float32),
        (deltas[:, ::-1].T, nonterm[:, ::-1].T),       # time-major
    )
    advantages = adv_rev.T[:, ::-1]
    return advantages, advantages + values


def groups_to_process_major(x, n_groups: int, n_procs: int, gb_local: int):
    """Reorder collected-state rows from GROUP-major to PROCESS-major.

    With pipelined collection, group g's global act batch holds
    [host0's gb_local streams of g | host1's | …], so concatenating the G
    group snapshots lays rows out [g0: h0,h1 | g1: h0,h1].  The update's
    global batch (``place_local_batch`` of each host's [g0,g1,…] buffer) is
    [h0: g0,g1 | h1: g0,g1].  This permutation makes state row i pair with
    batch row i; it is the identity when n_groups == 1 or n_procs == 1."""
    return (
        x.reshape((n_groups, n_procs, gb_local) + x.shape[1:])
        .swapaxes(0, 1)
        .reshape((-1,) + x.shape[1:])
    )


def make_ppo_optimizer(hp: PPOHyperparams) -> optax.GradientTransformation:
    steps = [optax.clip_by_global_norm(hp.max_grad_norm)]
    if hp.weight_decay:
        steps.append(optax.add_decayed_weights(hp.weight_decay))
    steps += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
              optax.scale(-hp.learning_rate)]
    return optax.chain(*steps)


class _ShapedRewardEnv:
    """Env proxy applying the trainer's ``reward_fn`` so evaluation scores
    episodes under the reward PPO optimizes, not the env's own."""

    def __init__(self, env, reward_fn: Callable):
        self._env, self._reward_fn = env, reward_fn

    def reset(self):
        return self._env.reset()

    def step(self, action):
        obs, reward, done, info = self._env.step(action)
        return obs, self._reward_fn(action, obs, reward, done), done, info


class _TrainerEvalAgent:
    """Adapter exposing the ``evaluate_episodes`` agent contract (get_action
    over raw env obs, ``batch_size``, ``_last_vpred``) on top of a
    PPOTrainer's current variables — fresh recurrent state, rng seeded by
    ``update_count`` so evaluation is reproducible and side-effect-free."""

    def __init__(self, trainer: "PPOTrainer", batch_size: int):
        self.trainer = trainer
        self.batch_size = batch_size
        # cache the jitted step on the trainer: evaluate() builds a fresh
        # adapter per call, and a fresh closure would recompile every eval
        if getattr(trainer, "_eval_act", None) is None:
            trainer._eval_act = trainer._build_eval_act()
        self._act = trainer._eval_act
        self._rng = jax.random.PRNGKey(1_000_003 + trainer.update_count)
        self._last_vpred = None
        ring = trainer.cfg.recurrence_type == "transformer"
        data_sh = batch_sharded(trainer.mesh)
        repl = replicated(trainer.mesh)

        def make_state():
            return policy_initial_state(trainer.cfg, batch_size, ring=ring)

        sh_tree = jax.tree.map(
            lambda s: repl if len(s.shape) == 0 else data_sh,
            jax.eval_shape(make_state),
        )
        self._state = jax.jit(make_state, out_shardings=sh_tree)()
        self._data_sh = data_sh

    def get_action(self, minerl_obs: List, first=None, stochastic: bool = True):
        t = self.trainer
        img = t._resize(minerl_obs)
        if first is None:
            first = np.zeros(self.batch_size, bool)
        action, vpred, self._state, self._rng = self._act(
            t.variables,
            jax.device_put(img, self._data_sh),
            jax.device_put(np.asarray(first, bool), self._data_sh),
            self._state,
            self._rng,
            stochastic,
        )
        self._last_vpred = np.asarray(vpred)
        env_actions = t._agent_action_to_env(
            {k: np.asarray(v) for k, v in action.items()}
        )
        return [
            {k: v[i] for k, v in env_actions.items()} for i in range(self.batch_size)
        ]


class PPOTrainer:
    """KL-anchored recurrent PPO over batched env streams."""

    def __init__(
        self,
        policy_kwargs: Dict[str, Any],
        pi_head_kwargs: Dict[str, Any],
        hp: Optional[PPOHyperparams] = None,
        mesh=None,
        compute_dtype: str = "float32",
        remat: bool = False,
        seed: int = 0,
    ):
        self.hp = hp or PPOHyperparams()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.cfg = PolicyConfig.from_kwargs(dict(policy_kwargs)).replace(
            compute_dtype=compute_dtype, remat=remat
        )
        assert self.hp.rollout_len <= self.cfg.timesteps, (
            f"rollout_len {self.hp.rollout_len} exceeds the policy's chunk "
            f"geometry timesteps={self.cfg.timesteps}"
        )
        self.temperature = float(pi_head_kwargs.get("temperature", 1.0))
        self.action_mapper = CameraHierarchicalMapping(n_camera_bins=11)
        self.action_transformer = ActionTransformer(**ACTION_TRANSFORMER_KWARGS)
        space = DictType(**self.action_mapper.get_action_space_update())
        self.head_specs = head_specs_from_space(space)
        self.policy = MinecraftAgentPolicy(
            cfg=self.cfg, head_specs=self.head_specs, temperature=self.temperature
        )
        self.optimizer = make_ppo_optimizer(self.hp)
        self._seed = seed
        self._rng = jax.random.PRNGKey(seed)
        self.variables = None
        self.anchor_params = None       # frozen foundation parameters (π₀)
        self.opt_state = None
        self.kl_coef = self.hp.kl_coef
        self.update_count = 0
        self._group_states = None   # per-group recurrent state (collection)
        self._cross_host_synced = False  # first-collective barrier fired?
        self._aux_buffer: List[Dict[str, Any]] = []  # PPG: rollouts since last aux phase
        self._act = self._build_act()
        self._eval_act = None   # compiled lazily on first evaluate()
        self._anchor_forward = self._build_anchor_forward()
        self._ppo_update = self._build_ppo_update()
        self._aux_step = self._build_aux_step()

    # ------------------------------------------------------------------ setup

    @property
    def _params_sharded(self) -> bool:
        """True when the mesh shards parameters (fsdp ZeRO-3 and/or tp).
        PPO benefits doubly from fsdp: the trainable params, the Adam
        moments, AND the frozen anchor copy all shard over the axis."""
        return (
            int(self.mesh.shape.get("fsdp", 1)) > 1
            or int(self.mesh.shape.get("tp", 1)) > 1
        )

    def _place_variables(self, variables):
        from vpt_tpu.parallel.fsdp import place_variables

        return place_variables(variables, self.mesh)

    def init(self):
        if self.variables is not None:
            return
        img = jnp.zeros((1, 1) + tuple(self.cfg.img_shape), jnp.uint8)
        state = policy_initial_state(self.cfg, 1)
        self.variables = jax.jit(self.policy.init)(
            jax.random.PRNGKey(self._seed), img, jnp.zeros((1, 1), bool), state
        )
        self.variables = self._place_variables(self.variables)
        from vpt_tpu.parallel.fsdp import init_opt_state

        self.opt_state = init_opt_state(self.optimizer, self.variables["params"], self.mesh)
        if self.anchor_params is None:
            self.anchor_params = self._snapshot_anchor()

    def _snapshot_anchor(self):
        """Device-side deep copy of the current parameters for the frozen π₀.

        A copy (not an alias) is required: the jitted PPO step donates the
        trainable parameter buffers, which would invalidate an aliased anchor.
        Eager jnp.copy preserves each leaf's committed (fsdp/tp) sharding."""
        return jax.tree.map(jnp.copy, self.variables["params"])

    def load_weights(self, path: str):
        """Load foundation weights into BOTH the trainable policy and the
        frozen KL anchor."""
        self.init()
        sd = load_weights(path)
        self.variables, report = state_dict_to_variables(
            sd, variables=host_tree(self.variables)
        )
        self.variables = self._place_variables(self.variables)
        self.anchor_params = self._snapshot_anchor()
        return report

    @classmethod
    def from_files(cls, in_model: str, in_weights: Optional[str] = None, **kw) -> "PPOTrainer":
        policy_kwargs, pi_head_kwargs = load_model_parameters(in_model)
        trainer = cls(policy_kwargs, pi_head_kwargs, **kw)
        trainer.init()
        if in_weights:
            trainer.load_weights(in_weights)
        return trainer

    # ------------------------------------------------------------ collection

    def _build_act(self):
        policy, specs = self.policy, self.head_specs

        def act(variables, img, first, state, key):
            out, state_out = policy.apply(variables, img[:, None], first[:, None], state)
            logits = {k: v[:, 0] for k, v in out["pi_logits"].items()}
            key, sub = jax.random.split(key)
            action = dict_sample(sub, logits, specs)
            logp = dict_logprob(logits, action, specs)
            return action, logp, out["vpred"][:, 0, 0], state_out, key

        # donate the recurrent state: the per-step concat+slice cache update
        # then writes in place instead of re-materializing 2×(B, maxlen, E)
        # per block per collection step (callers that need the pre-step state
        # afterwards — the window snapshot, the bootstrap call — pass a copy)
        return jax.jit(act, donate_argnums=(3,))

    def _resize(self, obs_list) -> np.ndarray:
        from vpt_tpu.data.video import native_resize_u8

        res = (self.cfg.img_shape[1], self.cfg.img_shape[0])
        return np.stack([native_resize_u8(o["pov"], res) for o in obs_list])

    def collect(self, envs: List, obs: Optional[List] = None,
                firsts: Optional[np.ndarray] = None,
                reward_fn: Optional[Callable] = None):
        """Roll ``hp.rollout_len`` steps of every env stream; returns the
        trajectory buffer the update consumes, plus (obs, firsts) to thread
        into the next collect call.

        ``envs`` are the streams THIS HOST owns.  Multi-host (after
        ``maybe_initialize_distributed``): every process calls collect in
        lockstep with the same stream count; each device step runs over the
        global (all-host) batch, and the returned buffer holds the local
        rows.  Ranks rendezvous once before this trainer's first collective
        dispatch (same rationale as BCTrainer's first-step barrier: gloo's
        context init has a hard 30 s window, and init-compile skew across
        ranks is unbounded).

        With ``hp.n_collect_groups > 1`` the streams run as round-robin
        groups: host work for one group overlaps device compute (and D2H
        transfers) of the others — the serving runtime's latency-hiding
        pattern applied to RL collection.

        :param reward_fn: optional ``f(env_action, obs, env_reward, done) ->
            float`` per stream, overriding the env's reward (MineRL basalt
            envs emit none — the VPT RL phase defines its own).
        """
        self.init()
        self._sync_ranks_once()
        return self._collect_grouped(envs, obs, firsts, reward_fn)

    def _sync_ranks_once(self) -> None:
        """Collapse rank skew (init/compile/loader startup) before this
        trainer's FIRST cross-host collective dispatch.  A rank that starts
        a gloo context init >30 s before its peers arrive kills the job
        ('Gloo context initialization failed'); the barrier is pure gRPC
        through the coordination service, so it carries no such window."""
        if self._cross_host_synced or jax.process_count() == 1:
            return
        cross_host_barrier("ppo_first_collective")
        self._cross_host_synced = True

    def _collect_grouped(self, envs: List, obs: Optional[List],
                         firsts: Optional[np.ndarray],
                         reward_fn: Optional[Callable]):
        """Pipelined collection: G round-robin stream groups through the one
        compiled act step (G = 1 is plain serial collection — same code
        path, one group).  While group g's (action, logp, vpred) transfer
        back and its envs step on the host, groups g+1…G-1's device steps are
        already in flight — on a remote-attached chip this hides the D2H
        round trip; on a real host it hides env stepping and resize.

        Buffer layout is group-count-invariant: group g owns stream rows
        [g·gb, (g+1)·gb); per-group window-start snapshots concatenate into
        the single (B, …) ``initial_state`` the chunkwise update re-forwards
        from."""
        hp = self.hp
        G = max(1, hp.n_collect_groups)
        # envs are the streams THIS HOST owns; the device batch is global
        # (every process contributes its own rows via place_local_batch)
        nproc = jax.process_count()
        b, t_len = len(envs), hp.rollout_len
        assert b % G == 0, (b, G)
        gb = b // G
        gb_global = gb * nproc
        n_data = int(np.prod([
            self.mesh.shape[a] for a in ("dp", "fsdp") if a in self.mesh.axis_names
        ]))
        assert gb % max(n_data // nproc, 1) == 0, (
            f"per-host streams/groups = {gb} must divide over the mesh's "
            f"{n_data // nproc} local data-parallel devices "
            f"(local streams={b}, n_collect_groups={G})"
        )
        data_sh = batch_sharded(self.mesh)
        repl = replicated(self.mesh)
        ring = self.cfg.recurrence_type == "transformer"
        if obs is None:
            obs = [e.reset() for e in envs]
            firsts = np.ones(b, bool)
            self._group_states = None
        if firsts is None:
            firsts = np.zeros(b, bool)
        firsts = np.asarray(firsts, bool).copy()
        if getattr(self, "_group_states", None) is None:
            # built as a GLOBAL computation: under multi-host meshes a
            # device_put of host zeros can't reach other hosts' devices
            def make_state():
                return policy_initial_state(self.cfg, gb_global, ring=ring)

            sh_tree = jax.tree.map(
                lambda s: repl if len(s.shape) == 0 else data_sh,
                jax.eval_shape(make_state),
            )
            make_jit = jax.jit(make_state, out_shardings=sh_tree)
            self._group_states = [make_jit() for _ in range(G)]

        # per-group window-start snapshots → one (B, …) linear-layout state
        snapshots = []
        for s in self._group_states:
            if isinstance(s[0], dict) and "idx" in s[0]:
                from vpt_tpu.models.transformer import ring_state_to_linear

                snapshots.append([ring_state_to_linear(blk) for blk in s])
            else:
                snapshots.append(jax.tree.map(jnp.copy, s))
        initial_state = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *snapshots
        )
        if nproc > 1 and G > 1:
            initial_state = jax.tree.map(
                lambda x: groups_to_process_major(x, G, nproc, gb), initial_state
            )

        buf = {
            "frames": np.zeros((b, t_len) + tuple(self.cfg.img_shape), np.uint8),
            "buttons": np.zeros((b, t_len), np.int32),
            "camera": np.zeros((b, t_len), np.int32),
            "logp_old": np.zeros((b, t_len), np.float32),
            "values": np.zeros((b, t_len), np.float32),
            "rewards": np.zeros((b, t_len), np.float32),
            "firsts": np.zeros((b, t_len), bool),
        }
        slices = [slice(g * gb, (g + 1) * gb) for g in range(G)]
        pending: List = [None] * G

        def dispatch(g: int, t: int):
            sl = slices[g]
            img = self._resize(obs[sl])
            buf["frames"][sl, t] = img
            buf["firsts"][sl, t] = firsts[sl]
            img_d = place_local_batch(img, data_sh)
            first_d = place_local_batch(firsts[sl], data_sh)
            action, logp, vpred, self._group_states[g], self._rng = self._act(
                self.variables, img_d, first_d, self._group_states[g], self._rng
            )
            for x in (logp, vpred, *action.values()):
                try:
                    x.copy_to_host_async()
                except Exception:
                    pass
            pending[g] = (t, action, logp, vpred)

        def harvest(g: int):
            t, action, logp, vpred = pending[g]
            pending[g] = None
            sl = slices[g]
            # multi-host: the act outputs are global (gb_global, …) arrays;
            # this host's env rows are exactly its addressable shards
            action = {k: local_batch_rows(v) for k, v in action.items()}
            buf["buttons"][sl, t] = action["buttons"][:, 0]
            buf["camera"][sl, t] = action["camera"][:, 0]
            buf["logp_old"][sl, t] = local_batch_rows(logp)
            buf["values"][sl, t] = local_batch_rows(vpred)
            env_actions = self._agent_action_to_env(action)
            group_envs = envs[sl]
            next_firsts = np.zeros(gb, bool)
            for i, env in enumerate(group_envs):
                env_action = {k: v[i] for k, v in env_actions.items()}
                ob, reward, done, _info = env.step(env_action)
                if reward_fn is not None:
                    reward = reward_fn(env_action, ob, reward, done)
                buf["rewards"][sl.start + i, t] = reward
                if done:
                    ob = env.reset()
                    next_firsts[i] = True
                obs[sl.start + i] = ob
            firsts[sl] = next_firsts

        for g in range(G):
            dispatch(g, 0)
        for t in range(t_len):
            for g in range(G):
                harvest(g)
                if t + 1 < t_len:
                    dispatch(g, t + 1)

        # bootstrap values; feed act a COPY (it donates its state argument)
        last_handles = []
        for g in range(G):
            sl = slices[g]
            img_d = place_local_batch(self._resize(obs[sl]), data_sh)
            first_d = place_local_batch(firsts[sl], data_sh)
            _, _, last_value, _, self._rng = self._act(
                self.variables, img_d, first_d,
                jax.tree.map(jnp.copy, self._group_states[g]), self._rng
            )
            last_handles.append(last_value)
        buf["last_value"] = np.concatenate([local_batch_rows(v) for v in last_handles])
        buf["last_first"] = firsts.copy()
        buf["initial_state"] = initial_state
        return buf, obs, firsts

    def _agent_action_to_env(self, agent_action) -> Dict[str, np.ndarray]:
        factored = self.action_mapper.to_factored(
            {k: np.asarray(v) for k, v in agent_action.items()}
        )
        return self.action_transformer.policy2env(factored)

    # ------------------------------------------------------------- evaluation

    def _build_eval_act(self):
        """Like ``_act`` but with a static deterministic switch and no logp —
        the evaluation path (fresh state, dedicated envs, separate rng)."""
        policy, specs = self.policy, self.head_specs

        def eval_act(variables, img, first, state, key, stochastic):
            out, state_out = policy.apply(variables, img[:, None], first[:, None], state)
            logits = {k: v[:, 0] for k, v in out["pi_logits"].items()}
            key, sub = jax.random.split(key)
            action = dict_sample(sub, logits, specs, deterministic=not stochastic)
            return action, out["vpred"][:, 0, 0], state_out, key

        return jax.jit(eval_act, static_argnames=("stochastic",), donate_argnums=(3,))

    def evaluate(self, envs: List, n_episodes: int, max_episode_steps: int = 500,
                 reward_fn: Optional[Callable] = None, stochastic: bool = True,
                 record_path: Optional[str] = None) -> Dict:
        """Roll the CURRENT policy over dedicated eval envs until
        ``n_episodes`` finish; returns the ``evaluate_episodes`` report
        (per-episode returns/lengths, action statistics, latency).

        The rollout uses a fresh recurrent state and an rng derived from
        ``update_count`` only — evaluating never perturbs the training
        trajectory (the trainer's own rng is untouched), so a run with
        ``eval_every`` set optimizes identically to one without.

        ``reward_fn`` (same ``f(env_action, obs, reward, done)`` contract as
        :meth:`collect`) scores episodes under the shaped reward PPO is
        actually optimizing.  Single-process only: episode completion is
        data-dependent, so per-host act-call counts would diverge and
        deadlock any cross-host collective.
        """
        assert jax.process_count() == 1, (
            "evaluate() is single-process; run it from a one-host job or "
            "gate it on jax.process_index() == 0 with a process-local mesh"
        )
        from vpt_tpu.agent.evaluation import evaluate_episodes

        self.init()
        if reward_fn is not None:
            envs = [_ShapedRewardEnv(e, reward_fn) for e in envs]
        return evaluate_episodes(
            _TrainerEvalAgent(self, len(envs)),
            envs,
            n_episodes,
            max_episode_steps=max_episode_steps,
            stochastic=stochastic,
            record_path=record_path,
        )

    # ---------------------------------------------------------------- update

    def _anchor_logits(self, frames_d, firsts_d, state):
        """Anchor-policy (π₀) logits for the whole collected window.

        Windows over ``hp.anchor_fwd_max_frames`` run in stream-axis chunks
        through the SAME jitted forward (one compile at the chunk shape,
        reused): each stream's rows and initial state slice independently,
        so chunking changes nothing but the compiled program's size.
        Multi-host runs keep the one-shot path — the global arrays there
        are not addressable for host-side stream slicing."""
        stats = self.variables["stats"]
        b, t = frames_d.shape[:2]
        max_frames = self.hp.anchor_fwd_max_frames
        if jax.process_count() > 1 or max_frames <= 0 or b * t <= max_frames:
            return self._anchor_forward(self.anchor_params, stats,
                                        frames_d, firsts_d, state)
        rows = max(1, max_frames // t)
        while b % rows:                 # largest divisor of b that fits
            rows -= 1
        outs = []
        for i in range(0, b, rows):
            sl = slice(i, i + rows)
            st = jax.tree.map(lambda x: x[sl], state)
            outs.append(self._anchor_forward(
                self.anchor_params, stats, frames_d[sl], firsts_d[sl], st))
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    def _build_anchor_forward(self):
        policy = self.policy

        def forward(params, stats, frames, firsts, state):
            out, _ = policy.apply({"params": params, "stats": stats}, frames, firsts, state)
            return out["pi_logits"]

        return jax.jit(forward)

    def _build_ppo_update(self):
        policy, specs, optimizer, hp = self.policy, self.head_specs, self.optimizer, self.hp

        def loss_fn(params, stats, mb, state, kl_coef):
            out, _ = policy.apply(
                {"params": params, "stats": stats}, mb["frames"], mb["firsts"], state
            )
            logits = out["pi_logits"]
            actions = {
                "buttons": mb["buttons"][..., None],
                "camera": mb["camera"][..., None],
            }
            logp = dict_logprob(logits, actions, specs)           # (B, T)
            log_ratio = logp - mb["logp_old"]
            ratio = jnp.exp(log_ratio)
            adv = mb["adv"]
            pg = -jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1.0 - hp.clip_eps, 1.0 + hp.clip_eps) * adv,
            ).mean()
            # value regression in EWMA-normalized return space
            # (reference: lib/scaled_mse_head.py:37-43)
            target = ewma_normalize(stats["value_head"], mb["returns"][..., None])
            v_loss = jnp.mean((out["vpred_raw"].astype(jnp.float32) - target) ** 2)
            entropy = dict_entropy(logits, specs).mean()
            anchor_kl = dict_kl(mb["anchor_logits"], logits, specs).mean()
            total = pg + hp.vf_coef * v_loss - hp.ent_coef * entropy + kl_coef * anchor_kl
            aux = {
                "pg_loss": pg,
                "v_loss": v_loss,
                "entropy": entropy,
                "anchor_kl": anchor_kl,
                # E[(r−1) − log r] ≥ 0, the low-variance approx-KL(θ_old‖θ) estimator
                "approx_kl": jnp.mean((ratio - 1.0) - log_ratio),
                "clip_frac": jnp.mean((jnp.abs(ratio - 1.0) > hp.clip_eps).astype(jnp.float32)),
            }
            return total, aux

        def ppo_step(variables, opt_state, mb, state, kl_coef):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                variables["params"], variables["stats"], mb, state, kl_coef
            )
            aux["grad_norm"] = optax.global_norm(grads)
            aux["loss"] = loss
            updates, opt_state = optimizer.update(grads, opt_state, variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return {"params": params, "stats": variables["stats"]}, opt_state, aux

        def ppo_epochs(variables, opt_state, batch, initial_state, kl_coef, key):
            """All PPO epochs over one collected batch in ONE jitted call:
            the batch stays device-resident across epochs, each epoch's
            stream permutation is a device `jax.random.permutation`, and
            minibatches are dynamic-slice gathers of the resident batch —
            zero host↔device traffic after the single initial placement
            (round 2 re-uploaded every epoch's minibatches from host)."""
            b = batch["logp_old"].shape[0]
            mb_size = b // hp.n_minibatches

            def epoch_body(carry, ekey):
                def mb_body(carry, m):
                    variables, opt_state = carry
                    idx = jax.lax.dynamic_slice_in_dim(perm, m * mb_size, mb_size)
                    mb = jax.tree.map(
                        lambda x: jnp.take(x, idx, axis=0, unique_indices=True), batch
                    )
                    smb = jax.tree.map(
                        lambda x: jnp.take(x, idx, axis=0, unique_indices=True),
                        initial_state,
                    )
                    variables, opt_state, aux = ppo_step(
                        variables, opt_state, mb, smb, kl_coef
                    )
                    return (variables, opt_state), aux

                perm = jax.random.permutation(ekey, b)
                carry, auxes = jax.lax.scan(
                    mb_body, carry, jnp.arange(hp.n_minibatches)
                )
                return carry, jax.tree.map(lambda x: x[-1], auxes)

            keys = jax.random.split(key, hp.n_epochs)
            (variables, opt_state), auxes = jax.lax.scan(
                epoch_body, (variables, opt_state), keys
            )
            return variables, opt_state, jax.tree.map(lambda x: x[-1], auxes)

        if self._params_sharded:
            # params/moments carry explicit fsdp/tp shardings on the arrays;
            # jit propagates them through SPMD, donation keeps them in place
            return jax.jit(ppo_epochs, donate_argnums=(0, 1))
        data_sh = batch_sharded(self.mesh)
        repl = replicated(self.mesh)
        return jax.jit(
            ppo_epochs,
            in_shardings=(repl, repl, data_sh, data_sh, repl, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )

    def _build_aux_step(self):
        """PPG auxiliary objective: value regression + β_clone·KL(π_old ‖ π_θ).

        π and V share the trunk here (as in the VPT architecture), so the aux
        phase is how the value function trains hard without wrecking the
        policy — the clone KL pins π to its pre-aux snapshot.  The Adam state
        is shared with the policy phase (single-network PPG)."""
        policy, hp, specs = self.policy, self.hp, self.head_specs
        optimizer = self.optimizer

        def aux_step(variables, opt_state, mb, state):
            def loss_fn(params, stats):
                out, _ = policy.apply(
                    {"params": params, "stats": stats}, mb["frames"], mb["firsts"], state
                )
                target = ewma_normalize(stats["value_head"], mb["returns"][..., None])
                v_loss = jnp.mean((out["vpred_raw"].astype(jnp.float32) - target) ** 2)
                clone_kl = dict_kl(mb["old_logits"], out["pi_logits"], specs).mean()
                return v_loss + hp.beta_clone * clone_kl, (v_loss, clone_kl)

            (loss, (v_loss, clone_kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                variables["params"], variables["stats"]
            )
            updates, opt_state = optimizer.update(grads, opt_state, variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return (
                {"params": params, "stats": variables["stats"]},
                opt_state,
                {"aux_v_loss": v_loss, "aux_clone_kl": clone_kl},
            )

        if self._params_sharded:
            return jax.jit(aux_step, donate_argnums=(0, 1))
        data_sh = batch_sharded(self.mesh)
        repl = replicated(self.mesh)
        return jax.jit(
            aux_step,
            in_shardings=(repl, repl, data_sh, data_sh),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )

    def _aux_phase(self) -> Dict[str, float]:
        """Run ``aux_epochs`` over every rollout buffered since the last aux
        phase; clears the buffer.  Clone targets (π just before aux) are
        computed once per rollout."""
        hp = self.hp
        data_sh = batch_sharded(self.mesh)
        prepared = []
        for entry in self._aux_buffer:
            frames = place_local_batch(entry["frames"], data_sh)
            firsts = place_local_batch(entry["firsts"], data_sh)
            old_logits = self._anchor_forward(
                self.variables["params"], self.variables["stats"],
                frames, firsts, entry["initial_state"],
            )
            prepared.append((
                {
                    "frames": frames,
                    "firsts": firsts,
                    "returns": place_local_batch(entry["returns"], data_sh),
                    "old_logits": old_logits,
                },
                entry["initial_state"],
            ))
        self._aux_buffer = []
        aux = {"aux_v_loss": float("nan"), "aux_clone_kl": float("nan")}
        for _ in range(hp.aux_epochs):
            for mb, state in prepared:
                self.variables, self.opt_state, aux = self._aux_step(
                    self.variables, self.opt_state, mb, state
                )
        return {k: float(v) for k, v in aux.items()}

    def _fold_return_stats(self, returns: np.ndarray):
        """Fold the batch's return targets into the value head's EWMA stats
        once per collected batch (the reference normalizer updates inside
        every loss call; per-batch keeps the target fixed across PPO epochs)."""
        stats = jax.tree.map(np.asarray, self.variables["stats"])
        stats["value_head"] = jax.tree.map(
            np.asarray,
            ewma_updated_stats(
                jax.tree.map(jnp.asarray, stats["value_head"]),
                jnp.asarray(returns[..., None]),
            ),
        )
        # re-place only the stats (always replicated); the params keep their
        # committed placement — replicated OR fsdp/tp-sharded.  place_host_array
        # skips device_put's cross-process equality allgather (the stats are
        # identical on every rank: same all-host-gathered returns folded in)
        from vpt_tpu.parallel.mesh import place_host_array

        repl = replicated(self.mesh)
        self.variables = {
            "params": self.variables["params"],
            "stats": jax.tree.map(lambda x: place_host_array(x, repl), stats),
        }

    def update(self, traj: Dict[str, np.ndarray]) -> Dict[str, float]:
        """PPO epochs over one collected trajectory batch; returns metrics.

        Multi-host: ``traj`` holds THIS host's stream rows; every process
        calls update() in lockstep, the rows assemble into one global batch,
        and the statistics that feed replicated state (advantage
        normalization, the value head's EWMA fold) are computed over the
        all-host gather so every process applies identical updates."""
        self.init()
        self._sync_ranks_once()
        hp = self.hp
        nproc = jax.process_count()
        b = traj["frames"].shape[0]          # this host's streams
        assert (b * nproc) % hp.n_minibatches == 0, (b, nproc, hp.n_minibatches)
        data_sh = batch_sharded(self.mesh)

        # GAE is per-stream math — local rows suffice
        adv, returns = compute_gae(
            jnp.asarray(traj["rewards"]), jnp.asarray(traj["values"]),
            jnp.asarray(traj["firsts"]), jnp.asarray(traj["last_value"]),
            jnp.asarray(traj["last_first"]), hp.gamma, hp.lam,
        )
        adv, returns = np.asarray(adv), np.asarray(returns)
        if nproc > 1:
            from jax.experimental import multihost_utils

            adv_all = multihost_utils.process_allgather(adv, tiled=True)
            returns_all = multihost_utils.process_allgather(returns, tiled=True)
        else:
            adv_all, returns_all = adv, returns
        if hp.normalize_advantages:
            adv = (adv - adv_all.mean()) / (adv_all.std() + 1e-8)

        self._fold_return_stats(returns_all)

        frames_d = place_local_batch(traj["frames"], data_sh)
        firsts_d = place_local_batch(traj["firsts"], data_sh)
        initial_state = traj["initial_state"]
        anchor_logits = self._anchor_logits(frames_d, firsts_d, initial_state)

        batch = {
            "frames": frames_d,
            "firsts": firsts_d,
            "buttons": place_local_batch(traj["buttons"], data_sh),
            "camera": place_local_batch(traj["camera"], data_sh),
            "logp_old": place_local_batch(traj["logp_old"], data_sh),
            "adv": place_local_batch(adv.astype(np.float32), data_sh),
            "returns": place_local_batch(returns.astype(np.float32), data_sh),
            "anchor_logits": anchor_logits,
        }

        # all epochs run device-side in one jitted call (permutation, gather,
        # and optimizer steps) — no per-epoch host round trips.  The
        # initial_state from collect is already a global device array; only
        # re-place it in the single-host case (callers may pass host trees)
        if nproc == 1:
            initial_state = jax.device_put(initial_state, data_sh)
        self._rng, update_key = jax.random.split(self._rng)
        self.variables, self.opt_state, last_aux = self._ppo_update(
            self.variables, self.opt_state, batch,
            initial_state,
            jnp.float32(self.kl_coef), update_key,
        )
        self.kl_coef *= hp.kl_decay
        self.update_count += 1
        metrics = {k: float(v) for k, v in last_aux.items()}
        metrics.update(
            # local means: every host has the same stream count, so the
            # global means are the all-host averages of these (logged per
            # rank; rank 0's line is the canonical record)
            mean_reward=float(traj["rewards"].mean()),
            mean_return=float(returns_all.mean()),
            kl_coef=self.kl_coef,
        )
        if hp.aux_phase_every:
            # PPG: buffer this rollout (host frames stay host; returns are the
            # aux value targets) and run the auxiliary phase on schedule
            self._aux_buffer.append({
                "frames": traj["frames"],
                "firsts": traj["firsts"],
                "returns": returns.astype(np.float32),
                "initial_state": initial_state,
            })
            if self.update_count % hp.aux_phase_every == 0:
                metrics.update(self._aux_phase())
        return metrics

    # ------------------------------------------------------- checkpoint/resume

    def _ckpt_trees(self):
        return (
            {
                "variables": host_tree(self.variables),
                "anchor_params": host_tree(self.anchor_params),
            },
            host_tree(self.opt_state),
        )

    def save_checkpoint(self, directory: str) -> None:
        """Preemption-safe snapshot: policy + frozen anchor + optimizer
        moments + (kl_coef, update_count, rng) — everything a resumed run
        needs to continue the anneal exactly.

        Multi-host: a COLLECTIVE — every rank runs the host pull (cross-host
        fsdp/tp leaves allgather) and joins orbax's save sync inside
        ``native_ckpt.save_checkpoint``, which elects the writer; PPO has no
        per-rank data cursor (env streams restart on resume), and ``resume``
        reads the same shared directory on every rank."""
        from vpt_tpu.checkpoint import native as native_ckpt

        trees, opt = self._ckpt_trees()
        native_ckpt.save_checkpoint(
            directory,
            self.update_count,
            trees,
            opt_state=opt,
            data_state={"kl_coef": self.kl_coef, "update_count": self.update_count},
            rng_key=np.asarray(self._rng),
        )

    def resume(self, directory: str) -> bool:
        """Restore the latest checkpoint from ``directory``; returns False
        when none exists."""
        from vpt_tpu.checkpoint import native as native_ckpt

        self.init()
        trees, opt = self._ckpt_trees()
        template = {"variables": trees, "opt_state": opt, "rng_key": np.asarray(self._rng)}
        payload, data_state = native_ckpt.restore_checkpoint(directory, template=template)
        if payload is None:
            return False
        from vpt_tpu.parallel.fsdp import init_opt_state, place_variables

        self.variables = self._place_variables(payload["variables"]["variables"])
        self.anchor_params = place_variables(
            {"params": payload["variables"]["anchor_params"]}, self.mesh
        )["params"]
        ref_state = init_opt_state(self.optimizer, self.variables["params"], self.mesh)
        self.opt_state = jax.tree.map(
            lambda ref, x: place_host_array(x, ref.sharding), ref_state, payload["opt_state"]
        )
        self._rng = jnp.asarray(payload["rng_key"])
        self.kl_coef = float(data_state["kl_coef"])
        self.update_count = int(data_state["update_count"])
        self._group_states = None  # envs restart; state re-initializes on collect
        return True

    # ------------------------------------------------------------------- run

    def train(
        self,
        envs: List,
        n_updates: int,
        out_weights: Optional[str] = None,
        reward_fn: Optional[Callable] = None,
        metrics: Optional[MetricsLogger] = None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 0,
        resume: bool = False,
        eval_envs: Optional[List] = None,
        eval_every: int = 0,
        eval_episodes: int = 8,
        eval_max_steps: int = 500,
        eval_record_dir: Optional[str] = None,
    ) -> Dict[str, float]:
        """collect → update loop over persistent env streams.

        With ``checkpoint_dir``, snapshots every ``checkpoint_every`` updates
        and on SIGTERM/SIGINT (preemption); ``resume=True`` continues from the
        newest snapshot (same contract as BCTrainer.train).

        With ``eval_envs`` and ``eval_every`` > 0, rolls the current policy
        over those DEDICATED envs (never the training streams — their state
        and recurrent context survive evaluation untouched) before the first
        update and after every ``eval_every``-th, logging the
        :meth:`evaluate` report summary as an ``event="eval"`` metrics line —
        the "did the fine-tune help" curve alongside the loss curve."""
        import signal

        self.init()
        if resume and checkpoint_dir:
            self.resume(checkpoint_dir)
        metrics = metrics or MetricsLogger()
        stop_requested = {"flag": False}

        def _request_stop(signum, frame):
            stop_requested["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # non-main thread
                pass
        obs, firsts = None, None
        start = time.time()
        frames = 0
        report: Dict[str, float] = {}

        def run_eval():
            rec = None
            if eval_record_dir:
                os.makedirs(eval_record_dir, exist_ok=True)
                rec = os.path.join(eval_record_dir,
                                   f"eval-{self.update_count:05d}.mp4")
            ev = self.evaluate(eval_envs, eval_episodes,
                               max_episode_steps=eval_max_steps,
                               reward_fn=reward_fn, record_path=rec)
            metrics.log(event="eval", update=self.update_count,
                        mean_return=ev["mean_return"], std_return=ev["std_return"],
                        mean_length=ev["mean_length"], episodes=ev["episodes"],
                        null_action_rate=ev["action_stats"]["null_action_rate"],
                        mean_vpred=ev["mean_vpred"])
            return ev

        do_eval = bool(eval_envs) and eval_every > 0
        try:
            if do_eval and self.update_count == 0:
                run_eval()  # pre-training baseline the deltas read against
            while self.update_count < n_updates:
                traj, obs, firsts = self.collect(envs, obs, firsts, reward_fn=reward_fn)
                report = self.update(traj)
                frames += traj["frames"].shape[0] * traj["frames"].shape[1]
                metrics.log(
                    update=self.update_count - 1,
                    frames_per_sec=frames / max(time.time() - start, 1e-9),
                    **report,
                )
                if do_eval and self.update_count % eval_every == 0:
                    report["eval_mean_return"] = run_eval()["mean_return"]
                checkpoint_now = (
                    checkpoint_dir and checkpoint_every
                    and self.update_count % checkpoint_every == 0
                )
                if checkpoint_now or (stop_requested["flag"] and checkpoint_dir):
                    self.save_checkpoint(checkpoint_dir)
                if stop_requested["flag"]:
                    metrics.log(event="preempted", update=self.update_count)
                    break
        finally:
            for sig, handler in old_handlers.items():
                signal.signal(sig, handler)
        if out_weights:
            final_vars = host_tree(self.variables)  # all ranks: collective
            if jax.process_index() == 0:
                save_weights(out_weights, final_vars)
        return report
