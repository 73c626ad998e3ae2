"""SVENton-PPO: the jitted learner update.

Ports the reference's TF1 training graph (agents/networks/ppo_nets.py:
141-257) and trainer loop (agents/sventon_agent/sventon_agent_ppo_trainer
.py:10-77) to a single compiled update: epochs x reshuffled minibatches as
nested ``lax.scan``s over one resident batch, instead of feed_dict
session.run per minibatch.

Loss terms (ppo_nets.create_training_ops):
  clipped surrogate on pi(r,t|s,piece), per-piece value MSE, entropy bonus
  with optional entropy-floor and rescaled-entropy shaping, L2 regularizer,
  and the 'compressor' running-abs-mean normalizers applied to advantages
  and to the value loss (agents/networks/compressor.py).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.env.observations import field_grid
from drl_tetris_tpu.algos.gae import sventon_gae
from drl_tetris_tpu.algos.rollout import Segment


@dataclasses.dataclass(frozen=True)
class CompressorConfig:
    """agents/networks/compressor.py defaults / sventon_ppo.py:11-12."""
    lr: float = 0.005
    clip_val: float = 8.0
    safety: float = 3.0
    cautious: bool = False


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """experiments/sventon_ppo.py:16-36 + presets.py."""
    clipping_parameter: float = 0.15
    value_loss: float = 0.01          # c1
    policy_loss: float = 0.9          # c2
    entropy_loss: float = 0.0         # c3
    entropy_floor_loss: float = 0.0
    rescaled_entropy: float = 0.0
    # Standalone floor coefficient — a DELIBERATE extension beyond the
    # reference: in ppo_nets.py:178-191 the floor term only reaches the
    # loss scaled by c3 (entropy_loss), so "floor without bonus" is
    # inexpressible there — yet the bonus is exactly what pinned r3's
    # entropy at ~2.8 for 9M steps, and with c3=0 the clean recipe
    # cliff-collapses to H~0 (NOTES_ROUND4).  This adds
    # entropy_floor_standalone * mean(relu(floor - H)) directly to the
    # loss (floor = eps-noise entropy at ppo_epsilon), active ONLY when
    # entropy dips below the floor.
    entropy_floor_standalone: float = 0.0
    ppo_epsilon: float = 0.0
    nn_regularizer: float = 1e-5
    lr: float = 1e-7                  # value_lr
    gamma: float = 0.98
    gae_lambda: float = 0.7
    gve_lambda: float = 0.95
    single_policy: bool = True        # gamma sign flip (sventon_agent_base.py:76)
    n_train_epochs: int = 4
    minibatch_size: int = 64
    compress_advantages: Optional[CompressorConfig] = CompressorConfig()
    compress_value_loss: Optional[CompressorConfig] = CompressorConfig()
    augment_data: bool = False        # mirror augmentation (presets.py:181)
    # workers_computes_advantages=False (presets.py:23): workers run the
    # value-stream-free net (full_network=False, ppo_nets.py:28) and ship
    # raw k-step windows; the TRAINER computes targets in-graph through a
    # separate reference network via the value_estimator
    # (ppo_nets.create_targets, ppo_nets.py:227-257) with
    # advantages = values - targets (:256, NOT stop-gradiented — faithful).
    workers_computes_advantages: bool = True
    n_step_value_estimates: int = 1   # sventon_ppo.py:13
    time_to_reference_update: int = 1 # presets.py:147
    truncate_aggregation: bool = True # presets.py:25-27
    sparse_value_estimate_filter: Tuple[int, ...] = ()

    @property
    def effective_gamma(self) -> float:
        return -self.gamma if self.single_policy else self.gamma

    @property
    def estimator(self):
        """EstimatorConfig for the trainer-computes-targets path: the
        reference builds the value_estimator with gamma and _lambda ==
        settings['gae_lambda'] (ppo_nets.py:241-252, network.py:21-23)."""
        from drl_tetris_tpu.algos.value_estimator import EstimatorConfig
        return EstimatorConfig(
            k_step=self.n_step_value_estimates, gamma=self.gamma,
            lam=self.gae_lambda, single_policy=self.single_policy,
            truncate_aggregation=self.truncate_aggregation,
            step_filter=self.sparse_value_estimate_filter)


class CompressorState(NamedTuple):
    x_mean: jnp.ndarray
    x_max: jnp.ndarray


def compressor_init():
    return CompressorState(jnp.float32(1.0), jnp.float32(1.0))


def compressor_apply(cfg: CompressorConfig, st: CompressorState, x,
                     axis_name=None):
    """One call of compressor.__call__ + its update op.  Under a mesh the
    batch statistics are the global ones (pmean/pmax over the data axis) so
    the compressor state stays replicated."""
    eps = 1e-6
    # Batch stats only feed the EMA update (assign ops in the TF original —
    # never differentiated), so cut them from the grad path; pmax has no AD
    # rule anyway.
    batch_mean = jax.lax.stop_gradient(jnp.mean(jnp.abs(x)))
    batch_max = jax.lax.stop_gradient(jnp.max(jnp.abs(x)))
    if axis_name is not None:
        batch_mean = jax.lax.pmean(batch_mean, axis_name)
        batch_max = jax.lax.stop_gradient(
            jax.lax.pmax(batch_max, axis_name))
    floor = jnp.maximum(batch_mean, eps) if cfg.cautious else eps
    norm = jnp.maximum(st.x_mean, floor)
    clip = jnp.minimum(cfg.safety * st.x_max / st.x_mean, cfg.clip_val)
    y = jnp.clip(x / norm, -clip, clip)
    new = CompressorState(
        (1 - cfg.lr) * st.x_mean + cfg.lr * batch_mean,
        (1 - cfg.lr) * st.x_max + cfg.lr * batch_max,
    )
    sat = jnp.mean((x / norm != y).astype(jnp.float32))
    return y, new, sat


class Batch(NamedTuple):
    """Flattened training samples."""
    occ: jnp.ndarray       # (B, 2, H) uint32
    vec: jnp.ndarray       # (B, 2, 12) f32
    piece: jnp.ndarray     # (B,) i32
    rot: jnp.ndarray       # (B,) i32
    trans: jnp.ndarray     # (B,) i32
    old_prob: jnp.ndarray  # (B,) f32
    advantage: jnp.ndarray # (B,) f32
    target_v: jnp.ndarray  # (B,) f32


@struct.dataclass
class PPOState:
    params: Any
    opt_state: Any
    adv_comp: CompressorState
    vloss_comp: CompressorState
    update_count: jnp.ndarray  # () i32
    # trainer-computes-targets mode only (None = empty pytree nodes in
    # worker-computes mode, keeping checkpoint structure unchanged):
    # the reference network the value_estimator bootstraps through
    # (ppo_nets.py:233-240) and the countdown to its periodic sync
    # (sventon_agent_ppo_trainer.py:70-74)
    ref_params: Any = None
    ref_countdown: Any = None


def augment_batch(engine_cfg: EngineConfig, batch: Batch) -> Batch:
    """Mirror augmentation (trajectory.augment_data, trajectory.py:88-109):
    concatenate a horizontally-reflected copy of every sample — fields
    flipped, translation t -> W-1-t, piece ids through the L<->J / S<->Z
    swap.  Faithful quirks: rotation is NOT remapped and the x/y scalars
    are NOT mirrored (state_processors.py:44-53)."""
    from drl_tetris_tpu.env.observations import PIECE_SWAP_NP
    W = engine_cfg.width
    occ = batch.occ
    rev = jnp.zeros_like(occ)
    for x in range(W):
        bit = (occ >> jnp.uint32(x)) & jnp.uint32(1)
        rev = rev | (bit << jnp.uint32(W - 1 - x))
    swap = jnp.asarray(PIECE_SWAP_NP)
    vec_m = jnp.concatenate(
        [batch.vec[..., :5], batch.vec[..., 5:][..., PIECE_SWAP_NP]], axis=-1)
    mirrored = Batch(
        occ=rev, vec=vec_m, piece=swap[batch.piece], rot=batch.rot,
        trans=W - 1 - batch.trans, old_prob=batch.old_prob,
        advantage=batch.advantage, target_v=batch.target_v)
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b]), batch, mirrored)


def segment_to_batch(cfg: PPOConfig, seg: Segment, v_piece_last) -> Tuple[Batch, dict]:
    """Worker-side processing (ready_for_new_round + process_trajectory):
    GAE over the segment, then flatten (T, N) -> (B,)."""
    adv, tgt, stats = sventon_gae(
        seg.reward, seg.done, seg.v_piece, seg.v_mean, v_piece_last,
        gamma=cfg.effective_gamma, gae_lambda=cfg.gae_lambda,
        gve_lambda=cfg.gve_lambda)
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    return Batch(
        occ=flat(seg.occ), vec=flat(seg.vec), piece=flat(seg.piece),
        rot=flat(seg.rot), trans=flat(seg.trans), old_prob=flat(seg.prob),
        advantage=flat(adv), target_v=flat(tgt),
    ), stats


def pool_segment_to_batch(cfg: PPOConfig, seg: Segment, v_piece_last,
                          learner_parity: int = 0) -> Tuple[Batch, dict]:
    """segment_to_batch for pool-opponent rollouts: GAE runs over the FULL
    alternating segment (the learner's value function spans both
    perspectives, sign-flipped gamma as always), then only the learner's
    decision ticks (every second, starting at learner_parity) are kept for
    training — the opponent's actions are not the learner's to update."""
    adv, tgt, stats = sventon_gae(
        seg.reward, seg.done, seg.v_piece, seg.v_mean, v_piece_last,
        gamma=cfg.effective_gamma, gae_lambda=cfg.gae_lambda,
        gve_lambda=cfg.gve_lambda)
    sl = lambda a: a[learner_parity::2]
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    return Batch(
        occ=flat(sl(seg.occ)), vec=flat(sl(seg.vec)),
        piece=flat(sl(seg.piece)), rot=flat(sl(seg.rot)),
        trans=flat(sl(seg.trans)), old_prob=flat(sl(seg.prob)),
        advantage=flat(sl(adv)), target_v=flat(sl(tgt)),
    ), stats


def set_learning_rate(state: PPOState, lr) -> PPOState:
    """Swap the optimizer's learning rate without recompiling: the
    optimizer is optax.inject_hyperparams(adam), so the lr lives as a leaf
    in opt_state.hyperparams.  This is the Parameter(t) schedule path
    (tools/parameter.py:8-66; scheduled lr presets.py:49) — the trainer
    calls this each iteration with param_eval(value_lr, t)."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hp))


class WindowBatch(NamedTuple):
    """Training samples for the trainer-computes-targets mode: each sample
    carries its k-step window of states/rewards/dones (the reference ships
    these via the k_step experience replay, ppo_nets.py:35-39)."""
    occ_w: jnp.ndarray     # (B, K+1, 2, H) uint32; [:, 0] is the trained state
    vec_w: jnp.ndarray     # (B, K+1, 2, 12) f32
    piece: jnp.ndarray     # (B,) i32
    rot: jnp.ndarray       # (B,) i32
    trans: jnp.ndarray     # (B,) i32
    old_prob: jnp.ndarray  # (B,) f32
    reward_w: jnp.ndarray  # (B, K+1) f32
    done_w: jnp.ndarray    # (B, K+1) i32


def segment_to_windows(cfg: PPOConfig, seg: Segment) -> WindowBatch:
    """Worker-side packing when the trainer computes targets: raw k-step
    windows, no GAE.  Windows slide within the segment (t in [0, T-K));
    cross-trajectory leakage is masked by the estimator's dones-cumsum
    (value_estimator.py:52-53), only the segment's last K ticks are not
    trained on."""
    K = cfg.n_step_value_estimates
    T = seg.piece.shape[0]
    n_t = T - K
    assert n_t > 0, (T, K)

    def win(x):                       # (T, N, ...) -> (n_t, N, K+1, ...)
        return jnp.stack([x[j:j + n_t] for j in range(K + 1)], axis=2)

    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    fw = lambda a: flat(win(a))
    return WindowBatch(
        occ_w=fw(seg.occ), vec_w=fw(seg.vec),
        piece=flat(seg.piece[:n_t]), rot=flat(seg.rot[:n_t]),
        trans=flat(seg.trans[:n_t]), old_prob=flat(seg.prob[:n_t]),
        reward_w=fw(seg.reward.astype(jnp.float32)),
        done_w=fw(seg.done.astype(jnp.int32)))


def make_ppo_update(engine_cfg: EngineConfig, net, cfg: PPOConfig,
                    optimizer=None, axis_name=None):
    """Returns (init_fn(params) -> PPOState,
    update_fn(state, batch, key) -> (state', stats)).

    axis_name: when set, the update runs data-parallel inside shard_map /
    pmap over that mesh axis — gradients are pmean'd, compressor batch stats
    are global, params/opt state stay replicated.  This is the learner half
    of the actor-learner program (drl_tetris_tpu/parallel)."""
    tx = optimizer or optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.lr)
    trainer_targets = not cfg.workers_computes_advantages
    if trainer_targets:
        from drl_tetris_tpu.algos.value_estimator import kstep_targets
        assert not cfg.augment_data, \
            "mirror augmentation is a worker-computes-advantages feature"

    def init_fn(params) -> PPOState:
        ref = jax.tree.map(jnp.asarray, params) if trainer_targets else None
        # counter starts at 0: the first training pass syncs the reference
        # net (sventon_agent_trainer_base.py:42, ppo trainer :70-74)
        cd = jnp.int32(0) if trainer_targets else None
        return PPOState(params=params, opt_state=tx.init(params),
                        adv_comp=compressor_init(),
                        vloss_comp=compressor_init(),
                        update_count=jnp.int32(0),
                        ref_params=ref, ref_countdown=cd)

    def loss_fn(params, mb, adv_comp, vloss_comp, ref_params=None):
        e = 1e-6
        occ_t, vec_t = (mb.occ_w[:, 0], mb.vec_w[:, 0]) if trainer_targets \
            else (mb.occ, mb.vec)
        grids = field_grid(engine_cfg, occ_t)             # (B, 2, H, W)
        vis = [grids[:, 0, :, :, None], grids[:, 1, :, :, None]]
        vec = [vec_t[:, 0, :], vec_t[:, 1, :]]
        pi, v = net.apply(params, vec, vis)               # (B,4,W,7), (B,7)
        B = pi.shape[0]
        idx = jnp.arange(B)
        prob = pi[idx, mb.rot, mb.trans, mb.piece]
        values = v[idx, mb.piece] if v.shape[-1] > 1 else v[:, 0]

        if trainer_targets:
            # create_targets (ppo_nets.py:233-257): k-step lambda targets
            # through the reference net; advantages = values - targets —
            # faithful quirk: values is NOT stop-gradiented, so the policy
            # surrogate's gradient flows into the value stream (:256).
            windows = {"occ": mb.occ_w, "vec": mb.vec_w,
                       "reward": mb.reward_w, "done": mb.done_w}
            target_v = kstep_targets(engine_cfg, net, cfg.estimator,
                                     ref_params, windows)
            advantage_in = values - target_v
        else:
            target_v, advantage_in = mb.target_v, mb.advantage

        ratio = jnp.maximum(prob, e) / jnp.maximum(mb.old_prob, e)
        clipped = jnp.clip(ratio, 1 - cfg.clipping_parameter,
                           1 + cfg.clipping_parameter)
        clip_sat = jnp.mean((ratio != clipped).astype(jnp.float32))

        adv = advantage_in
        adv_sat = jnp.float32(0)
        new_adv_comp = adv_comp
        if cfg.compress_advantages is not None:
            adv, new_adv_comp, adv_sat = compressor_apply(
                cfg.compress_advantages, adv_comp, adv, axis_name)
        policy_obj = jnp.minimum(ratio * adv, clipped * adv)

        # entropy of the acting piece's action plane (ppo_nets.py:174-185)
        pie = pi + e
        ent_map = -jnp.sum(pie * jnp.log(jnp.maximum(e, pie)),
                           axis=(1, 2))                   # (B, 7)
        action_entropy = ent_map[idx, mb.piece]
        entropy_bonus = action_entropy
        n_actions = pi.shape[1] * pi.shape[2]
        max_entropy = jnp.log(jnp.float32(n_actions))
        if cfg.entropy_floor_loss:
            eps_f = jnp.float32(max(cfg.ppo_epsilon, 1e-8))
            floor = (-eps_f * jnp.log(eps_f / (n_actions - 1))
                     - (1 - eps_f) * jnp.log(1 - eps_f))
            entropy_bonus = entropy_bonus + cfg.entropy_floor_loss * (
                -jax.nn.relu(floor - action_entropy))
        if cfg.rescaled_entropy:
            entropy_bonus = entropy_bonus + cfg.rescaled_entropy * (
                max_entropy - entropy_bonus)

        value_mse = jnp.mean((values - target_v) ** 2)
        if axis_name is not None:
            value_mse = jax.lax.pmean(value_mse, axis_name)
        value_loss = cfg.value_loss * value_mse
        new_vloss_comp = vloss_comp
        vloss_sat = jnp.float32(0)
        if cfg.compress_value_loss is not None:
            value_loss, new_vloss_comp, vloss_sat = compressor_apply(
                cfg.compress_value_loss, vloss_comp, value_loss, axis_name)
        policy_loss = -cfg.policy_loss * jnp.mean(policy_obj)
        entropy_loss = -cfg.entropy_loss * jnp.mean(entropy_bonus)
        # standalone collapse guard (see PPOConfig.entropy_floor_standalone):
        # penalize only the part of the action entropy below the eps-noise
        # floor, independent of the c3 bonus coefficient
        floor_pen = jnp.float32(0)
        if cfg.entropy_floor_standalone:
            eps_f = jnp.float32(max(cfg.ppo_epsilon, 1e-8))
            floor = (-eps_f * jnp.log(eps_f / (n_actions - 1))
                     - (1 - eps_f) * jnp.log(1 - eps_f))
            floor_pen = cfg.entropy_floor_standalone * jnp.mean(
                jax.nn.relu(floor - action_entropy))
        # tf.nn.l2_loss = sum(w^2)/2 over all variables (ppo_nets.py:191)
        reg = cfg.nn_regularizer * 0.5 * sum(
            jnp.sum(jnp.square(w)) for w in jax.tree.leaves(params))
        loss = value_loss + policy_loss + entropy_loss + floor_pen + reg
        stats = {
            "losses/entropy_floor_penalty": floor_pen,
            "losses/total_loss": loss,
            "losses/value_loss": value_loss,
            "losses/policy_loss": -policy_loss,
            "losses/entropy_loss": -entropy_loss,
            "losses/regularizer_loss": reg,
            "entropy/entropy": jnp.mean(action_entropy),
            "misc/values": jnp.mean(values),
            "misc/target_values": jnp.mean(target_v),
            "misc/clip_saturation": clip_sat,
            "compressors/advantage/saturation": adv_sat,
            "compressors/valueloss/saturation": vloss_sat,
        }
        return loss, (new_adv_comp, new_vloss_comp, stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def minibatch_step(carry, mb_idx, batch, ref_params):
        params, opt_state, adv_c, vl_c = carry
        mb = jax.tree.map(lambda a: a[mb_idx], batch)
        (loss, (adv_c, vl_c, stats)), grads = grad_fn(
            params, mb, adv_c, vl_c, ref_params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, adv_c, vl_c), stats

    @jax.jit
    def update_fn(state: PPOState, batch, key):
        if cfg.augment_data:
            batch = augment_batch(engine_cfg, batch)
        B = batch.piece.shape[0]
        n_mb = B // cfg.minibatch_size
        ref_params = state.ref_params

        def epoch_step(carry, ekey):
            perm = jax.random.permutation(ekey, B)
            mb_idxs = perm[: n_mb * cfg.minibatch_size].reshape(
                n_mb, cfg.minibatch_size)
            carry, stats = jax.lax.scan(
                lambda c, i: minibatch_step(c, i, batch, ref_params),
                carry, mb_idxs)
            return carry, jax.tree.map(lambda a: a[-1], stats)

        carry = (state.params, state.opt_state, state.adv_comp,
                 state.vloss_comp)
        ekeys = jax.random.split(key, cfg.n_train_epochs)
        carry, stats = jax.lax.scan(epoch_step, carry, ekeys)
        params, opt_state, adv_c, vl_c = carry
        stats = jax.tree.map(lambda a: a[-1], stats)  # last epoch's last mb
        ref_cd = state.ref_countdown
        if trainer_targets:
            # post-training periodic reference sync
            # (sventon_agent_ppo_trainer.py:70-74): counter 0 -> copy the
            # freshly-updated main net and reload the counter, else tick
            sync = ref_cd == 0
            ref_params = jax.tree.map(
                lambda r, p: jnp.where(sync, p, r), ref_params, params)
            ref_cd = jnp.where(sync, jnp.int32(cfg.time_to_reference_update),
                               ref_cd - 1)
        return PPOState(params=params, opt_state=opt_state, adv_comp=adv_c,
                        vloss_comp=vl_c,
                        update_count=state.update_count + 1,
                        ref_params=ref_params, ref_countdown=ref_cd), stats

    return init_fn, update_fn
