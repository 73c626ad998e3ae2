"""Sherlock: the experimental "delta-PPO" agent family.

Port of agents/sherlock_agent/* + agents/networks/delta_ppo_nets.py: the
policy is a spatial field phi over the board (per piece, spatial softmax,
clipped to [1e-6, 1], delta_ppo_nets.py:27-30); an action's probability is
the phi-mass over the cells its placement would fill:

  delta_a   = the 4 cells piece rests in under action a
              (simulate_all_actions with finalize=False diffs fields before
              line resolution, sherlock_utils.py:9-20 — i.e. exactly the
              resting piece cells)
  p(a|s)    ~ sum_cells delta_a * phi          (sherlock_agent.py:100-109)
  loss      = PPO clip on p + value MSE + entropy
              + impossibility loss: phi mass on cells no action covers
              (delta_ppo_nets.py:171-180)

The reference gathers deltas by running N backend copy/set/step round-trips
per move; here they come from the fixed-shape placement enumeration
(drl_tetris_tpu/engine/masks.py) in one fused call.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.engine import masks as M
from drl_tetris_tpu.env.observations import field_grid
from drl_tetris_tpu.algos.gae import sventon_gae
from drl_tetris_tpu.models.nets import (
    ModelConfig, ResidualBlock, SventonNet, apply_visual_pad,
    conv_shape_vector, peephole_join)


class SherlockNet(nn.Module):
    """delta_ppo_nets' network: resblock trunk, phi head = board-aligned
    spatial softmax per piece, per-piece tanh values."""
    cfg: ModelConfig
    full_network: bool = True

    @nn.compact
    def __call__(self, vec, vis, deterministic: bool = True):
        c = self.cfg
        raw_V, _ = SventonNet(c, self.full_network)(vec, vis, deterministic)
        # phi head: own tower on the padded visual + tiled vector planes
        v0 = apply_visual_pad(vis[0])
        vecp = conv_shape_vector(vec[0], v0.shape[1], v0.shape[2])
        x = peephole_join(vecp, v0, mode="concat")
        x = ResidualBlock(n_layers=c.tower_layers, n_filters=c.tower_filters,
                          filter_size=(c.tower_filter_size,) * 2)(x, deterministic)
        x = nn.Conv(c.n_pieces, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.normal(0.01))(x)
        x = x[:, 1:-1, 1:-1, :]          # crop the visual pad -> (B, H, W, P)
        m = jnp.max(x, axis=(1, 2), keepdims=True)
        e = jnp.exp(x - m)
        phi = e / jnp.sum(e, axis=(1, 2), keepdims=True)
        phi = jnp.clip(phi, 1e-6, 1.0)   # delta_ppo_nets.py:30
        v = raw_V.reshape(raw_V.shape[0], -1)
        return phi, v


def placement_deltas(cfg: EngineConfig, occ, piece, rot):
    """(mask (4, W), deltas (4, W, H, W) float32) — delta_a = resting piece
    cells of each legal top-drop placement."""
    from drl_tetris_tpu.engine import kernels as K
    mask, rest = M.top_drop(cfg, occ, piece, rot)
    from drl_tetris_tpu.engine.core import N_SYM_ROT
    n_sym = jnp.asarray(N_SYM_ROT)[piece]
    rots = jnp.arange(4, dtype=jnp.int32)[:, None]
    eff_rot = jnp.where(n_sym == 1, rot, jnp.broadcast_to(rots, (4, cfg.width)))
    xs = jnp.arange(cfg.width, dtype=jnp.int32)[None, :] - 1
    xs = jnp.broadcast_to(xs, (4, cfg.width))

    def one(r, x, d, m):
        rows = K.lookup_rows(piece, r)
        col, _ = K._piece_column(cfg, rows, jnp.maximum(d, 0))
        sh = jnp.where(x >= 0, col << x.astype(jnp.uint32),
                       col >> (-x).astype(jnp.uint32))
        grid = field_grid(cfg, sh)          # (H, W)
        return jnp.where(m, grid, 0.0)

    deltas = jax.vmap(jax.vmap(one))(eff_rot, xs, rest, mask)
    return mask, deltas


def pose_deltas(cfg: EngineConfig, occ, piece, rot):
    """Full-action-space deltas: (rest (4, W, H), deltas (4, W, H, H, W))
    over the complete legal set (top-drop ∪ finesse, masks.legal_rests) —
    the candidate set the reference's world-model query returns
    (tetris_environment.py:77-100)."""
    from drl_tetris_tpu.engine import kernels as K
    from drl_tetris_tpu.engine.core import N_SYM_ROT
    H, W = cfg.height, cfg.width
    rest = M.legal_rests(cfg, occ, piece, rot)
    n_sym = jnp.asarray(N_SYM_ROT)[piece]
    rots = jnp.arange(4, dtype=jnp.int32)[:, None]
    eff_rot = jnp.where(n_sym == 1, rot, jnp.broadcast_to(rots, (4, W)))
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :] - 1, (4, W))

    def one(r, x, m_y):
        rows = K.lookup_rows(piece, r)

        def at_y(y, m):
            col, _ = K._piece_column(cfg, rows, y)
            sh = jnp.where(x >= 0, col << x.astype(jnp.uint32),
                           col >> (-x).astype(jnp.uint32))
            return jnp.where(m, field_grid(cfg, sh), 0.0)

        return jax.vmap(at_y)(jnp.arange(H, dtype=jnp.int32), m_y)

    deltas = jax.vmap(jax.vmap(one))(eff_rot, xs, rest)
    return rest, deltas


def action_probabilities(phi_p, deltas, mask):
    """phi_p: (H, W) for the acting piece; deltas: (..., H, W) per legal
    candidate ((4, W) top-drop grid or (4, W, H) pose grid); returns p with
    mask's shape, normalized over legal actions."""
    scores = jnp.sum(deltas * phi_p[(None,) * mask.ndim], axis=(-2, -1))
    scores = jnp.where(mask, scores, 0.0)
    total = jnp.sum(scores)
    total = jnp.where(total == 0, 1.0, total)   # sherlock_agent.py p_sum==0 guard
    return scores / total


def sherlock_candidate_probs(cfg: EngineConfig, net, params, obs, env_state,
                             full: bool):
    """Shared candidate scoring for training and evaluation: the phi·delta
    probability of every legal placement of the acting player's piece
    (delta_ppo semantics, agents/sherlock_agent/sherlock_agent.py
    get_action).  Returns (p, mask, deltas, piece, v_piece, v_mean) with
    p/mask shaped (N, 4, W[, H])."""
    from drl_tetris_tpu.algos.rollout import policy_inputs
    vec, vis = policy_inputs(obs)
    phi, v = net.apply(params, vec, vis)          # (N,H,W,P), (N,P)
    piece = obs.piece[:, 0]
    player = env_state.current_player
    ps = env_state.engine.players
    take = lambda a: jnp.take_along_axis(
        a, player[:, None, None], axis=1)[:, 0]
    occ_p = take(ps.occ)
    rot_p = jnp.take_along_axis(ps.rot, player[:, None], axis=1)[:, 0]
    fn = pose_deltas if full else placement_deltas
    mask, deltas = jax.vmap(
        lambda o, pc, rt: fn(cfg, o, pc, rt))(occ_p, piece, rot_p)
    N = phi.shape[0]
    idx = jnp.arange(N)
    phi_p = phi[idx, :, :, piece]
    p = jax.vmap(action_probabilities)(phi_p, deltas, mask)
    v_piece = v[idx, piece] if v.shape[-1] > 1 else v[:, 0]
    v_mean = jnp.mean(v, axis=-1)
    return p, mask, deltas, piece, v_piece, v_mean


def make_sherlock_policy(env, net: "SherlockNet", distribution: str = "argmax",
                         epsilon: float = 0.05,
                         action_space: str = "top_drop"):
    """Evaluation policy over the sherlock candidate distribution, so
    delta-PPO checkpoints can enter tournaments/leagues like every other
    flavour (scripts/eval.py evaluates all agent types uniformly).

    Returns ``policy(params, env_state, key)`` with make_sixten_policy's
    output contract: top-drop -> (obs, piece, r_rel, col, prob, v_piece,
    v_mean) for env.step_place; "full" -> (obs, piece, rot_enum, col, y,
    prob, v_piece, v_mean) for env.step_pose.  Distributions: "argmax"
    (most probable placement), "pi"/"boltzmann" (sample phi·delta — the
    training distribution), "epsilon" (epsilon-uniform over legal, else
    argmax; epsilon=1.0 is the league's random anchor)."""
    import numpy as np
    from drl_tetris_tpu.engine.pieces import SPAWN_ROT
    cfg = env.cfg.engine
    H, W = cfg.height, cfg.width
    full = action_space == "full"
    spawn_rot_t = tuple(int(x) for x in np.asarray(SPAWN_ROT))

    def policy(params, env_state, key, hp=None):
        obs = env.observe(env_state)
        p, mask, _deltas, piece, v_piece, v_mean = sherlock_candidate_probs(
            cfg, net, params, obs, env_state, full)
        N = p.shape[0]
        idx = jnp.arange(N)
        pf = p.reshape(N, -1)
        mf = mask.reshape(N, -1)
        greedy = jnp.argmax(jnp.where(mf, pf, -1.0), axis=-1)
        if distribution in ("pi", "boltzmann"):
            logits = jnp.where(mf, jnp.log(jnp.maximum(pf, 1e-20)), -jnp.inf)
            a_idx = jax.random.categorical(key, logits, axis=-1)
        elif distribution == "epsilon":
            ke, ku = jax.random.split(key)
            uni = jax.random.categorical(
                ku, jnp.where(mf, 0.0, -jnp.inf), axis=-1)
            explore = jax.random.bernoulli(ke, epsilon, (N,))
            a_idx = jnp.where(explore, uni, greedy)
        else:
            a_idx = greedy
        prob = pf[idx, a_idx]
        if full:
            r_enum = a_idx // (W * H)
            col = (a_idx // H) % W
            y = a_idx % H
            return obs, piece, r_enum, col, y, prob, v_piece, v_mean
        r_abs = a_idx // W
        x = (a_idx % W) - 1   # mask column c -> posX c-1 (step_place units)
        spawn = jnp.zeros_like(piece)
        for k in range(7):
            spawn = jnp.where(piece == k, spawn_rot_t[k], spawn)
        r_rel = jnp.mod(r_abs - spawn, 4)
        return obs, piece, r_rel, x, prob, v_piece, v_mean

    return policy


class SherlockSegment(NamedTuple):
    occ: jnp.ndarray        # (T, N, 2, H) uint32
    vec: jnp.ndarray        # (T, N, 2, 12)
    piece: jnp.ndarray      # (T, N)
    delta: jnp.ndarray      # (T, N, H, W) chosen action cells
    delta_sum: jnp.ndarray  # (T, N, H, W) coverage
    prob: jnp.ndarray       # (T, N)
    v_piece: jnp.ndarray    # (T, N)
    v_mean: jnp.ndarray     # (T, N)
    reward: jnp.ndarray     # (T, N)
    done: jnp.ndarray       # (T, N)


def make_sherlock_rollout(env, net: SherlockNet, horizon: int,
                          action_space: str = "top_drop"):
    """Self-play rollout with delta-weighted action sampling.  Actions are
    executed as the reference's key macro (rotations from spawn + signed
    single steps + hard drop, TestField::findNextMove/makeStartSequence).
    With action_space="full" the candidate set is the whole top-drop ∪
    finesse pose grid (pose_deltas), executed via env.step_pose."""
    from drl_tetris_tpu.engine import step as ES
    from drl_tetris_tpu.engine.pieces import SPAWN_ROT
    from drl_tetris_tpu.algos.rollout import policy_inputs, _perspective_occ
    import numpy as np
    cfg = env.cfg.engine
    H, W = cfg.height, cfg.width
    full = action_space == "full"
    spawn_rot_t = tuple(int(x) for x in np.asarray(SPAWN_ROT))

    def acting(params, env_state, key):
        obs = env.observe(env_state)
        p, mask, deltas, piece, v_piece, v_mean = sherlock_candidate_probs(
            cfg, net, params, obs, env_state, full)
        N = p.shape[0]
        idx = jnp.arange(N)
        logits = jnp.log(jnp.maximum(p.reshape(N, -1), 1e-20))
        a_idx = jax.random.categorical(key, logits, axis=-1)
        prob = p.reshape(N, -1)[idx, a_idx]
        delta = deltas.reshape(N, -1, H, W)[idx, a_idx]
        sum_axes = (1, 2, 3) if full else (1, 2)
        delta_sum = jnp.sum(deltas, axis=sum_axes)    # (N, H, W)
        if full:
            r_enum = a_idx // (W * H)
            col = (a_idx // H) % W
            y = a_idx % H
            return (obs, piece, r_enum, col, y, prob, delta, delta_sum,
                    v_piece, v_mean)
        r_abs = a_idx // W
        # mask column c corresponds to posX c-1 (step_place's x_target is
        # in posX units — the same -1 the sixten policy applies)
        x = (a_idx % W) - 1
        # relative rotations from the spawn rotation of the piece
        spawn = jnp.zeros_like(piece)
        for k in range(7):
            spawn = jnp.where(piece == k, spawn_rot_t[k], spawn)
        r_rel = jnp.mod(r_abs - spawn, 4)
        return (obs, piece, r_rel, x, prob, delta, delta_sum,
                v_piece, v_mean)

    def step_fn(carry, key):
        params, env_state = carry
        player = env_state.current_player
        if full:
            (obs, piece, r, col, y, prob, delta, delta_sum,
             v_piece, v_mean) = acting(params, env_state, key)
            occ = _perspective_occ(env_state, player)
            new_state, reward, done = env.step_pose(env_state, r, col, y)
        else:
            (obs, piece, r, col, prob, delta, delta_sum,
             v_piece, v_mean) = acting(params, env_state, key)
            occ = _perspective_occ(env_state, player)
            new_state, reward, done = env.step_place(env_state, r, col)
        seg = SherlockSegment(
            occ=occ, vec=obs.vec, piece=piece, delta=delta,
            delta_sum=delta_sum, prob=prob, v_piece=v_piece, v_mean=v_mean,
            reward=reward, done=done)
        return (params, new_state), seg

    @jax.jit
    def rollout(params, env_state, key):
        keys = jax.random.split(key, horizon)
        (params, env_state), seg = jax.lax.scan(
            step_fn, (params, env_state), keys)
        out = acting(params, env_state, jax.random.fold_in(key, horizon))
        v_last = out[-2]
        return env_state, seg, v_last

    return rollout


@dataclasses.dataclass(frozen=True)
class SherlockConfig:
    clipping_parameter: float = 0.15
    value_loss: float = 0.01
    policy_loss: float = 0.9
    entropy_loss: float = 0.0
    impossibility_loss: float = 0.1   # c4 (delta_ppo_nets)
    nn_regularizer: float = 1e-5
    lr: float = 1e-5
    gamma: float = 0.98
    gae_lambda: float = 0.7
    n_train_epochs: int = 2
    minibatch_size: int = 64


class SherlockBatch(NamedTuple):
    occ: jnp.ndarray        # (B, 2, H) uint32
    vec: jnp.ndarray        # (B, 2, 12)
    piece: jnp.ndarray      # (B,)
    delta: jnp.ndarray      # (B, H, W)  chosen action's cells
    delta_sum: jnp.ndarray  # (B, H, W)  union coverage over legal actions
    old_prob: jnp.ndarray   # (B,)
    advantage: jnp.ndarray  # (B,)
    target_v: jnp.ndarray   # (B,)


def sherlock_segment_to_batch(cfg: "SherlockConfig", seg: SherlockSegment,
                              v_last, single_policy: bool = True):
    """GAE (sventon semantics, trajectory.py:111-141) then flatten."""
    gamma = -cfg.gamma if single_policy else cfg.gamma
    adv, tgt, stats = sventon_gae(
        seg.reward, seg.done, seg.v_piece, seg.v_mean, v_last,
        gamma=gamma, gae_lambda=cfg.gae_lambda)
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    return SherlockBatch(
        occ=flat(seg.occ), vec=flat(seg.vec), piece=flat(seg.piece),
        delta=flat(seg.delta), delta_sum=flat(seg.delta_sum),
        old_prob=flat(seg.prob), advantage=flat(adv), target_v=flat(tgt),
    ), stats


@struct.dataclass
class SherlockState:
    params: Any
    opt_state: Any
    update_count: jnp.ndarray


def make_sherlock_update(engine_cfg: EngineConfig, net: SherlockNet,
                         cfg: SherlockConfig):
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)

    def init_fn(params):
        return SherlockState(params=params, opt_state=tx.init(params),
                             update_count=jnp.int32(0))

    def loss_fn(params, mb: SherlockBatch):
        e = 1e-6
        grids = field_grid(engine_cfg, mb.occ)
        vis = [grids[:, 0, :, :, None], grids[:, 1, :, :, None]]
        vec = [mb.vec[:, 0, :], mb.vec[:, 1, :]]
        phi_all, v = net.apply(params, vec, vis)      # (B,H,W,P), (B,P)
        B = phi_all.shape[0]
        idx = jnp.arange(B)
        phi = phi_all[idx, :, :, mb.piece]            # (B, H, W)
        values = v[idx, mb.piece] if v.shape[-1] > 1 else v[:, 0]
        # probability = (sum delta*phi + e) / (sum delta_sum*phi + e)
        num = jnp.sum(phi * mb.delta, axis=(1, 2)) + e
        den = jnp.sum(phi * mb.delta_sum, axis=(1, 2)) + e
        prob = num / den
        ratio = jnp.maximum(prob, e) / jnp.maximum(mb.old_prob, e)
        clipped = jnp.clip(ratio, 1 - cfg.clipping_parameter,
                           1 + cfg.clipping_parameter)
        policy_obj = jnp.minimum(ratio * mb.advantage, clipped * mb.advantage)
        # impossibility: phi mass on cells NO action covers (delta_ppo:171)
        imp = phi * (1.0 - jnp.minimum(1.0, mb.delta_sum))
        # entropy of the coverage-weighted field (delta_ppo:177)
        dn = phi * mb.delta_sum
        dn = dn / (jnp.sum(mb.delta_sum, axis=(1, 2), keepdims=True) + e) + e
        ent = -jnp.sum(dn * jnp.log(jnp.maximum(dn, e)), axis=(1, 2))
        value_loss = cfg.value_loss * jnp.mean((values - mb.target_v) ** 2)
        policy_loss = -cfg.policy_loss * jnp.mean(policy_obj)
        entropy_loss = -cfg.entropy_loss * jnp.mean(ent)
        imp_loss = cfg.impossibility_loss * jnp.mean(imp)
        reg = cfg.nn_regularizer * 0.5 * sum(
            jnp.sum(jnp.square(w)) for w in jax.tree.leaves(params))
        loss = value_loss + policy_loss + entropy_loss + imp_loss + reg
        return loss, {
            "losses/total_loss": loss, "losses/value_loss": value_loss,
            "losses/policy_loss": -policy_loss,
            "losses/impossibility_loss": imp_loss,
            "entropy/entropy": jnp.mean(ent),
        }

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def update_fn(state: SherlockState, batch: SherlockBatch, key):
        B = batch.piece.shape[0]
        n_mb = max(B // cfg.minibatch_size, 1)
        mbs = min(cfg.minibatch_size, B)

        def epoch(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, B)
            mb_idxs = perm[: n_mb * mbs].reshape(n_mb, mbs)

            def mb_step(c, mi):
                params, opt_state = c
                mb = jax.tree.map(lambda a: a[mi], batch)
                (loss, stats), grads = grad_fn(params, mb)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), stats

            carry, stats = jax.lax.scan(mb_step, (params, opt_state), mb_idxs)
            return carry, jax.tree.map(lambda a: a[-1], stats)

        ekeys = jax.random.split(key, cfg.n_train_epochs)
        (params, opt_state), stats = jax.lax.scan(
            epoch, (state.params, state.opt_state), ekeys)
        stats = jax.tree.map(lambda a: a[-1], stats)
        return SherlockState(params=params, opt_state=opt_state,
                             update_count=state.update_count + 1), stats

    return init_fn, update_fn
