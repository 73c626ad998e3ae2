"""SIXten: k-step value learning + prioritized replay + world-model search.

The reference describes SIXten as "k-step value learning with prioritized
replay and a world-model one-ply search" (README.md:10-16).  Its network
survives in the tree as ``prio_vnet`` (agents/networks/prio_vnet.py:8-305 —
a state-VALUE network with main/reference scopes, k-step lambda targets and
in-graph priorities) but its agent (``vector_q_agent``) was deleted from the
snapshot (SURVEY.md 2.4), so the acting side is reconstructed from the
environment's world-model interface it used: enumerate every legal
placement via the mask generator, simulate each resulting board
(``simulate_all_actions``, tetris_environment.py:87-100), evaluate V on the
successors, and pick greedily/epsilon-greedily.

TPU shape: the N-round-trips-per-move backend simulation becomes ONE fused
``placement_boards`` call per game (engine/masks.py:81-102), and the
candidate evaluation is a single batched forward over (N * 4 * W) successor
boards.  Training is prio_vnet's: prioritized sample, k-step lambda targets
through the reference net (algos/value_estimator.py), IS-weighted MSE on
V(s | piece), new priorities |v - target| (prio_vnet.py:176-232).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.engine import masks as M
from drl_tetris_tpu.engine.pieces import SPAWN_ROT as _SPAWN_ROT_NP
from drl_tetris_tpu.env.env import TetrisVectorEnv
from drl_tetris_tpu.env.observations import field_grid
from drl_tetris_tpu.models.nets import (
    ModelConfig, ResidualBlock, apply_visual_pad, conv_shape_vector,
    peephole_join)
from drl_tetris_tpu.algos.replay import (
    ReplayConfig, ReplayState, replay_sample, replay_gather_windows,
    replay_update_prios)
from drl_tetris_tpu.algos.value_estimator import EstimatorConfig, make_target_fn


class VNet(nn.Module):
    """prio_vnet's network: state value only (prio_vnet.py:91-174) — the
    SventonNet trunk minus the keyboard/advantage head, ending in per-piece
    tanh values (B, P).  ``full_network`` kept for API symmetry (a
    value-only net has no worker-side reduced form)."""
    cfg: ModelConfig
    full_network: bool = True

    @nn.compact
    def __call__(self, vec, vis, deterministic: bool = True):
        c = self.cfg
        cdtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        tower = dict(n_layers=c.tower_layers, n_filters=c.tower_filters,
                     filter_size=(c.tower_filter_size,) * 2, dropout=c.dropout,
                     dtype=cdtype)
        vis = [apply_visual_pad(v) for v in vis]
        if cdtype is not None:
            vis = [v.astype(cdtype) for v in vis]
            vec = [v.astype(cdtype) for v in vec]
        hidden_vis = [ResidualBlock(**tower)(v, deterministic) for v in vis]
        h, w = hidden_vis[0].shape[1:3]
        vecp = [conv_shape_vector(v, h, w) for v in vec]
        joined = [ResidualBlock(**tower)(peephole_join(vp, hv, mode="concat"),
                                         deterministic)
                  for vp, hv in zip(vecp, hidden_vis)]
        vstream = jnp.concatenate(joined + vis, axis=-1)
        v = ResidualBlock(
            dtype=cdtype,
            n_layers=c.val_layers, n_filters=c.val_filters,
            filter_size=(c.val_filter_size,) * 2, pools=True,
            output_n_filters=(c.n_pieces + 1 if c.separate_piece_values else 1),
            output_activation=None, output_layer=True,
            normalization="layer", dropout=c.dropout,
        )(vstream, deterministic)
        v = jnp.mean(v.astype(jnp.float32), axis=(1, 2), keepdims=True)
        if v.shape[-1] > 1:
            base, offs = v[..., :1], v[..., 1:]
            mask = c.piece_mask.reshape(1, 1, 1, -1)
            mean = jnp.sum(jnp.mean(offs, axis=3, keepdims=True) * mask,
                           axis=3, keepdims=True) / jnp.sum(mask)
            v = jnp.tanh(base + (offs - mean))
        else:
            v = jnp.tanh(v)
        return v.reshape(v.shape[0], -1)       # (B, P) or (B, 1)


# ---------------------------------------------------------------------------
# Acting: one-ply world-model search over legal placements
# ---------------------------------------------------------------------------


def make_sixten_policy(env: TetrisVectorEnv, net: VNet,
                       distribution: str = "epsilon", epsilon: float = 0.05,
                       action_space: str = "top_drop"):
    """Returns policy(params, env_state, key) -> (obs, piece, r_abs, x,
    prob, v_sel, v_mean) — the world-model action selection.

    For each game: enumerate legal top-drop placements of the acting
    player's current piece, simulate the post-lock/post-clear board of each
    (engine/masks.placement_boards), evaluate V(s') on every successor in
    one batched forward (conditioning the per-piece value on the known next
    piece, which is the current piece of s'), and pick the best (or explore
    with epsilon).  The emitted action is (r_abs, x_target) for
    env.step_place.

    action_space="full" enumerates the ENTIRE legal set — top-drop plus
    finesse tuck/slide/kick rests (engine/masks.pose_boards; the candidate
    set the reference's world-model agents see via get_actions,
    tetris_environment.py:77-85) — and the policy then returns the 8-tuple
    (obs, piece, rot, col, y, prob, v_sel, v_mean) for env.step_pose."""
    cfg = env.cfg.engine
    W = cfg.width
    H = cfg.height
    full = action_space == "full"
    spawn_rot = jnp.asarray(_SPAWN_ROT_NP)

    def policy(params, env_state, key, hp=None):
        from drl_tetris_tpu.algos.rollout import HParams, policy_inputs
        if hp is None:
            hp = HParams(epsilon=epsilon)
        obs = env.observe(env_state)
        player = env_state.current_player
        ps = env_state.engine.players
        N = player.shape[0]
        take = lambda a: jnp.take_along_axis(
            a, player.reshape((N,) + (1,) * (a.ndim - 1)), axis=1)[:, 0]
        occ = take(ps.occ)                        # (N, H)
        garb = take(ps.garb)
        piece = take(ps.piece)                    # (N,)
        rot = take(ps.rot)
        nxt = take(ps.nextpiece)

        if full:
            mask, occ_after, _cleared = jax.vmap(
                lambda o, g, p, r: M.pose_boards(cfg, o, g, p, r)
            )(occ, garb, piece, rot)              # (N,4,W,H), (N,4,W,H,H)
        else:
            mask, occ_after, _cleared = jax.vmap(
                lambda o, g, p, r: M.placement_boards(cfg, o, g, p, r)
            )(occ, garb, piece, rot)              # (N,4,W), (N,4,W,H)

        # successor observation: my board replaced by the candidate board,
        # my current piece replaced by the next piece; everything else (opp
        # board, scalars) held fixed — the standard one-ply frozen-opponent
        # approximation the reference's simulate_actions(finalize=False)
        # makes (tetris_environment.py:87-100: garbage/combo not advanced).
        K = 4 * W * H if full else 4 * W
        my_grid = field_grid(cfg, occ_after.reshape(N, K, -1))   # (N,K,H,W)
        vec_me = jnp.repeat(obs.vec[:, 0:1, :], K, axis=1)       # (N,K,12)
        # piece one-hot part of vec is the NEXT piece after the placement —
        # unknown (not yet drawn); zero it out (indices 5..12 are nextpiece)
        vec_me = vec_me.at[:, :, 5:].set(0.0)
        vec_opp = jnp.repeat(obs.vec[:, 1:2, :], K, axis=1)
        vis_opp = jnp.repeat(obs.vis[:, 1:2, :, :, :], K, axis=1)

        flat = lambda a: a.reshape((N * K,) + a.shape[2:])
        v = net.apply(params,
                      [flat(vec_me), flat(vec_opp)],
                      [flat(my_grid)[..., None], flat(vis_opp)])  # (N*K, P)
        v = v.reshape(N, K, -1)
        # condition on the piece acting in s' (= my current nextpiece)
        if v.shape[-1] > 1:
            v_next = jnp.take_along_axis(
                v, jnp.repeat(nxt[:, None, None], K, axis=1), axis=2)[..., 0]
            v_mean_next = jnp.mean(v, axis=-1)
        else:
            v_next = v[..., 0]
            v_mean_next = v[..., 0]
        scores = jnp.where(mask.reshape(N, K), v_next, -jnp.inf)  # (N, K)

        kexp, kpick = jax.random.split(key)
        greedy = jnp.argmax(scores, axis=1)
        if distribution == "epsilon":
            # uniform over legal placements with prob epsilon
            u = jnp.log(jnp.where(mask.reshape(N, K), 1.0, 0.0))
            rand_pick = jax.random.categorical(kpick, u, axis=1)
            explore = jax.random.uniform(kexp, (N,)) < hp.epsilon
            choice = jnp.where(explore, rand_pick, greedy)
        elif distribution == "adaptive_epsilon":
            u = jnp.log(jnp.where(mask.reshape(N, K), 1.0, 0.0))
            rand_pick = jax.random.categorical(kpick, u, axis=1)
            eff = hp.epsilon / jnp.maximum(hp.avg_traj_len, 1e-6)
            explore = jax.random.uniform(kexp, (N,)) < eff
            choice = jnp.where(explore, rand_pick, greedy)
        elif distribution == "argmax":
            choice = greedy
        elif distribution == "boltzmann":
            choice = jax.random.categorical(kpick, scores, axis=1)
        else:
            raise ValueError(distribution)
        # never pick an illegal cell even if every score is -inf (no legal
        # placement can only happen for a dead player; engine ignores it)
        choice = jnp.where(jnp.any(mask.reshape(N, K), axis=1), choice, 0)

        idx = jnp.arange(N)
        v_sel = scores[idx, choice]
        v_sel = jnp.where(jnp.isfinite(v_sel), v_sel, 0.0)
        prob = jnp.where(
            jnp.sum(mask.reshape(N, K), axis=1) > 0,
            1.0 / jnp.maximum(jnp.sum(mask.reshape(N, K), axis=1), 1), 1.0)
        v_mean = jnp.mean(jnp.where(mask.reshape(N, K),
                                    v_mean_next, 0.0), axis=1)
        if full:
            r_enum = choice // (W * H)
            c = (choice // H) % W
            y = choice % H
            return obs, piece, r_enum, c, y, prob, v_sel, v_mean
        r_abs = choice // W
        x = (choice % W) - 1          # mask column c corresponds to posX c-1
        # env.step_place takes cw rotations relative to the CURRENT rotation
        r_rel = (r_abs - rot) % 4
        return obs, piece, r_rel, x, prob, v_sel, v_mean

    return policy


def make_sixten_rollout(env: TetrisVectorEnv, net: VNet, horizon: int,
                        distribution: str = "epsilon", epsilon: float = 0.05,
                        action_space: str = "top_drop"):
    """Like algos.rollout.make_rollout_fn but stepping with column-targeted
    placements (env.step_place) — SIXten's action space is the mask grid,
    not the (far-left + t rights) macro.  With action_space="full" the
    policy enumerates the whole top-drop ∪ finesse set and steps with
    direct pose-locks (env.step_pose)."""
    from drl_tetris_tpu.algos.rollout import Segment, _perspective_occ

    full = action_space == "full"
    policy = make_sixten_policy(env, net, distribution, epsilon, action_space)

    @jax.jit
    def rollout(params, env_state, key, hp=None):
        def step_fn(carry, key):
            params, env_state = carry
            player = env_state.current_player
            obs, piece, *act, prob, v_sel, v_mean = policy(
                params, env_state, key, hp)
            occ = _perspective_occ(env_state, player)
            if full:
                r_enum, c, y = act
                new_state, reward, done = env.step_pose(env_state, r_enum, c, y)
                rec_rot, rec_tr = r_enum, c
            else:
                r_rel, x = act
                new_state, reward, done = env.step_place(env_state, r_rel, x)
                rec_rot, rec_tr = r_rel, jnp.maximum(x, 0)
            out = Segment(occ=occ, vec=obs.vec, piece=piece, rot=rec_rot,
                          trans=rec_tr, prob=prob, v_piece=v_sel,
                          v_mean=v_mean, reward=reward, done=done, player=player)
            return (params, new_state), out

        keys = jax.random.split(key, horizon)
        (params, env_state), seg = jax.lax.scan(
            step_fn, (params, env_state), keys)
        out = policy(params, env_state, jax.random.fold_in(key, horizon), hp)
        v_last = out[-2]
        return env_state, seg, v_last

    return rollout


# ---------------------------------------------------------------------------
# Training: prio_vnet's update (prio_vnet.py:176-232)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SixtenConfig:
    lr: float = 1e-4
    nn_regularizer: float = 1e-4
    n_samples_each_update: int = 4096
    minibatch_size: int = 32
    n_train_epochs: int = 1
    alpha: Any = 0.7                      # prioritized_replay_alpha (ParamLike)
    beta: Any = 0.7                       # (scheduled per update like DQN's)
    time_to_reference_update: int = 3     # sixten preset (presets.py:147 class)
    estimator: EstimatorConfig = EstimatorConfig()


@struct.dataclass
class SixtenState:
    params: Any
    ref_params: Any
    opt_state: Any
    update_count: jnp.ndarray


def make_sixten_update(engine_cfg: EngineConfig, net: VNet, cfg: SixtenConfig,
                       replay_cfg: ReplayConfig):
    """Returns (init_fn(params), update_fn(state, replay, key) ->
    (state', replay', stats)): prioritized k-step V-learning."""
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    target_fn = make_target_fn(engine_cfg, net, cfg.estimator)

    def init_fn(params) -> SixtenState:
        return SixtenState(params=params,
                           ref_params=jax.tree.map(jnp.copy, params),
                           opt_state=tx.init(params),
                           update_count=jnp.int32(0))

    def v_of(params, occ, vec, piece):
        grids = field_grid(engine_cfg, occ)
        vis = [grids[:, 0, :, :, None], grids[:, 1, :, :, None]]
        vl = [vec[:, 0, :], vec[:, 1, :]]
        v = net.apply(params, vl, vis)                       # (B, P)
        if v.shape[-1] > 1:
            return v[jnp.arange(v.shape[0]), piece]
        return v[:, 0]

    def loss_fn(params, mb, weights):
        v = v_of(params, mb["occ0"], mb["vec0"], mb["piece"])
        err = v - mb["target"]
        prios = jnp.abs(err)
        value_loss = jnp.mean(weights * err ** 2)
        reg = cfg.nn_regularizer * 0.5 * sum(
            jnp.sum(jnp.square(w)) for w in jax.tree.leaves(params))
        loss = value_loss + reg
        return loss, (prios, {"v_val": jnp.mean(v),
                              "v_target": jnp.mean(mb["target"]),
                              "value_loss": value_loss, "reg_loss": reg,
                              "tot_loss": loss})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    from drl_tetris_tpu.config.parameter import param_eval

    @jax.jit
    def update_fn(state: SixtenState, replay: ReplayState, key,
                  alpha=None, beta=None):
        alpha = param_eval(cfg.alpha) if alpha is None else alpha
        beta = param_eval(cfg.beta) if beta is None else beta
        ks, kp = jax.random.split(key)
        idx, iw = replay_sample(replay_cfg, replay, ks,
                                cfg.n_samples_each_update, alpha, beta)
        win = replay_gather_windows(replay_cfg, replay, idx)
        targets = target_fn(state.ref_params, win)
        samples = {"occ0": win["occ"][:, 0], "vec0": win["vec"][:, 0],
                   "piece": win["piece"], "target": targets}
        n = cfg.n_samples_each_update
        n_mb = n // cfg.minibatch_size

        def epoch_step(carry, ekey):
            params, opt_state, prio_buf = carry
            perm = jax.random.permutation(ekey, n)
            mb_idxs = perm[: n_mb * cfg.minibatch_size].reshape(
                n_mb, cfg.minibatch_size)

            def mb_step(c, mi):
                params, opt_state, prio_buf = c
                mb = jax.tree.map(lambda a: a[mi], samples)
                (loss, (prios, stats)), grads = grad_fn(params, mb, iw[mi])
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                prio_buf = prio_buf.at[mi].set(prios)
                return (params, opt_state, prio_buf), stats

            (params, opt_state, prio_buf), stats = jax.lax.scan(
                mb_step, (params, opt_state, prio_buf), mb_idxs)
            return (params, opt_state, prio_buf), jax.tree.map(
                lambda a: a[-1], stats)

        prio_buf = jnp.zeros((n,), jnp.float32)
        ekeys = jax.random.split(kp, cfg.n_train_epochs)
        (params, opt_state, prio_buf), stats = jax.lax.scan(
            epoch_step, (state.params, state.opt_state, prio_buf), ekeys)
        stats = jax.tree.map(lambda a: a[-1], stats)

        replay = replay_update_prios(replay, idx, prio_buf)
        count = state.update_count + 1
        do_ref = (count % cfg.time_to_reference_update) == 0
        ref_params = jax.tree.map(
            lambda m, r: jnp.where(do_ref, m, r), params, state.ref_params)
        return SixtenState(params=params, ref_params=ref_params,
                           opt_state=opt_state, update_count=count), \
            replay, stats

    return init_fn, update_fn
