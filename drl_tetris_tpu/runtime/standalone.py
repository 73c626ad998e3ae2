"""Standalone single-process self-play training (SVENton-PPO, one chip).

The reference's run_standalone mode (presets.py:157, sventon_agent.py:42-47,
140-144): worker and trainer in one process, no Redis.  Here the whole
iteration — rollout segment, GAE, PPO update, weight handoff — is two jitted
calls; the worker's policy params are simply the learner's (in-memory
broadcast; the distributed runtime in drl_tetris_tpu/parallel shards this
across a mesh).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from drl_tetris_tpu.engine.core import EngineConfig
from drl_tetris_tpu.env.env import EnvConfig, TetrisVectorEnv
from drl_tetris_tpu.models.nets import ModelConfig, PPONet, QNet
from drl_tetris_tpu.algos.ppo import PPOConfig, make_ppo_update, segment_to_batch
from drl_tetris_tpu.algos.dqn import DQNConfig, make_dqn_update
from drl_tetris_tpu.algos.replay import (
    ReplayConfig, replay_init, replay_add_segment)
from drl_tetris_tpu.algos.rollout import HParams, make_rollout_fn, policy_inputs
from drl_tetris_tpu.config.parameter import param_eval
from drl_tetris_tpu.utils.metrics import fetch_stats


@partial(jax.jit, static_argnames=("tau",))
def _traj_len_ema(done_tn, ep_len, atl, tau):
    """Fold a segment's done flags into the avg-trajectory-length EMA
    (sherlock_agent.py:173: atl <- (1-tau)*atl + tau*len, one step per
    finished round; ep_len carries partial round lengths across segments).

    Device-side double lax.scan — EMA folds run in (tick, env-index) order,
    exactly the old host double loop's semantics, without the O(T*N)
    per-iteration Python on the DQN hot path (r2 VERDICT item 10)."""
    done_tn = jnp.asarray(done_tn)
    ep_len = jnp.asarray(ep_len, jnp.int32)
    atl = jnp.asarray(atl, jnp.float32)

    def tick(carry, d_t):
        ep_len, atl = carry
        ep_len = ep_len + 1

        def fold(a, x):
            fin, length = x
            return jnp.where(fin, (1.0 - tau) * a + tau * length, a), ()

        atl, _ = jax.lax.scan(fold, atl,
                              (d_t, ep_len.astype(jnp.float32)))
        ep_len = jnp.where(d_t, 0, ep_len)
        return (ep_len, atl), ()

    (ep_len, atl), _ = jax.lax.scan(tick, (ep_len, atl), done_tn)
    return ep_len, atl


def _traj_len_ema_host(done_tn, ep_len, atl, tau):
    """Host reference implementation (the pre-r3 double loop), kept for
    the numerical-equivalence test and as a fallback."""
    import numpy as np
    d = np.asarray(done_tn)
    ep_len = np.asarray(ep_len).copy()
    for t in range(d.shape[0]):
        ep_len += 1
        fin = np.flatnonzero(d[t])
        for length in ep_len[fin]:
            atl = (1.0 - tau) * atl + tau * float(length)
        ep_len[fin] = 0
    return ep_len, atl


@dataclasses.dataclass(frozen=True)
class StandaloneConfig:
    env: EnvConfig = EnvConfig()
    model: ModelConfig = ModelConfig()
    ppo: PPOConfig = PPOConfig()
    n_envs: int = 30              # n_envs_per_thread (sventon_ppo.py:64)
    horizon: int = 72             # ticks per segment; n_envs*horizon >= 2048
    seed: int = 0
    # value_lr as a Parameter(t) schedule (tools/parameter.py:8-66): when
    # set, the optimizer's lr is re-evaluated per iteration through
    # optax.inject_hyperparams (ppo.set_learning_rate); None keeps the
    # static cfg.ppo.lr.
    lr_schedule: Any = None
    # League-pool opponent training (anti-cycling; beyond the reference):
    # with probability pool_prob an iteration rolls out against a frozen
    # past snapshot instead of pure self-play, training only the learner's
    # ticks.  Snapshots are taken every pool_every iterations (0 = never).
    pool_prob: float = 0.0
    pool_size: int = 4
    pool_every: int = 0
    # Opponent selection: "uniform", or "pfsp" — prioritized fictitious
    # self-play (the league standard the reference community uses for
    # anti-cycling): each pool entry carries an EMA of the learner's
    # win rate against it, and opponents are drawn with variance
    # weighting w*(1-w), concentrating training on even matches rather
    # than already-crushed or hopeless ones.
    pool_mode: str = "uniform"
    pool_wr_lr: float = 0.05      # per-pool-segment EMA step
    # reward shaper fn (algos/reward_shapers.make_shaper) applied to
    # segments before GAE — where process_trajectory applies it
    # (trajectory.py:59)
    reward_shaper: Any = None


class StandaloneTrainer:
    def __init__(self, cfg: StandaloneConfig):
        from drl_tetris_tpu.algos.ppo import segment_to_windows
        self.cfg = cfg
        self.env = TetrisVectorEnv(cfg.env, cfg.n_envs)
        self.net = PPONet(cfg.model, full_network=True)
        # workers run the value-stream-free net when the trainer computes
        # targets (full_network=(not worker_only or
        # workers_computes_advantages), ppo_nets.py:28) — the value tower
        # is ~1/3 of the forward FLOPs, skipped on every rollout tick.
        # Param names align: the tower is the last-defined module, so the
        # shared trunk's flax paths are identical and the full param dict
        # applies to the partial net (extra entries unused).
        wca = cfg.ppo.workers_computes_advantages
        self.worker_net = self.net if wca else PPONet(
            cfg.model, full_network=False)
        self.rollout = make_rollout_fn(self.env, self.worker_net, cfg.horizon)
        self.init_opt, self.update = make_ppo_update(
            cfg.env.engine, self.net, cfg.ppo)
        self._proc = jax.jit(
            lambda seg, v_last: segment_to_batch(cfg.ppo, seg, v_last))

        # The whole iteration — rollout segment, worker/trainer target
        # processing, PPO epochs — as ONE jitted program: one dispatch per
        # iteration instead of three (the axon tunnel costs ~30 ms fixed
        # latency per dispatch; at 512 envs that was ~25% of the iteration).
        def _fused(state, env_state, key):
            kroll, kupd = jax.random.split(key)
            env_state, seg, v_last = self.rollout(
                state.params, env_state, kroll)
            if cfg.reward_shaper is not None:
                seg = seg._replace(
                    reward=cfg.reward_shaper(seg.reward, seg.done))
            if wca:
                batch, gae_stats = segment_to_batch(cfg.ppo, seg, v_last)
            else:
                batch, gae_stats = segment_to_windows(cfg.ppo, seg), {}
            state, stats = self.update(state, batch, kupd)
            stats.update(gae_stats)
            return state, env_state, stats
        self._fused_step = jax.jit(_fused)

        # pool-opponent machinery (lazy: only when configured)
        self._pool = []
        self._iter = 0
        if cfg.pool_prob > 0:
            import collections
            import numpy as np
            from drl_tetris_tpu.algos.ppo import pool_segment_to_batch
            from drl_tetris_tpu.algos.rollout import make_pool_rollout_fn
            assert cfg.ppo.workers_computes_advantages, \
                "pool training uses worker-side GAE"
            self._pool = collections.deque(maxlen=cfg.pool_size)
            # per-entry learner-win-rate EMA, appended in lockstep with
            # _pool so deque eviction keeps them aligned (PFSP weights)
            self._pool_wr = collections.deque(maxlen=cfg.pool_size)
            self._host_rng = np.random.RandomState(cfg.seed + 7)
            pool_rollout = make_pool_rollout_fn(
                self.env, self.worker_net, cfg.horizon)

            def _fused_pool(state, env_state, key, opp_params, learner_first):
                kroll, kupd = jax.random.split(key)
                env_state, seg, v_last = pool_rollout(
                    state.params, opp_params, env_state, kroll,
                    learner_first=learner_first)
                if cfg.reward_shaper is not None:
                    seg = seg._replace(
                        reward=cfg.reward_shaper(seg.reward, seg.done))
                batch, gae_stats = pool_segment_to_batch(
                    cfg.ppo, seg, v_last,
                    learner_parity=0 if learner_first else 1)
                state, stats = self.update(state, batch, kupd)
                stats.update(gae_stats)
                # learner outcomes vs this opponent (PFSP bookkeeping):
                # at a done tick the acting player's terminal reward is
                # +/-1 zero-sum, so the learner's outcome is the reward as
                # recorded on its parity ticks and the negation elsewhere
                lp = 0 if learner_first else 1
                parity = (jnp.arange(seg.done.shape[0]) % 2)[:, None]
                lrew = jnp.where(parity == lp, seg.reward, -seg.reward)
                stats["pool/wins"] = jnp.sum(
                    jnp.where(seg.done & (lrew > 0), 1, 0))
                stats["pool/losses"] = jnp.sum(
                    jnp.where(seg.done & (lrew < 0), 1, 0))
                return state, env_state, stats
            self._fused_pool = jax.jit(
                _fused_pool, static_argnames=("learner_first",))

        key = jax.random.PRNGKey(cfg.seed)
        self.key, kinit, kenv = jax.random.split(key, 3)
        H, W = cfg.env.engine.height, cfg.env.engine.width
        dummy_vec = [jnp.zeros((1, 12))] * 2
        dummy_vis = [jnp.zeros((1, H, W, 1))] * 2
        params = self.net.init(kinit, dummy_vec, dummy_vis)
        self.state = self.init_opt(params)
        self.env_state = self.env.reset(kenv)
        self.total_steps = 0
        self.stats = {}

    def seed_pool(self, params) -> None:
        """Pre-seed the opponent pool with an external frozen policy
        (the CLI's --pool-seed path); keeps the PFSP EMA aligned."""
        self._pool.append(params)
        self._pool_wr.append(0.5)

    def _pick_opponent(self) -> int:
        """Uniform draw, or PFSP variance weighting w*(1-w): even matches
        carry the most training signal; a floor keeps every entry in play
        so a crushed (or crushing) opponent is still probed occasionally."""
        import numpy as np
        if self.cfg.pool_mode != "pfsp" or len(self._pool) == 1:
            return int(self._host_rng.randint(len(self._pool)))
        wr = np.asarray(self._pool_wr, np.float64)
        wgt = np.maximum(wr * (1.0 - wr), 0.02)
        return int(self._host_rng.choice(len(self._pool), p=wgt / wgt.sum()))

    def train_iteration(self):
        """One worker segment + one PPO update (trainer.py:71-75 semantics)."""
        cfg = self.cfg
        if cfg.lr_schedule is not None:
            from drl_tetris_tpu.algos.ppo import set_learning_rate
            self.state = set_learning_rate(
                self.state, param_eval(cfg.lr_schedule, self.total_steps))
        self.key, kstep = jax.random.split(self.key)
        use_pool = (len(self._pool) > 0
                    and self._host_rng.rand() < cfg.pool_prob)
        if use_pool:
            idx = self._pick_opponent()
            opp = self._pool[idx]
            self.state, self.env_state, stats = self._fused_pool(
                self.state, self.env_state, kstep, opp,
                learner_first=bool(self._iter % 2 == 0))
            # fold this segment's finished rounds into the opponent's
            # win-rate EMA (one host sync per POOL iteration only)
            w = float(stats.pop("pool/wins"))
            l = float(stats.pop("pool/losses"))
            if w + l > 0:
                self._pool_wr[idx] = (
                    (1 - cfg.pool_wr_lr) * self._pool_wr[idx]
                    + cfg.pool_wr_lr * w / (w + l))
            stats["pool/opponent_winrate_ema"] = self._pool_wr[idx]
        else:
            self.state, self.env_state, stats = self._fused_step(
                self.state, self.env_state, kstep)
        self._iter += 1
        if cfg.pool_every and self._iter % cfg.pool_every == 0:
            self._pool.append(jax.tree.map(jnp.asarray, self.state.params))
            self._pool_wr.append(0.5)
        self.total_steps += cfg.n_envs * cfg.horizon
        self.stats = fetch_stats(stats)
        return self.stats

    def run(self, n_iterations: int, log_every: int = 1, logger=print):
        for it in range(n_iterations):
            t0 = time.time()
            stats = self.train_iteration()
            jax.block_until_ready(self.state.params)
            dt = time.time() - t0
            if it % log_every == 0:
                sps = self.cfg.n_envs * self.cfg.horizon / dt
                logger(f"iter {it}: {sps:,.0f} env-steps/s  "
                       f"loss={stats['losses/total_loss']:.4f}  "
                       f"entropy={stats['entropy/entropy']:.3f}  "
                       f"clip_sat={stats['misc/clip_saturation']:.3f}")
        return self.stats


@dataclasses.dataclass(frozen=True)
class SherlockTrainerConfig:
    env: EnvConfig = EnvConfig()
    model: ModelConfig = ModelConfig()
    n_envs: int = 16
    horizon: int = 32
    action_space: str = "top_drop"   # or "full" (top-drop ∪ finesse poses)
    seed: int = 0


class StandaloneSherlockTrainer:
    """Sherlock (delta-PPO) self-play in one process
    (agents/sherlock_agent/*, SURVEY.md 2.3)."""

    def __init__(self, cfg: SherlockTrainerConfig, sherlock_cfg=None):
        from drl_tetris_tpu.algos.sherlock import (
            SherlockConfig, SherlockNet, make_sherlock_rollout,
            make_sherlock_update, sherlock_segment_to_batch)
        self.cfg = cfg
        self.scfg = sherlock_cfg or SherlockConfig()
        self.env = TetrisVectorEnv(cfg.env, cfg.n_envs)
        self.net = SherlockNet(cfg.model, full_network=True)
        self.rollout = make_sherlock_rollout(self.env, self.net, cfg.horizon,
                                             action_space=cfg.action_space)
        self.init_opt, self.update = make_sherlock_update(
            cfg.env.engine, self.net, self.scfg)
        self._proc = jax.jit(
            lambda seg, v_last: sherlock_segment_to_batch(
                self.scfg, seg, v_last))
        key = jax.random.PRNGKey(cfg.seed)
        self.key, kinit, kenv = jax.random.split(key, 3)
        H, W = cfg.env.engine.height, cfg.env.engine.width
        params = self.net.init(
            kinit, [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
        self.state = self.init_opt(params)
        self.env_state = self.env.reset(kenv)
        self.total_steps = 0
        self.stats = {}

    def train_iteration(self):
        self.key, kroll, kupd = jax.random.split(self.key, 3)
        self.env_state, seg, v_last = self.rollout(
            self.state.params, self.env_state, kroll)
        batch, _ = self._proc(seg, v_last)
        self.state, stats = self.update(self.state, batch, kupd)
        self.total_steps += self.cfg.n_envs * self.cfg.horizon
        self.stats = fetch_stats(stats)
        return self.stats


@dataclasses.dataclass(frozen=True)
class DualPolicyConfig:
    env: EnvConfig = EnvConfig()
    model: ModelConfig = ModelConfig()
    ppo: PPOConfig = dataclasses.field(
        default_factory=lambda: PPOConfig(single_policy=False))
    n_envs: int = 30
    horizon: int = 72
    seed: int = 0
    winrate_lr: float = 0.02        # presets.py:179
    winrate_tolerance: float = 0.1  # presets.py:180


class DualPolicyTrainer:
    """Two policies in one program, trained against each other
    (single_policy=False; worker.py:157-192, sventon_agent_base.py:96-111).
    The win-rate gate skips updating a policy that is already ahead."""

    def __init__(self, cfg: DualPolicyConfig):
        from drl_tetris_tpu.algos.dual import (
            make_dual_rollout_fn, split_dual_segment, WinRateTracker)
        assert not cfg.ppo.single_policy
        self.cfg = cfg
        self.env = TetrisVectorEnv(cfg.env, cfg.n_envs)
        self.net = PPONet(cfg.model, full_network=True)
        self.rollout = make_dual_rollout_fn(self.env, self.net, cfg.horizon)
        self.init_opt, self.update = make_ppo_update(
            cfg.env.engine, self.net, cfg.ppo)
        self._split = jax.jit(
            lambda seg, v_last: split_dual_segment(cfg.ppo, seg, v_last))
        self.winrate = WinRateTracker(cfg.winrate_lr, cfg.winrate_tolerance)

        key = jax.random.PRNGKey(cfg.seed)
        self.key, k0, k1, kenv = jax.random.split(key, 4)
        H, W = cfg.env.engine.height, cfg.env.engine.width
        dummy = ([jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
        self.states = [self.init_opt(self.net.init(k, *dummy))
                       for k in (k0, k1)]
        self.env_state = self.env.reset(kenv)
        self.total_steps = 0
        self.stats = {}

    @property
    def state(self):
        # checkpoint/league view: policy_0 (the reference's model dict keys
        # policy_0/policy_1, sventon_agent_base.py:96-111; save both via
        # .states when the distinction matters)
        return self.states[0]

    def train_iteration(self):
        self.key, kroll, ku0, ku1 = jax.random.split(self.key, 4)
        self.env_state, seg, v_last = self.rollout(
            self.states[0].params, self.states[1].params,
            self.env_state, kroll)
        self.winrate.update(self.env.get_winner(self.env_state))
        b0, b1, gstats = self._split(seg, v_last)
        stats = {}
        for p, (batch, kupd) in enumerate(((b0, ku0), (b1, ku1))):
            if not self.winrate.should_train(p):
                continue
            self.states[p], s = self.update(self.states[p], batch, kupd)
            stats.update({f"policy_{p}/{k}": v
                          for k, v in fetch_stats(s).items()})
        self.total_steps += self.cfg.n_envs * self.cfg.horizon
        stats["winrate/policy_0"] = self.winrate.rate_0
        self.stats = stats
        return stats


@dataclasses.dataclass(frozen=True)
class DualPolicyDQNConfig:
    env: EnvConfig = EnvConfig()
    model: ModelConfig = ModelConfig()
    dqn: DQNConfig = DQNConfig()
    replay: ReplayConfig = ReplayConfig()
    n_envs: int = 80
    horizon: int = 32             # ticks; each policy gets horizon/2
    train_distribution: str = "epsilon"
    epsilon: Any = 0.05
    action_temperature: Any = 1.0
    tau_learning_rate: float = 0.01
    seed: int = 0
    winrate_lr: float = 0.02        # winrate_learningrate (presets.py:179)
    winrate_tolerance: float = 0.1  # presets.py:180


class DualPolicyDQNTrainer:
    """Dual-policy SVENton-DQN: two Q-policies trained against each other,
    one prioritized replay per policy, with the reference's win-rate
    training gate — a policy winning more than 0.5 + tolerance is not
    trained until the other catches up (sventon_agent_dqn_trainer.py:16-18;
    merge semantics worker.py:176-192)."""

    def __init__(self, cfg: DualPolicyDQNConfig):
        from drl_tetris_tpu.algos.dual import (
            WinRateTracker, dual_policy_subsegment, make_dual_rollout_fn,
            merge_dual_transitions)
        assert cfg.horizon % 2 == 0
        # dual mode trains with UNSIGNED gamma (the sign flip exists only
        # for single-policy perspective alternation, sventon_agent_base.py:76)
        est = dataclasses.replace(cfg.dqn.estimator, single_policy=False)
        dqn_cfg = dataclasses.replace(cfg.dqn, estimator=est)
        self.cfg = cfg
        self.env = TetrisVectorEnv(cfg.env, cfg.n_envs)
        self.net = QNet(cfg.model, full_network=True)
        self.rollout = make_dual_rollout_fn(
            self.env, self.net, cfg.horizon,
            distribution=cfg.train_distribution)
        self.init_opt, self.update = make_dqn_update(
            cfg.env.engine, self.net, dqn_cfg, cfg.replay)
        self._split = jax.jit(lambda seg: tuple(
            dual_policy_subsegment(merge_dual_transitions(seg), p)
            for p in (0, 1)))
        self.winrate = WinRateTracker(cfg.winrate_lr, cfg.winrate_tolerance)

        key = jax.random.PRNGKey(cfg.seed)
        self.key, k0, k1, kenv = jax.random.split(key, 4)
        H, W = cfg.env.engine.height, cfg.env.engine.width
        dummy = ([jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
        self.states = [self.init_opt(self.net.init(k, *dummy))
                       for k in (k0, k1)]
        self.replays = [replay_init(cfg.replay), replay_init(cfg.replay)]
        self.env_state = self.env.reset(kenv)
        self.total_steps = 0
        self.stats = {}
        self._ep_len = None
        self.avg_traj_len = 12.0

    @property
    def state(self):
        return self.states[0]

    def _hparams(self):
        t = self.total_steps
        return HParams(
            epsilon=jnp.float32(param_eval(self.cfg.epsilon, t)),
            temperature=jnp.float32(
                param_eval(self.cfg.action_temperature, t)),
            avg_traj_len=jnp.float32(self.avg_traj_len))

    def train_iteration(self):
        import numpy as np
        self.key, kroll, ku0, ku1 = jax.random.split(self.key, 4)
        self.env_state, seg, _ = self.rollout(
            self.states[0].params, self.states[1].params,
            self.env_state, kroll, self._hparams())
        self.winrate.update(self.env.get_winner(self.env_state))
        if self.cfg.train_distribution == "adaptive_epsilon":
            if self._ep_len is None:
                self._ep_len = jnp.zeros(self.cfg.n_envs, jnp.int32)
            self._ep_len, self.avg_traj_len = _traj_len_ema(
                seg.done, self._ep_len,
                self.avg_traj_len, self.cfg.tau_learning_rate)
        subs = self._split(seg)
        stats = {}
        t = self.total_steps
        ab = (jnp.float32(param_eval(self.cfg.dqn.alpha, t)),
              jnp.float32(param_eval(self.cfg.dqn.beta, t)))
        for p, kupd in ((0, ku0), (1, ku1)):
            self.replays[p] = replay_add_segment(
                self.cfg.replay, self.replays[p], subs[p],
                self.cfg.horizon // 2)
            if int(self.replays[p].size) < self.cfg.dqn.n_samples_each_update:
                continue
            # win-rate gate: don't train the policy that's ahead
            # (sventon_agent_dqn_trainer.py:16-18)
            if not self.winrate.should_train(p):
                continue
            self.states[p], self.replays[p], s = self.update(
                self.states[p], self.replays[p], kupd, *ab)
            stats.update({f"policy_{p}/{k}": v
                          for k, v in fetch_stats(s).items()})
        self.total_steps += self.cfg.n_envs * self.cfg.horizon
        stats["winrate/policy_0"] = self.winrate.rate_0
        self.stats = stats
        return stats


@dataclasses.dataclass(frozen=True)
class StandaloneSIXtenConfig:
    env: EnvConfig = EnvConfig()
    model: ModelConfig = ModelConfig()
    replay: ReplayConfig = ReplayConfig()
    n_envs: int = 16              # SIXten shape (sixten_base.py:29)
    horizon: int = 32
    train_distribution: str = "epsilon"
    epsilon: Any = 0.05           # ParamLike: evaluated per iteration
    action_temperature: Any = 1.0
    tau_learning_rate: float = 0.01
    # "top_drop" = the (4, W) mask grid; "full" = top-drop ∪ finesse rests
    # executed as direct pose-locks (the reference world-model agents' full
    # get_actions candidate set, tetris_environment.py:77-85)
    action_space: str = "top_drop"
    seed: int = 0


class StandaloneSIXtenTrainer:
    """SIXten in one process: world-model one-ply search rollouts (V over
    simulated successor boards) into prioritized replay, k-step lambda
    V-targets through the reference net (prio_vnet.py:176-232 semantics —
    see algos/sixten.py)."""

    def __init__(self, cfg: StandaloneSIXtenConfig, sixten_cfg=None):
        from drl_tetris_tpu.algos.sixten import (
            SixtenConfig, VNet, make_sixten_rollout, make_sixten_update)
        self.cfg = cfg
        self.scfg = sixten_cfg or SixtenConfig()
        self.env = TetrisVectorEnv(cfg.env, cfg.n_envs)
        self.net = VNet(cfg.model, full_network=True)
        self.rollout = make_sixten_rollout(
            self.env, self.net, cfg.horizon,
            distribution=cfg.train_distribution,
            epsilon=param_eval(cfg.epsilon),
            action_space=cfg.action_space)
        self.init_opt, self.update = make_sixten_update(
            cfg.env.engine, self.net, self.scfg, cfg.replay)

        key = jax.random.PRNGKey(cfg.seed)
        self.key, kinit, kenv = jax.random.split(key, 3)
        H, W = cfg.env.engine.height, cfg.env.engine.width
        params = self.net.init(
            kinit, [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
        self.state = self.init_opt(params)
        self.replay = replay_init(cfg.replay)
        self.env_state = self.env.reset(kenv)
        self.total_steps = 0
        self.stats = {}
        self._ep_len = None
        self.avg_traj_len = 12.0      # sherlock_agent.py:39 init

    def _hparams(self):
        t = self.total_steps
        return HParams(
            epsilon=jnp.float32(param_eval(self.cfg.epsilon, t)),
            temperature=jnp.float32(
                param_eval(self.cfg.action_temperature, t)),
            avg_traj_len=jnp.float32(self.avg_traj_len))

    def train_iteration(self):
        import numpy as np
        self.key, kroll, kupd = jax.random.split(self.key, 3)
        self.env_state, seg, _ = self.rollout(
            self.state.params, self.env_state, kroll, self._hparams())
        if self.cfg.train_distribution == "adaptive_epsilon":
            if self._ep_len is None:
                self._ep_len = jnp.zeros(self.cfg.n_envs, jnp.int32)
            self._ep_len, self.avg_traj_len = _traj_len_ema(
                seg.done, self._ep_len,
                self.avg_traj_len, self.cfg.tau_learning_rate)
        self.replay = replay_add_segment(
            self.cfg.replay, self.replay, seg, self.cfg.horizon)
        self.total_steps += self.cfg.n_envs * self.cfg.horizon
        if int(self.replay.size) >= self.scfg.n_samples_each_update:
            t = self.total_steps
            self.state, self.replay, stats = self.update(
                self.state, self.replay, kupd,
                jnp.float32(param_eval(self.scfg.alpha, t)),
                jnp.float32(param_eval(self.scfg.beta, t)))
            self.stats = fetch_stats(stats)
        return self.stats


@dataclasses.dataclass(frozen=True)
class StandaloneDQNConfig:
    env: EnvConfig = EnvConfig()
    model: ModelConfig = ModelConfig()
    dqn: DQNConfig = DQNConfig()
    replay: ReplayConfig = ReplayConfig()
    n_envs: int = 80              # legacy DQN shape (sventon_base.py:80)
    horizon: int = 32
    train_distribution: str = "epsilon"   # presets.py:80
    epsilon: Any = 0.05           # ParamLike: evaluated per iteration
    action_temperature: Any = 1.0
    tau_learning_rate: float = 0.01
    seed: int = 0


class StandaloneDQNTrainer:
    """SVENton-DQN / SIXten-style k-step value learning in one process:
    epsilon-greedy (or pareto) rollouts into the on-device prioritized
    replay, k-step lambda targets through the reference net, IS-weighted Q
    updates (sventon_agent_dqn_trainer.py semantics)."""

    def __init__(self, cfg: StandaloneDQNConfig):
        self.cfg = cfg
        self.env = TetrisVectorEnv(cfg.env, cfg.n_envs)
        self.net = QNet(cfg.model, full_network=True)
        self.rollout = make_rollout_fn(
            self.env, self.net, cfg.horizon,
            distribution=cfg.train_distribution,
            epsilon=param_eval(cfg.epsilon))
        self.init_opt, self.update = make_dqn_update(
            cfg.env.engine, self.net, cfg.dqn, cfg.replay)

        key = jax.random.PRNGKey(cfg.seed)
        self.key, kinit, kenv = jax.random.split(key, 3)
        H, W = cfg.env.engine.height, cfg.env.engine.width
        params = self.net.init(
            kinit, [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
        self.state = self.init_opt(params)
        self.replay = replay_init(cfg.replay)
        self.env_state = self.env.reset(kenv)
        self.total_steps = 0
        self.stats = {}
        self._ep_len = None
        self.avg_traj_len = 12.0      # sherlock_agent.py:39 init

    def _hparams(self):
        t = self.total_steps
        return HParams(
            epsilon=jnp.float32(param_eval(self.cfg.epsilon, t)),
            temperature=jnp.float32(
                param_eval(self.cfg.action_temperature, t)),
            avg_traj_len=jnp.float32(self.avg_traj_len))

    def train_iteration(self):
        import numpy as np
        self.key, kroll, kupd = jax.random.split(self.key, 3)
        self.env_state, seg, _ = self.rollout(
            self.state.params, self.env_state, kroll, self._hparams())
        if self.cfg.train_distribution == "adaptive_epsilon":
            if self._ep_len is None:
                self._ep_len = jnp.zeros(self.cfg.n_envs, jnp.int32)
            self._ep_len, self.avg_traj_len = _traj_len_ema(
                seg.done, self._ep_len,
                self.avg_traj_len, self.cfg.tau_learning_rate)
        self.replay = replay_add_segment(
            self.cfg.replay, self.replay, seg, self.cfg.horizon)
        self.total_steps += self.cfg.n_envs * self.cfg.horizon
        # trainer waits for enough samples (sventon_agent_dqn_trainer.py:22)
        if int(self.replay.size) >= self.cfg.dqn.n_samples_each_update:
            t = self.total_steps
            self.state, self.replay, stats = self.update(
                self.state, self.replay, kupd,
                jnp.float32(param_eval(self.cfg.dqn.alpha, t)),
                jnp.float32(param_eval(self.cfg.dqn.beta, t)))
            self.stats = fetch_stats(stats)
        return self.stats
