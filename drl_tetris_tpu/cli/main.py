"""Command-line entry points.

Replaces the reference's scripts layer (scripts/trainer_runscript.py,
worker_runscript.py, eval.py, print_settings.py):

  python -m drl_tetris_tpu train        # standalone self-play training
  python -m drl_tetris_tpu train --distributed   # mesh actor-learner
  python -m drl_tetris_tpu eval CKPT [CKPT...]   # round-robin tournament
  python -m drl_tetris_tpu play [CKPT]           # watch games (ANSI render)
  python -m drl_tetris_tpu print-config          # resolved settings dump
  python -m drl_tetris_tpu bench                 # env throughput benchmark
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def _add_common(p):
    p.add_argument("--presets", nargs="*", default=[
        "default", "sventon", "sventon_ppo", "resblock",
        "experiment_sventon_ppo"],
        help="preset layering, applied in order (tools/utils.py:34-45)")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                   help="overrides, e.g. --set gamma=0.99 minibatch_size=128")
    p.add_argument("--run-id", default="run")
    p.add_argument("--data-dir", default="data")


def _parse_overrides(pairs):
    out = {}
    for kv in pairs:
        k, _, v = kv.partition("=")
        try:
            val = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
            continue
        if isinstance(val, (dict, list)):
            # revive __kind__-tagged values (Parameter schedules,
            # CompressorConfig) with the settings side-file codec, so
            # e.g. a scheduled lr is expressible from the command line:
            # --set 'value_lr={"__kind__":"LinearParameter",
            #                  "init_val":4e-4,"final_val":1.2e-4,
            #                  "time_horizon":10000000}'
            from drl_tetris_tpu.runtime.checkpoint import _dec
            val = _dec(val)
        out[k] = val
    return out


def _load_cfg(args):
    from drl_tetris_tpu.config.presets import load
    return load(args.presets, _parse_overrides(args.set), run_id=args.run_id)


_HEADLINE_KEYS = ("losses/total_loss", "losses/policy_loss",
                  "losses/value_loss", "entropy/entropy",
                  "misc/clip_saturation", "tot_loss", "value_loss", "q_val")


def _headline(stats):
    picked = [(k, stats[k]) for k in _HEADLINE_KEYS if k in stats]
    if not picked:
        picked = list(stats.items())[:4]
    return "  ".join(f"{k.split('/')[-1]}={float(v):.4f}" for k, v in picked[:5])


def cmd_train(args):
    if getattr(args, "platform", ""):
        _force_platform(args.platform)
    _enable_cache(with_torch=True)
    if getattr(args, "multihost", False):
        # DCN scale-out: every host runs this same command; JAX wires the
        # global device mesh (SURVEY.md 2.5).  MUST run before anything
        # initializes the XLA backend — config resolution below builds
        # device constants.
        import jax
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id)
        args.distributed = True
    if getattr(args, "experiment", None):
        # batch runs from the experiment schedule: presets + cumulative
        # patches -> one run per patch with distinct run-ids
        # (tools/experiment_schedule.py:3-40, trainer_runscript.py:19-23)
        from drl_tetris_tpu.config.schedule import (
            EXPERIMENTS, experiment_schedule)
        exps = []
        for name in args.experiment:
            if name not in EXPERIMENTS:
                raise SystemExit(
                    f"unknown experiment {name!r}; "
                    f"known: {sorted(EXPERIMENTS)}")
            exps.append(EXPERIMENTS[name])
        for cfg in experiment_schedule(exps, only_last=args.only_last,
                                       overrides=_parse_overrides(args.set)):
            print(f"=== experiment run: {cfg.run_id} ===", flush=True)
            _train_one(cfg, args)
        return
    _train_one(_load_cfg(args), args)


def _make_shaper(cfg):
    """Settings-driven reward shaper ("reward_shaper" +
    "reward_shaper_param", the reference's commented recipe,
    experiments/sventon_base.py:61-62).  The amount is evaluated at t=0
    (a static closure constant inside the jitted segment processing)."""
    name = cfg.settings.get("reward_shaper")
    if not name or name == "none":
        return None
    from drl_tetris_tpu.algos.reward_shapers import make_shaper
    from drl_tetris_tpu.config.parameter import param_eval
    amount = float(param_eval(cfg.settings.get("reward_shaper_param", 0.0)))
    return make_shaper(name, amount, cfg.ppo.single_policy)


def _run_settings(cfg, args, n_envs, horizon):
    """The settings side-file saved next to checkpoints, extended with the
    ACTUAL run geometry so a checkpoint dir alone reproduces its run
    (VERDICT r4 weak item 7: r4c's side-file carried the stale preset
    default n_envs_per_thread=30 while the run trained 1024x64 via CLI
    flags).  The reference's side-file fully reconstructs the agent
    (sventon_agent_base.py:128-129, tools/utils.py:54-64); this goes one
    further and records the command."""
    import shlex
    s = dict(cfg.settings)
    s["n_envs_per_thread"] = n_envs            # the value actually trained
    s["run_geometry"] = {
        "run_id": cfg.run_id, "flavour": cfg.flavour,
        "n_envs": n_envs, "horizon": horizon,
        "total_steps": args.steps, "seed": args.seed,
        "save_every": args.save_every, "league_every": args.league_every,
        "init_from": getattr(args, "init_from", None),
        "pool_seed": list(getattr(args, "pool_seed", None) or []),
        "command": "python -m drl_tetris_tpu "
                   + " ".join(shlex.quote(a) for a in sys.argv[1:]),
    }
    return s


def _train_one(cfg, args):
    import jax
    from drl_tetris_tpu.utils.metrics import (MetricsWriter, fetch_stats,
                                               timekeeper)
    from drl_tetris_tpu.runtime import checkpoint as ckpt

    ckpt_dir = os.path.join(args.data_dir, "models", cfg.run_id)
    metrics_dir = os.path.join(args.data_dir, "summaries")

    def make_league(net):
        if not args.league_every:
            return None
        import jax.numpy as jnp
        from drl_tetris_tpu.runtime.league import TrainingLeague
        H, W = cfg.env.engine.height, cfg.env.engine.width
        rnd = net.init(jax.random.PRNGKey(0xE10),
                       [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
        if cfg.flavour == "sixten":
            kind = ("world_model_full"
                    if cfg.settings.get("sixten_action_space") == "full"
                    else "world_model")
        elif cfg.flavour == "sherlock":
            kind = ("sherlock_full"
                    if cfg.settings.get("sherlock_action_space") == "full"
                    else "sherlock")
        else:
            kind = "macro"
        anchors = []
        for path in getattr(args, "league_anchor", None) or []:
            agent, _ = _load_agent(path, cfg,
                                   name=os.path.basename(path.rstrip("/")))
            anchors.append(agent)
        return TrainingLeague(cfg.env, net, rnd, out_dir=ckpt_dir,
                              games_per_pair=args.league_games, kind=kind,
                              fixed_anchors=anchors)

    def league_tick(league, it, params, total):
        if league is None or it % args.league_every:
            return
        # The league is telemetry: a transient backend failure (e.g. a
        # dropped remote-compile connection) must not kill a multi-hour
        # training run.  Retry with backoff, then skip the tick.
        for attempt in range(3):
            try:
                ratings = league.evaluate(params, total, seed=args.seed + it)
                break
            except Exception as e:  # noqa: BLE001 — deliberately broad
                print(f"[league] eval failed (attempt {attempt + 1}/3): "
                      f"{str(e).splitlines()[0][:200]}", flush=True)
                time.sleep(5.0 * (attempt + 1))
        else:
            print(f"[league] step {total:,}: SKIPPED after 3 failures",
                  flush=True)
            return
        latest = ratings.get(f"step_{total}", 0.0)
        print(f"[league] step {total:,}: elo={latest:.1f}  "
              + " ".join(f"{k}={v:.0f}" for k, v in
                         sorted(ratings.items())), flush=True)

    if args.distributed:
        from drl_tetris_tpu.parallel.mesh import (
            DistributedConfig, DistributedTrainer, make_mesh)
        mesh = make_mesh()
        dcfg = DistributedConfig(
            env=cfg.env, model=cfg.model, ppo=cfg.ppo,
            n_envs=args.n_envs or 4096, horizon=args.horizon)
        tr = DistributedTrainer(dcfg, mesh)
        state, env_state = tr.init(jax.random.PRNGKey(args.seed))
        steps_per_iter = dcfg.n_envs * dcfg.horizon
        run_settings = _run_settings(cfg, args, dcfg.n_envs, dcfg.horizon)
        league = make_league(tr.net)
        with MetricsWriter(metrics_dir, cfg.run_id) as mw:
            total = 0
            it = 0
            key = jax.random.PRNGKey(args.seed + 1)
            while total < args.steps:
                key, k = jax.random.split(key)
                with timekeeper.section("train_step"):
                    state, env_state, stats = tr.train_step(state, env_state, k)
                    jax.block_until_ready(stats)
                total += steps_per_iter
                it += 1
                mw.update(fetch_stats(stats), total)
                if it % args.log_every == 0:
                    print(f"[{total:>12,} steps] " + _headline(stats), flush=True)
                if it % args.save_every == 0:
                    ckpt.save(ckpt_dir, total, state, settings=run_settings)
                league_tick(league, it, state.params, total)
            ckpt.save(ckpt_dir, total, state, settings=run_settings)
        print(timekeeper.table())
        return

    if cfg.flavour == "sixten":
        from drl_tetris_tpu.runtime.standalone import (
            StandaloneSIXtenConfig, StandaloneSIXtenTrainer)
        scfg = StandaloneSIXtenConfig(
            env=cfg.env, model=cfg.model, replay=cfg.replay,
            n_envs=args.n_envs or cfg.n_envs, horizon=args.horizon,
            train_distribution=cfg.train_distribution, seed=args.seed,
            epsilon=cfg.epsilon, action_temperature=cfg.action_temperature,
            tau_learning_rate=cfg.tau_learning_rate,
            action_space=cfg.settings.get("sixten_action_space", "top_drop"))
        tr = StandaloneSIXtenTrainer(scfg, sixten_cfg=cfg.sixten)
    elif cfg.flavour == "sherlock":
        from drl_tetris_tpu.runtime.standalone import (
            SherlockTrainerConfig, StandaloneSherlockTrainer)
        scfg = SherlockTrainerConfig(
            env=cfg.env, model=cfg.model,
            n_envs=args.n_envs or cfg.n_envs, horizon=args.horizon,
            seed=args.seed,
            action_space=cfg.settings.get("sherlock_action_space",
                                          "top_drop"))
        tr = StandaloneSherlockTrainer(scfg, sherlock_cfg=cfg.sherlock)
    elif not cfg.ppo.single_policy:
        # single_policy=False: two policies training against each other
        # (worker.py:157-192 semantics, win-rate training gate)
        if cfg.flavour == "dqn":
            from drl_tetris_tpu.runtime.standalone import (
                DualPolicyDQNConfig, DualPolicyDQNTrainer)
            scfg = DualPolicyDQNConfig(
                env=cfg.env, model=cfg.model, dqn=cfg.dqn, replay=cfg.replay,
                n_envs=args.n_envs or cfg.n_envs, horizon=args.horizon,
                train_distribution=cfg.train_distribution, seed=args.seed,
                epsilon=cfg.epsilon,
                action_temperature=cfg.action_temperature,
                tau_learning_rate=cfg.tau_learning_rate,
                winrate_lr=cfg.settings.get("winrate_learningrate", 0.02),
                winrate_tolerance=cfg.settings.get("winrate_tolerance", 0.1))
            tr = DualPolicyDQNTrainer(scfg)
        else:
            from drl_tetris_tpu.runtime.standalone import (
                DualPolicyConfig, DualPolicyTrainer)
            scfg = DualPolicyConfig(
                env=cfg.env, model=cfg.model, ppo=cfg.ppo,
                n_envs=args.n_envs or cfg.n_envs, horizon=args.horizon,
                seed=args.seed,
                winrate_lr=cfg.settings.get("winrate_learningrate", 0.02),
                winrate_tolerance=cfg.settings.get("winrate_tolerance", 0.1))
            tr = DualPolicyTrainer(scfg)
    elif cfg.flavour == "dqn":
        from drl_tetris_tpu.runtime.standalone import (
            StandaloneDQNConfig, StandaloneDQNTrainer)
        scfg = StandaloneDQNConfig(
            env=cfg.env, model=cfg.model, dqn=cfg.dqn, replay=cfg.replay,
            n_envs=args.n_envs or cfg.n_envs, horizon=args.horizon,
            train_distribution=cfg.train_distribution, seed=args.seed,
            epsilon=cfg.epsilon, action_temperature=cfg.action_temperature,
            tau_learning_rate=cfg.tau_learning_rate)
        tr = StandaloneDQNTrainer(scfg)
    else:
        from drl_tetris_tpu.runtime.standalone import (
            StandaloneConfig, StandaloneTrainer)
        scfg = StandaloneConfig(
            env=cfg.env, model=cfg.model, ppo=cfg.ppo,
            n_envs=args.n_envs or cfg.n_envs, horizon=args.horizon,
            seed=args.seed,
            # raw (possibly scheduled) value_lr: re-evaluated per iteration
            # through inject_hyperparams (ppo.set_learning_rate)
            lr_schedule=cfg.settings.get("value_lr"),
            # league-pool opponent training knobs (settings-driven)
            pool_prob=float(cfg.settings.get("pool_prob", 0.0)),
            pool_size=int(cfg.settings.get("pool_size", 4)),
            pool_every=int(cfg.settings.get("pool_every", 0)),
            pool_mode=str(cfg.settings.get("pool_mode", "uniform")),
            pool_wr_lr=float(cfg.settings.get("pool_wr_lr", 0.05)),
            reward_shaper=_make_shaper(cfg))
        tr = StandaloneTrainer(scfg)

    resumed_from = None
    if getattr(args, "resume", False):
        # Crash/preemption recovery: restore the train state (params +
        # optimizer moments + step budget) from the run's own latest
        # checkpoint and continue counting from there.  Unlike --init-from
        # (a warm start into a fresh run), this continues the same run-id.
        # Not restored: env_state (resets) and, for dqn/sixten, the replay
        # buffer (restarts empty — no gradient updates happen until it
        # refills past n_samples_each_update).
        # Dual-policy trainers expose `state` as a read-only property over
        # `states[0]` — a plain hasattr check would pass and then crash on
        # assignment, so detect them via the property (ADVICE r4 item 1).
        if isinstance(getattr(type(tr), "state", None), property):
            raise SystemExit("--resume supports the single-state trainers "
                             "(ppo/dqn/sixten/sherlock); dual-policy "
                             "checkpoints persist policy 0 only — use "
                             "--init-from for a warm start instead")
        latest = ckpt.latest_step(ckpt_dir)
        if latest is None:
            print(f"[resume] no checkpoint in {ckpt_dir}; starting fresh",
                  flush=True)
        else:
            tr.state = ckpt.restore(ckpt_dir, tr.state, step=latest)
            tr.total_steps = latest
            resumed_from = latest
            # Advance the host RNG stream past the original segment: without
            # this the resumed run replays the run's opening key sequence
            # (ADVICE r4 item 2).
            import jax as _jax
            tr.key = _jax.random.fold_in(tr.key, latest)
            print(f"[resume] restored {ckpt_dir} @ step {latest:,}",
                  flush=True)

    if getattr(args, "init_from", None) and resumed_from is not None:
        # --resume already restored this run's own later state; re-applying
        # the warm start would clobber the progress made since it.
        print(f"[init] --init-from skipped (resumed @ {resumed_from:,})",
              flush=True)
    elif getattr(args, "init_from", None):
        # Warm start: restore a checkpoint's params subtree into the fresh
        # optimizer state (the reference continues runs by loading weight
        # files into a new agent, sventon_agent_base.py:116-145).  The
        # optimizer moments restart — intentional for curriculum phases
        # with different hyperparameters.
        import jax.numpy as jnp
        raw = ckpt.restore_raw(args.init_from)
        raw_params = raw.get("params", raw) if isinstance(raw, dict) else raw
        tr.state = tr.state.replace(params=jax.tree.map(
            lambda ref, v: jnp.asarray(v, ref.dtype).reshape(ref.shape),
            tr.state.params, raw_params))
        print(f"[init] params restored from {args.init_from}", flush=True)

    for path in getattr(args, "pool_seed", None) or []:
        # Pre-seed the opponent pool with external checkpoints (e.g. a
        # strong reference agent): the learner then trains against them
        # from iteration 0 at pool_prob, not only against its own past.
        import jax.numpy as jnp
        if getattr(scfg, "pool_prob", 0) <= 0:
            raise SystemExit("--pool-seed requires pool_prob > 0 "
                             "(--set pool_prob=...)")
        raw = ckpt.restore_raw(path)
        raw_params = raw.get("params", raw) if isinstance(raw, dict) else raw
        seeded = jax.tree.map(
            lambda ref, v: jnp.asarray(v, ref.dtype).reshape(ref.shape),
            tr.state.params, raw_params)
        tr.seed_pool(seeded)
        print(f"[pool] seeded opponent from {path}", flush=True)

    steps_per_iter = scfg.n_envs * scfg.horizon
    run_settings = _run_settings(cfg, args, scfg.n_envs, scfg.horizon)
    league = make_league(tr.net)
    if league is not None and resumed_from is not None:
        # Re-seed the league's rolling opponent pool from the run's own
        # saved snapshots so the resumed segment keeps playing its recent
        # past.  (The cumulative cross-table is not reconstructed — the
        # appended elo_history.jsonl carries both segments; ratings refit
        # over post-resume games only.)
        from drl_tetris_tpu.runtime.evaluate import EvalAgent
        steps = sorted(s for s in (int(d) for d in os.listdir(ckpt_dir)
                                   if d.isdigit()) if s <= resumed_from)
        for s in steps[-4:]:
            raw = ckpt.restore_raw(ckpt_dir, step=s)
            raw_params = raw.get("params", raw) if isinstance(raw, dict) \
                else raw
            league.pool.append(EvalAgent(
                name=f"step_{s}", params=raw_params, net=tr.net,
                distribution=league.distribution, kind=league.kind))
            league.history.steps[f"step_{s}"] = s
        if steps:
            print(f"[resume] league pool re-seeded from snapshots "
                  f"{steps[-4:]}", flush=True)
    with MetricsWriter(metrics_dir, cfg.run_id) as mw:
        it = 0
        while tr.total_steps < args.steps:
            t0 = time.time()
            with timekeeper.section("train_iteration"):
                stats = tr.train_iteration()
            it += 1
            if stats:
                mw.update(stats, tr.total_steps)
            if it % args.log_every == 0:
                sps = steps_per_iter / max(time.time() - t0, 1e-9)
                print(f"[{tr.total_steps:>12,} steps] {sps:,.0f} sps  "
                      + _headline(stats), flush=True)
            if it % args.save_every == 0:
                ckpt.save(ckpt_dir, tr.total_steps, tr.state,
                          settings=run_settings)
            league_tick(league, it, tr.state.params, tr.total_steps)
        ckpt.save(ckpt_dir, tr.total_steps, tr.state,
                  settings=run_settings)
    print(timekeeper.table())


def _load_agent(path, cfg, name=None):
    """Build an EvalAgent from a checkpoint, reconstructing it from the
    settings side-file saved next to the weights (the reference's
    weights<->settings pairing, eval.py:99-104, tools/utils.py:47-52), so
    tournaments can mix flavours and model sizes."""
    import jax
    import jax.numpy as jnp
    from drl_tetris_tpu.models.nets import PPONet, QNet
    from drl_tetris_tpu.runtime import checkpoint as ckpt
    from drl_tetris_tpu.runtime.evaluate import EvalAgent

    if path != "random":
        s = ckpt.load_settings(path)
        if s is not None:
            from drl_tetris_tpu.config.presets import resolve
            try:
                cfg = resolve(s, run_id=cfg.run_id)
            except Exception as e:
                print(f"warning: {path}: unusable settings side-file ({e}); "
                      "using CLI presets", file=sys.stderr)
    kind = "macro"
    if cfg.flavour == "sixten":
        from drl_tetris_tpu.algos.sixten import VNet
        net = VNet(cfg.model, full_network=True)
        kind = ("world_model_full"
                if cfg.settings.get("sixten_action_space") == "full"
                else "world_model")
    elif cfg.flavour == "dqn":
        net = QNet(cfg.model, full_network=True)
    elif cfg.flavour == "sherlock":
        from drl_tetris_tpu.algos.sherlock import SherlockNet
        net = SherlockNet(cfg.model, full_network=True)
        kind = ("sherlock_full"
                if cfg.settings.get("sherlock_action_space") == "full"
                else "sherlock")
    else:
        net = PPONet(cfg.model, full_network=True)
    H, W = cfg.env.engine.height, cfg.env.engine.width
    params = net.init(jax.random.PRNGKey(0),
                      [jnp.zeros((1, 12))] * 2, [jnp.zeros((1, H, W, 1))] * 2)
    if path != "random":
        raw = ckpt.restore_raw(path)
        raw_params = raw.get("params", raw) if isinstance(raw, dict) else raw
        params = jax.tree.map(
            lambda ref, v: jnp.asarray(v, ref.dtype).reshape(ref.shape),
            params, raw_params)
    return EvalAgent(name=name or os.path.basename(path.rstrip("/")),
                     params=params, net=net, kind=kind,
                     distribution=cfg.eval_distribution), cfg


def _check_compat(cfgs):
    """game_size compatibility across tournament entrants
    (tools/utils.py:54-64)."""
    sizes = {(c.env.engine.height, c.env.engine.width) for c in cfgs}
    if len(sizes) > 1:
        raise SystemExit(f"incompatible game sizes between entrants: {sizes}")


def cmd_eval(args):
    from drl_tetris_tpu.runtime.evaluate import round_robin

    def load_all():
        cli_cfg = _load_cfg(args)
        loaded = [_load_agent(p, cli_cfg) for p in args.checkpoints]
        if len(loaded) == 1:
            loaded.append(_load_agent("random", loaded[0][1], name="random"))
        _check_compat([c for _, c in loaded])
        return [a for a, _ in loaded], loaded[0][1]

    rnd = 0
    while True:
        # per-round weight reload: spectate a live training run
        # (eval.py:196-205 --reload)
        agents, cfg = load_all()
        board = round_robin(cfg.env, agents, games_per_pair=args.games,
                            seed=args.seed + rnd, render=args.render)
        print(board.score_table())
        from drl_tetris_tpu.utils.elo import elo_table, fit_elo
        print("\nElo (Bradley-Terry MLE):")
        print(elo_table(fit_elo(board)))
        if not args.reload:
            return
        rnd += 1
        print(f"\n[reload] round {rnd}: reloading weights...", flush=True)
        time.sleep(args.reload)


def cmd_play(args):
    import jax
    from drl_tetris_tpu.runtime.evaluate import play_match
    cfg = _load_cfg(args)
    a, cfg = _load_agent(args.checkpoint or "random", cfg, name="A")
    b, _ = _load_agent(args.checkpoint or "random", cfg, name="B")
    play_match(cfg.env, (a, b), n_games=1, seed=args.seed, render=True,
               pygame=getattr(args, "pygame", False))


def cmd_print_config(args):
    if args.diff:
        return _print_config_diff(*args.diff)
    cfg = _load_cfg(args)
    print(f"# presets: {args.presets}")
    for section in ("env", "model", "ppo", "dqn", "replay"):
        print(f"\n[{section}]")
        print(dataclasses.asdict(getattr(cfg, section)))
    print("\n[merged settings]")
    for k in sorted(cfg.settings):
        print(f"  {k:<36} {cfg.settings[k]!r}")


def _print_config_diff(path_a, path_b):
    """Diff two settings side-files (checkpoint dirs or settings.json
    paths) — tools/settings_printer.py:25-36."""
    from drl_tetris_tpu.runtime.checkpoint import load_settings

    def load_one(p):
        if p.endswith(".json"):
            p = os.path.dirname(p) or "."
        s = load_settings(p)
        if s is None:
            raise SystemExit(f"no settings side-file found for {p}")
        return s

    a, b = load_one(path_a), load_one(path_b)
    keys = sorted(set(a) | set(b))
    same = True
    for k in keys:
        va, vb = a.get(k, "<absent>"), b.get(k, "<absent>")
        if va != vb:
            same = False
            print(f"  {k:<36} {va!r:<28} != {vb!r}")
    if same:
        print("settings are identical")


def _force_platform(name):
    """Pin the JAX backend before any backend initialization.  Process-mode
    runners default to CPU locally because the TPU tunnel serves a single
    process; on real multi-host pods pass --platform tpu (or '')."""
    if not name:
        return
    os.environ["JAX_PLATFORMS"] = name
    import jax
    jax.config.update("jax_platforms", name)


def _standalone_cfg(args, cfg):
    from drl_tetris_tpu.runtime.standalone import StandaloneConfig
    return StandaloneConfig(
        env=cfg.env, model=cfg.model, ppo=cfg.ppo,
        n_envs=args.n_envs or cfg.n_envs, horizon=args.horizon,
        seed=args.seed)


def cmd_kv(args):
    """Run the tetrikv control-plane store in the foreground (the
    docker-compose 'redis' service analog, docker-compose.yaml:29-35)."""
    import subprocess
    from drl_tetris_tpu.runtime.kv import server_binary
    print(f"tetrikv listening on :{args.port}", flush=True)
    sys.exit(subprocess.call([server_binary(), str(args.port)]))


def cmd_worker(args):
    """Process-mode worker (scripts/worker_runscript.py:15-28): claims a
    worker-<i> slot, streams rollout segments to the store, polls weights."""
    _force_platform(args.platform)
    from drl_tetris_tpu.runtime.kv import KVClient
    from drl_tetris_tpu.runtime.runner import WorkerRunner, effective_flavour
    from drl_tetris_tpu.runtime.training_state import TrainingState
    cfg = _load_cfg(args)
    ts = TrainingState(cfg.run_id,
                       kv=KVClient(host=args.host, port=args.port))
    print(f"claimed slot {ts.me} on {args.host}:{args.port}", flush=True)
    runner = WorkerRunner(_standalone_cfg(args, cfg), ts,
                          flavour=effective_flavour(cfg), fw=cfg)
    runner.run(max_steps=args.steps or None,
               logger=lambda m: print(m, flush=True))


def cmd_trainer(args):
    """Process-mode trainer (scripts/trainer_runscript.py:15-26): drains the
    experience queue, trains, publishes versioned weights."""
    _force_platform(args.platform)
    from drl_tetris_tpu.runtime.kv import KVClient
    from drl_tetris_tpu.runtime.runner import TrainerRunner, effective_flavour
    from drl_tetris_tpu.runtime.training_state import TrainingState
    cfg = _load_cfg(args)
    ts = TrainingState(cfg.run_id, role="trainer",
                       kv=KVClient(host=args.host, port=args.port))
    ckpt_dir = os.path.join(args.data_dir, "models", cfg.run_id)
    runner = TrainerRunner(
        _standalone_cfg(args, cfg), ts,
        min_samples=cfg.settings.get("n_samples_each_update", 2048),
        ckpt_dir=ckpt_dir, settings=cfg.settings,
        flavour=effective_flavour(cfg), fw=cfg)
    print(f"trainer up on {args.host}:{args.port}; "
          f"checkpoints -> {ckpt_dir}", flush=True)
    runner.run(max_updates=args.updates or None,
               logger=lambda m: print(m, flush=True),
               log_every=args.log_every)


def cmd_up(args):
    """Topology launcher: tetrikv + 1 trainer + N workers as local processes
    (the docker-compose analog, docker-compose.yaml:4-35).  --chaos kills a
    worker mid-run and starts a replacement that must reclaim the freed slot
    and recover its state (elastic recovery, training_state.py:43-52)."""
    import signal
    import subprocess
    import threading
    from drl_tetris_tpu.runtime.kv import launch_server

    kv_proc = launch_server(args.port)
    print(f"[up] tetrikv on :{args.port}", flush=True)
    procs = {}

    def passthrough():
        return (["--presets", *args.presets] if args.presets else []) + \
               (["--set", *args.set] if args.set else []) + \
               ["--run-id", args.run_id, "--data-dir", args.data_dir,
                "--port", str(args.port), "--platform", "cpu",
                "--n-envs", str(args.n_envs or 0),
                "--horizon", str(args.horizon), "--seed", str(args.seed)]

    def spawn(name, role_args):
        p = subprocess.Popen(
            [sys.executable, "-m", "drl_tetris_tpu", *role_args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        procs[name] = p

        def pump():
            for line in p.stdout:
                print(f"[{name}] {line}", end="", flush=True)
        threading.Thread(target=pump, daemon=True).start()
        return p

    trainer = spawn("trainer", ["trainer", *passthrough(),
                                "--updates", str(args.updates)])
    for i in range(args.workers):
        spawn(f"worker{i}", ["worker", *passthrough(),
                             "--steps", str(args.steps)])

    def stop_all(*_):
        for name, p in procs.items():
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)
        deadline = time.time() + 30
        for p in procs.values():
            try:
                p.wait(timeout=max(0.1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                p.kill()
        kv_proc.kill()

    signal.signal(signal.SIGINT, lambda *_: (stop_all(), sys.exit(130)))
    try:
        if args.chaos:
            time.sleep(args.chaos)
            victim = procs["worker0"]
            print("[up] CHAOS: SIGTERM worker0 (state persists to store)",
                  flush=True)
            victim.send_signal(signal.SIGTERM)
            victim.wait(timeout=120)
            print("[up] CHAOS: starting replacement; it must reclaim the "
                  "slot after the heartbeat TTL lapses and recover",
                  flush=True)
            spawn("worker0b", ["worker", *passthrough(),
                               "--steps", str(args.steps)])
        trainer.wait()
        print(f"[up] trainer finished (rc={trainer.returncode})", flush=True)
    finally:
        stop_all()
    sys.exit(trainer.returncode or 0)


def cmd_bench(args):
    import subprocess
    sys.exit(subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "..",
                                      "bench.py"),
         str(args.n_envs or 4096), str(args.iters)]))


def _enable_cache(with_torch=False):
    """Persistent-compile-cache activation with a STABLE taint namespace.

    Commands that will construct a MetricsWriter (train/trainer) import
    torch EAGERLY first: loading torch's native libs flips XLA:CPU's
    target-tuning features for every later compile, and the cache keys on
    that state (drl_tetris_tpu/__init__._taint_tag) — a mid-process torch
    import would mix incompatible AOT executables into one namespace and
    crash later readers (docs/NOTES_ROUND5.md).  Torch-free commands
    (eval/play/help) stay in the 'plain' namespace shared with the test
    suite and bench."""
    if with_torch:
        try:
            import torch  # noqa: F401
        except ImportError:
            pass
    from drl_tetris_tpu import enable_compilation_cache
    enable_compilation_cache()


def main(argv=None):
    p = argparse.ArgumentParser(prog="drl_tetris_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="self-play training")
    _add_common(t)
    t.add_argument("--steps", type=int, default=10_000_000)
    t.add_argument("--platform", default="",
                   help="force a jax platform for this run (cpu/tpu); "
                        "empty = leave the environment's choice")
    t.add_argument("--experiment", nargs="*", default=[],
                   help="named experiment(s) from config/schedule.py: one "
                        "run per cumulative patch (trainer_runscript.py "
                        "--experiment analog)")
    t.add_argument("--only-last", action="store_true",
                   help="run only the last patch of the schedule "
                        "(experiment_schedule only_last)")
    t.add_argument("--n-envs", type=int, default=0)
    t.add_argument("--horizon", type=int, default=72)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log-every", type=int, default=1)
    t.add_argument("--save-every", type=int, default=50)
    t.add_argument("--league-every", type=int, default=0,
                   help="every N iterations, play the current snapshot "
                        "against past snapshots + a random anchor and refit "
                        "Elo ratings (writes elo_history.jsonl)")
    t.add_argument("--league-games", type=int, default=16)
    t.add_argument("--league-anchor", action="append", default=[],
                   metavar="CHECKPOINT",
                   help="external checkpoint(s) added to the league as "
                        "permanent fixed entrants — makes Elo curves "
                        "comparable across runs (repeatable)")
    t.add_argument("--resume", action="store_true",
                   help="continue this run-id from its latest checkpoint "
                        "(params + optimizer moments + step count; the env "
                        "resets and a dqn/sixten replay buffer restarts "
                        "empty); no-op if the run dir is empty")
    t.add_argument("--init-from", default=None, metavar="CHECKPOINT",
                   help="warm-start: restore this checkpoint's params into "
                        "the fresh train state (optimizer restarts)")
    t.add_argument("--pool-seed", action="append", default=[],
                   metavar="CHECKPOINT",
                   help="pre-seed the opponent pool with external "
                        "checkpoint(s); needs pool_prob > 0 (repeatable)")
    t.add_argument("--distributed", action="store_true",
                   help="mesh actor-learner over all local devices")
    t.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed and span hosts over DCN")
    t.add_argument("--coordinator", default="127.0.0.1:9777")
    t.add_argument("--num-hosts", type=int, default=1)
    t.add_argument("--host-id", type=int, default=0)
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="round-robin tournament between checkpoints")
    _add_common(e)
    e.add_argument("checkpoints", nargs="+")
    e.add_argument("--games", type=int, default=16)
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--render", action="store_true")
    e.add_argument("--reload", type=float, default=0.0, metavar="SECONDS",
                   help="re-run forever, reloading weights between rounds "
                        "(spectate a live training run, eval.py:196-205)")
    e.set_defaults(fn=cmd_eval)

    w = sub.add_parser("play", help="watch a game")
    _add_common(w)
    w.add_argument("checkpoint", nargs="?")
    w.add_argument("--seed", type=int, default=0)
    w.add_argument("--pygame", action="store_true",
                   help="also open the pygame window renderer "
                        "(pause on keypress, draw_tetris.py:103-143)")
    w.set_defaults(fn=cmd_play)

    c = sub.add_parser("print-config", help="dump the resolved configuration")
    _add_common(c)
    c.add_argument("--diff", nargs=2, metavar=("A", "B"),
                   help="diff two settings side-files (checkpoint dirs), "
                        "settings_printer.py:25-36")
    c.set_defaults(fn=cmd_print_config)

    def _add_proc(sp):
        _add_common(sp)
        sp.add_argument("--host", default="127.0.0.1")
        sp.add_argument("--port", type=int, default=6399)
        sp.add_argument("--platform", default="cpu",
                        help="JAX backend for this process ('' = default)")
        sp.add_argument("--n-envs", type=int, default=0)
        sp.add_argument("--horizon", type=int, default=72)
        sp.add_argument("--seed", type=int, default=0)

    k = sub.add_parser("kv", help="run the tetrikv control-plane store")
    k.add_argument("--port", type=int, default=6399)
    k.set_defaults(fn=cmd_kv)

    wk = sub.add_parser(
        "worker", help="process-mode rollout worker (streams segments)")
    _add_proc(wk)
    wk.add_argument("--steps", type=int, default=0,
                    help="stop after N env-steps (0 = until SIGTERM)")
    wk.set_defaults(fn=cmd_worker)

    tr = sub.add_parser(
        "trainer", help="process-mode trainer (drains queue, publishes weights)")
    _add_proc(tr)
    tr.add_argument("--updates", type=int, default=0,
                    help="stop after N updates (0 = until SIGTERM)")
    tr.add_argument("--log-every", type=int, default=1)
    tr.set_defaults(fn=cmd_trainer)

    up = sub.add_parser(
        "up", help="launch tetrikv + 1 trainer + N workers locally")
    _add_common(up)
    up.add_argument("--workers", type=int, default=3)   # compose scale: 3
    up.add_argument("--port", type=int, default=6399)
    up.add_argument("--n-envs", type=int, default=0)
    up.add_argument("--horizon", type=int, default=72)
    up.add_argument("--seed", type=int, default=0)
    up.add_argument("--updates", type=int, default=0)
    up.add_argument("--steps", type=int, default=0)
    up.add_argument("--chaos", type=float, default=0.0,
                    help="after S seconds, kill a worker and demonstrate "
                         "elastic slot reclaim + checksum-validated recovery")
    up.set_defaults(fn=cmd_up)

    b = sub.add_parser("bench", help="environment throughput benchmark")
    b.add_argument("--n-envs", type=int, default=4096)
    b.add_argument("--iters", type=int, default=200)
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    _enable_cache()   # plain namespace; cmd_train re-keys to 'tf' (torch)
    return args.fn(args)


if __name__ == "__main__":
    main()
