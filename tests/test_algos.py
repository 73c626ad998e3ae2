"""Tests for GAE, replay, distributions, and the PPO/DQN updates."""
import numpy as np
import jax
import jax.numpy as jnp

from drl_tetris_tpu.algos.gae import sventon_gae
from drl_tetris_tpu.algos import replay as R
from drl_tetris_tpu.algos import distributions as D


def reference_gae_loop(r, d, vp, vm, gamma, lam, gve):
    """Literal numpy replica of sventon_trajectory.adv_and_targets
    (trajectory.py:111-141) with the actual argument swap, applied to one
    completed trajectory (d[-1] == 1)."""
    n = len(r)
    v_next = np.zeros(n)
    v_next[:-1] = vp[1:]
    td1s = r + gamma * v_next * (1 - d) - vp

    def compute(lam_v):
        est = np.zeros(n)
        A, W = 0.0, 0.0
        for i, td in reversed(list(enumerate(td1s))):
            A *= gamma * lam_v
            W *= lam_v
            A += td
            W += 1
            est[i] = (A + vp[i] - vm[i]) / W
        return est

    adv = compute(lam)
    val_adj = compute(gve)
    return adv, vm + val_adj


def test_gae_matches_reference_loop():
    rng = np.random.RandomState(0)
    T = 23
    r = np.zeros(T); r[-1] = 1.0
    d = np.zeros(T); d[-1] = 1
    vp = rng.randn(T) * 0.3
    vm = rng.randn(T) * 0.3
    gamma, lam, gve = -0.98, 0.7, 0.95
    ref_adv, ref_tgt = reference_gae_loop(r, d, vp, vm, gamma, lam, gve)

    adv, tgt, _ = sventon_gae(
        jnp.asarray(r)[:, None], jnp.asarray(d)[:, None],
        jnp.asarray(vp)[:, None], jnp.asarray(vm)[:, None],
        jnp.zeros((1,)), gamma=gamma, gae_lambda=lam, gve_lambda=gve)
    np.testing.assert_allclose(np.asarray(adv)[:, 0], ref_adv, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt)[:, 0], ref_tgt, rtol=1e-5)


def test_gae_resets_across_done():
    """Two back-to-back trajectories in one segment must produce the same
    estimates as processing them separately."""
    rng = np.random.RandomState(1)
    T1, T2 = 9, 14
    gamma, lam, gve = -0.98, 0.7, 0.95
    segs = []
    for T in (T1, T2):
        r = np.zeros(T); r[-1] = rng.choice([-1.0, 1.0])
        d = np.zeros(T); d[-1] = 1
        vp, vm = rng.randn(T) * 0.2, rng.randn(T) * 0.2
        segs.append((r, d, vp, vm))
    cat = lambda i: np.concatenate([s[i] for s in segs])
    adv, tgt, _ = sventon_gae(
        jnp.asarray(cat(0))[:, None], jnp.asarray(cat(1))[:, None],
        jnp.asarray(cat(2))[:, None], jnp.asarray(cat(3))[:, None],
        jnp.zeros((1,)), gamma=gamma, gae_lambda=lam, gve_lambda=gve)
    ref = [reference_gae_loop(*s, gamma, lam, gve) for s in segs]
    ref_adv = np.concatenate([ra for ra, _ in ref])
    ref_tgt = np.concatenate([rt for _, rt in ref])
    np.testing.assert_allclose(np.asarray(adv)[:, 0], ref_adv, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt)[:, 0], ref_tgt, rtol=1e-5)


def _dummy_segment(T, N, H=22, seed=0):
    from drl_tetris_tpu.algos.rollout import Segment
    rng = np.random.RandomState(seed)
    j = jnp.asarray
    return Segment(
        occ=j(rng.randint(0, 2**10, size=(T, N, 2, H)).astype(np.uint32)),
        vec=j(rng.rand(T, N, 2, 12).astype(np.float32)),
        piece=j(rng.randint(0, 7, (T, N)).astype(np.int32)),
        rot=j(rng.randint(0, 4, (T, N)).astype(np.int32)),
        trans=j(rng.randint(0, 10, (T, N)).astype(np.int32)),
        prob=j(rng.rand(T, N).astype(np.float32)),
        v_piece=j(rng.randn(T, N).astype(np.float32)),
        v_mean=j(rng.randn(T, N).astype(np.float32)),
        reward=j(np.zeros((T, N), np.float32)),
        done=j(rng.rand(T, N) < 0.05),
        player=j(rng.randint(0, 2, (T, N)).astype(np.int32)),
    )


def test_replay_insert_and_windows():
    cfg = R.ReplayConfig(capacity=1000, k_step=3)
    st = R.replay_init(cfg)
    T, N = 20, 4
    seg = _dummy_segment(T, N)
    st = R.replay_add_segment(cfg, st, seg, T)
    assert int(st.size) == T * N
    # env-major layout: replay rows 0..T-1 == env 0's run in time order
    np.testing.assert_array_equal(
        np.asarray(st.reward[:T]), np.asarray(seg.reward[:, 0]))
    # last k_step of each run are unsampleable
    prio = np.asarray(st.prio[: T * N]).reshape(N, T)
    assert (prio[:, -cfg.k_step:] == 0).all()
    assert (prio[:, : -cfg.k_step] == 2).all()
    # windows are consecutive rows
    idx = jnp.asarray([5, T + 2])
    win = R.replay_gather_windows(cfg, st, idx)
    np.testing.assert_array_equal(
        np.asarray(win["reward"][0]), np.asarray(seg.reward[5:9, 0]))
    np.testing.assert_array_equal(
        np.asarray(win["reward"][1]), np.asarray(seg.reward[2:6, 1]))


def test_replay_prioritized_sampling_bias():
    cfg = R.ReplayConfig(capacity=512, k_step=1)
    st = R.replay_init(cfg)
    T, N = 64, 4
    st = R.replay_add_segment(cfg, st, _dummy_segment(T, N), T)
    # crank one index's priority way up
    st = R.replay_update_prios(st, jnp.asarray([10]), jnp.asarray([1000.0]))
    counts = 0
    for s in range(20):
        idx, iw = R.replay_sample(cfg, st, jax.random.PRNGKey(s), 8, 1.0, 1.0)
        counts += int((np.asarray(idx) == 10).sum())
        assert np.all(np.asarray(iw) >= 0) and np.all(np.asarray(iw) <= 1.0 + 1e-6)
        # no-replacement: indices unique
        assert len(set(np.asarray(idx).tolist())) == 8
    assert counts >= 18, f"high-prio index sampled only {counts}/20 times"


def test_distribution_sampling_matches_probs():
    key = jax.random.PRNGKey(0)
    p = np.zeros((1, 2, 3), np.float32)
    p[0, 1, 2] = 0.9
    p[0, 0, 0] = 0.1
    hits = 0
    for i in range(100):
        (r, t), _ = D.action_distribution(jnp.asarray(p), jax.random.fold_in(key, i))
        if int(r[0]) == 1 and int(t[0]) == 2:
            hits += 1
    assert 75 <= hits <= 100


def test_pareto_distribution():
    p = D.pareto(jnp.asarray([1.0, 5.0, 3.0]), 2.0)
    p = np.asarray(p)
    order = np.argsort(-p)
    np.testing.assert_array_equal(order, [1, 2, 0])
    assert abs(p.sum() - 1) < 1e-6


def _ref_linear_reshaping(r, amount, single_policy=True):
    """Numpy replica of /root/reference/agents/agent_utils/
    reward_shapers.py:8-24 over ONE whole trajectory r_0..r_T."""
    r = np.asarray(r, np.float64)
    if len(r) < 3:
        return r
    T = len(r) - 1
    rT = r[-1]
    idxs = np.arange(T + 1)
    signs = np.power(-1.0, idxs + T) if single_policy else 1.0
    coeff = 2 * amount * rT / (T * T - T)
    ret = coeff * idxs * signs
    ret[-1] = (1 - amount) * rT
    ret[:-1] += r[:-1]
    return ret


def test_reward_shaper_matches_reference_replica():
    """Segment form == the reference's whole-trajectory formula, over a
    segment holding multiple variable-length trajectories (incl. one that
    does not finish and a too-short one)."""
    from drl_tetris_tpu.algos.reward_shapers import linear_reshaping
    rng = np.random.RandomState(4)
    lengths = [5, 3, 2, 7]          # len-2 trajectory: unchanged by rule
    rs, ds = [], []
    for L in lengths:
        tr = rng.randn(L).astype(np.float32)
        rs.extend(tr.tolist())
        ds.extend([0.0] * (L - 1) + [1.0])
    # trailing unfinished trajectory: must pass through unchanged
    rs.extend([0.3, -0.2]); ds.extend([0.0, 0.0])
    r = np.asarray(rs, np.float32)[:, None]
    d = np.asarray(ds, np.float32)[:, None]

    for amount, sp in ((0.5, True), (0.3, False)):
        shaped = np.asarray(
            linear_reshaping(amount, single_policy=sp)(
                jnp.asarray(r), jnp.asarray(d)))[:, 0]
        expect = []
        for L in lengths:
            seg = r[len(expect):len(expect) + L, 0]
            expect.extend(_ref_linear_reshaping(seg, amount, sp).tolist())
        expect.extend([0.3, -0.2])
        assert np.allclose(shaped, np.asarray(expect), atol=1e-5), \
            (amount, sp, shaped, expect)


def test_reward_shaper_terminal_split():
    from drl_tetris_tpu.algos.reward_shapers import linear_reshaping
    T = 8
    r = np.zeros((T, 1), np.float32); r[-1] = 1.0
    d = np.zeros((T, 1), np.float32); d[-1] = 1
    shaped = linear_reshaping(0.5)(jnp.asarray(r), jnp.asarray(d))
    s = np.asarray(shaped)
    # terminal keeps (1-amount)*rT; earlier steps get smeared signal
    assert abs(s[-1, 0] - 0.5) < 1e-6
    assert np.any(s[:-1, 0] != 0)


def test_experiment_schedule_patches():
    from drl_tetris_tpu.config.schedule import Experiment, experiment_schedule
    exp = Experiment(name="e", overrides={"gamma": 0.9},
                     patches=({"gamma": 0.8}, {"minibatch_size": 16}))
    cfgs = list(experiment_schedule([exp]))
    assert len(cfgs) == 3           # null patch + 2 cumulative patches
    assert cfgs[0].ppo.gamma == 0.9
    assert cfgs[1].ppo.gamma == 0.8
    assert cfgs[2].ppo.gamma == 0.8          # cumulative
    assert cfgs[2].ppo.minibatch_size == 16
    assert cfgs[0].run_id == "e" and cfgs[2].run_id == "e-patch2"
    only = list(experiment_schedule([exp], only_last=True))
    assert len(only) == 1 and only[0].ppo.minibatch_size == 16


def test_convthendense_shapes():
    from drl_tetris_tpu.models.nets import ConvThenDense, ModelConfig
    net = ConvThenDense(ModelConfig(tower_layers=1, tower_filters=4),
                        conv_filters=(4, 4), vec_hidden=8, vec_out=4,
                        value_hidden=8)
    B, H, W = 2, 22, 10
    vec = [jnp.zeros((B, 12))] * 2
    vis = [jnp.zeros((B, H, W, 1))] * 2
    params = net.init(jax.random.PRNGKey(0), vec, vis)
    V, A = net.apply(params, vec, vis)
    assert V.shape == (B, 1, 1, 7) and A.shape == (B, 4, 10, 7)


def test_augment_batch_mirror_semantics():
    """trajectory.augment_data parity properties: doubled batch, field
    mirror is an involution, t -> W-1-t, piece through the L/J S/Z swap,
    rot/x/y untouched (the reference's faithful quirks)."""
    from drl_tetris_tpu.algos.ppo import Batch, augment_batch
    from drl_tetris_tpu.engine.core import EngineConfig
    cfg = EngineConfig()
    rng = np.random.RandomState(0)
    B, H, W = 6, cfg.height, cfg.width
    occ = jnp.asarray(rng.randint(0, 1 << W, (B, 2, H)), jnp.uint32)
    vec = jnp.asarray(rng.rand(B, 2, 12), jnp.float32)
    batch = Batch(
        occ=occ, vec=vec,
        piece=jnp.asarray(rng.randint(0, 7, (B,)), jnp.int32),
        rot=jnp.asarray(rng.randint(0, 4, (B,)), jnp.int32),
        trans=jnp.asarray(rng.randint(0, W, (B,)), jnp.int32),
        old_prob=jnp.ones((B,)), advantage=jnp.ones((B,)),
        target_v=jnp.zeros((B,)))
    out = augment_batch(cfg, batch)
    assert out.piece.shape[0] == 2 * B
    # first half unchanged
    np.testing.assert_array_equal(np.asarray(out.occ[:B]), np.asarray(occ))
    # mirror of the mirror is the original field
    out2 = augment_batch(cfg, Batch(*[a[B:] for a in out]))
    np.testing.assert_array_equal(np.asarray(out2.occ[B:]), np.asarray(occ))
    # grid mirror: bit x in original == bit W-1-x in mirrored
    g0 = (np.asarray(occ)[..., None] >> np.arange(W)) & 1
    g1 = (np.asarray(out.occ[B:])[..., None] >> np.arange(W)) & 1
    np.testing.assert_array_equal(g1, g0[..., ::-1])
    np.testing.assert_array_equal(np.asarray(out.trans[B:]),
                                  W - 1 - np.asarray(batch.trans))
    swap = np.asarray([1, 0, 3, 2, 4, 5, 6])
    np.testing.assert_array_equal(np.asarray(out.piece[B:]),
                                  swap[np.asarray(batch.piece)])
    np.testing.assert_array_equal(np.asarray(out.rot[B:]),
                                  np.asarray(batch.rot))
    # vec: scalars unchanged, nextpiece one-hot permuted
    np.testing.assert_array_equal(np.asarray(out.vec[B:, :, :5]),
                                  np.asarray(vec[:, :, :5]))
    np.testing.assert_array_equal(np.asarray(out.vec[B:, :, 5:]),
                                  np.asarray(vec[:, :, 5:])[..., swap])
