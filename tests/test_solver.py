"""Solver integration tests: each phase runs jitted, losses decrease on a
learnable toy problem, GAN steps produce finite updates, checkpoints
round-trip (SURVEY.md §4 rebuild test pyramid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zerospeech_tts_tpu.train import CheckpointManager, Solver


@pytest.fixture(scope="module")
def solver(request):
    tiny = request.getfixturevalue("tiny_hps")
    return Solver(tiny.replace(lr=2e-3, lat_sched_iters=10))


@pytest.fixture(scope="module")
def _state_master(solver):
    return solver.init_state(jax.random.PRNGKey(0))


@pytest.fixture()
def state0(_state_master):
    # step fns donate their input state; give each test a fresh copy
    return jax.tree.map(jnp.copy, _state_master)


def _batch(h, seed=0, stage2=False):
    rng = np.random.default_rng(seed)
    spk = rng.integers(0, h.n_speakers, h.batch_size)
    # speaker-dependent deterministic patterns -> classifier CAN learn,
    # reconstruction CAN fit
    t = np.arange(h.seg_len)[None, :, None] / h.seg_len
    f = np.arange(h.n_feat)[None, None, :] / h.n_feat
    x = 0.5 + 0.4 * np.sin(2 * np.pi * (spk[:, None, None] + 1) * f + 4 * np.pi * t)
    x = (x + 0.01 * rng.standard_normal(x.shape)).astype(np.float32)
    b = {"x": jnp.asarray(x), "spk": jnp.asarray(spk, dtype=jnp.int32)}
    if stage2:
        b["x_real"] = b["x"]
        b["spk_real"] = b["spk"]
    return b


def test_pretrain_ae_loss_decreases(solver, state0):
    h = solver.hps
    state = state0
    losses = []
    for i in range(12):
        state, m = solver.step_pretrain_ae(state, _batch(h, i % 3))
        losses.append(float(m["loss_rec"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_pretrain_clf_learns(solver):
    # continuous latents + no dropout + fixed batch: the classifier must be
    # able to memorize speaker labels, so CE must fall
    s = Solver(solver.hps.replace(lr=2e-3, enc_mode="continues", dis_dp=0.0))
    state = s.init_state(jax.random.PRNGKey(0))
    batch = _batch(s.hps, 0)
    losses = []
    for _ in range(20):
        state, m = s.step_pretrain_clf(state, batch)
        losses.append(float(m["loss_clf"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_stage1_train_step(solver, state0):
    h = solver.hps
    state, m = solver.step_train(state0, _batch(h))
    for k in ("loss_rec", "loss_clf", "loss_adv", "acc_clf", "alpha"):
        assert np.isfinite(float(m[k])), (k, m)
    assert int(state.step) == 1
    # alpha annealing: small at step 0
    assert float(m["alpha"]) <= solver.hps.alpha_enc


def test_alpha_annealing(solver):
    """alpha ramps over lat_sched_iters relative to the RECORDED start of
    the 'train' phase (TrainState.train_start), independent of how long
    the pretrain phases actually ran."""
    h = solver.hps
    start = 777  # arbitrary recorded phase start
    ts = jnp.asarray(start, jnp.int32)
    assert float(solver._alpha(jnp.asarray(start, jnp.int32), ts)) == 0.0
    mid = start + h.lat_sched_iters // 2
    a = float(solver._alpha(jnp.asarray(mid, jnp.int32), ts))
    assert 0 < a < h.alpha_enc
    full = start + h.lat_sched_iters + 10
    assert float(solver._alpha(jnp.asarray(full, jnp.int32), ts)) == pytest.approx(h.alpha_enc)
    # unstamped (-1) behaves as anchor 0
    assert float(
        solver._alpha(jnp.asarray(h.lat_sched_iters, jnp.int32), jnp.asarray(-1, jnp.int32))
    ) == pytest.approx(h.alpha_enc)


def test_stage2_patchgan_steps(solver, state0):
    h = solver.hps
    state = state0
    state, md = solver.step_patch_d(state, _batch(h, stage2=True))
    state, mg = solver.step_patch_g(state, _batch(h, stage2=True))
    for k in ("loss_d", "w_dist", "grad_penalty"):
        assert np.isfinite(float(md[k])), (k, md)
    for k in ("loss_g", "loss_g_adv", "loss_g_cls"):
        assert np.isfinite(float(mg[k])), (k, mg)
    assert float(md["grad_penalty"]) >= 0


def test_gan_updates_change_params(solver, state0):
    h = solver.hps
    before = jax.tree.leaves(state0.dis)[0].copy()
    state, _ = solver.step_patch_d(state0, _batch(h, stage2=True))
    after = jax.tree.leaves(state.dis)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_train_loop_orchestration(solver):
    h = solver.hps
    state = solver.init_state(jax.random.PRNGKey(1))

    def it():
        i = 0
        while True:
            yield _batch(h, i, stage2=True)
            i += 1

    state = solver.train(state, it(), "pretrain_AE", iters=2)
    state = solver.train(state, it(), "train", iters=2)
    assert int(state.step) == 4
    state = solver.train(state, it(), "patchGAN", iters=1)
    assert int(state.step) == 4 + h.n_critic + 1


def test_checkpoint_roundtrip(solver, tmp_path):
    state = solver.init_state(jax.random.PRNGKey(2))
    state, _ = solver.step_pretrain_ae(state, _batch(solver.hps))
    ckpt = CheckpointManager(tmp_path / "ckpt")
    ckpt.save(state, wait=True)
    assert ckpt.latest_step() == 1
    template = solver.init_state(jax.random.PRNGKey(3))
    restored = ckpt.restore(template)
    ckpt.close()
    assert int(restored.step) == 1
    a = jax.tree.leaves(state.enc)
    b = jax.tree.leaves(restored.enc)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_many_device_data(tmp_path, tiny_hps):
    """Device-resident dataset + multi-step dispatch: K steps in one jit
    produce the same step-count and finite, decreasing losses."""
    import h5py
    import json as _json

    from zerospeech_tts_tpu.data.device_dataset import DeviceDataset

    h = tiny_hps.replace(lr=2e-3, batch_size=4, seg_len=16)
    # build a tiny h5 corpus directly
    p = tmp_path / "ds.h5"
    rng = np.random.default_rng(0)
    with h5py.File(p, "w") as f:
        for si, spk in enumerate(["A1", "A2", "V001"]):
            for u in range(2):
                t = 40 + 8 * u
                x = rng.uniform(0, 1, (t, h.n_feat)).astype(np.float32)
                f.create_dataset(f"train/{spk}/{spk}_{u}/lin", data=x)
                f.create_dataset(f"train/{spk}/{spk}_{u}/mel", data=x[:, :20])
        f.attrs["speakers"] = _json.dumps({"A1": 0, "A2": 1, "V001": 2})

    ds = DeviceDataset.from_h5(p, h, feat="lin", target_speakers=["V001"])
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(0))
    state, m = sol.train_many(state, ds, "pretrain_AE", 5)
    assert int(state.step) == 5
    assert np.isfinite(float(m["loss_rec"]))
    state, m2 = sol.train_many(state, ds, "train", 3)
    assert int(state.step) == 8
    for k in ("loss_rec", "loss_clf", "loss_adv"):
        assert np.isfinite(float(m2[k]))
    # one GAN cycle = n_critic + 1 steps
    state, m3 = sol.train_many(state, ds, "patchGAN", 2)
    assert int(state.step) == 8 + 2 * (h.n_critic + 1)
    assert np.isfinite(float(m3["loss_d"])) and np.isfinite(float(m3["loss_g"]))

    # metrics_reduce="mean" (round 5): at k=1 the chunk mean IS the last
    # step, exactly — the same state must produce identical metrics under
    # both reductions (deep-copied: train_many donates its input)
    st_a = jax.tree.map(jnp.copy, state)
    st_b = jax.tree.map(jnp.copy, state)
    _, m_last = sol.train_many(st_a, ds, "train", 1)
    _, m_mean = sol.train_many(st_b, ds, "train", 1, None, True, "mean")
    for k in m_last:
        assert float(m_last[k]) == pytest.approx(float(m_mean[k]), rel=1e-6), k
    # and over a multi-step chunk the mean stays finite for every metric
    st_c = jax.tree.map(jnp.copy, state)
    _, m_mean3 = sol.train_many(st_c, ds, "patchGAN", 3, None, True, "mean")
    assert all(np.isfinite(float(v)) for v in m_mean3.values())


def test_train_device_loop(tmp_path, tiny_hps):
    import h5py
    import json as _json

    from zerospeech_tts_tpu.data.device_dataset import DeviceDataset
    from zerospeech_tts_tpu.train import Logger

    h = tiny_hps.replace(batch_size=2, seg_len=16, log_interval=2, save_interval=100)
    p = tmp_path / "ds.h5"
    rng = np.random.default_rng(0)
    with h5py.File(p, "w") as f:
        for spk in ["A1", "A2"]:
            x = rng.uniform(0, 1, (50, h.n_feat)).astype(np.float32)
            f.create_dataset(f"train/{spk}/{spk}_0/lin", data=x)
        f.attrs["speakers"] = _json.dumps({"A1": 0, "A2": 1})
    ds = DeviceDataset.from_h5(p, h, feat="lin")
    sol = Solver(h)
    logs = []
    logger = Logger(echo=None)
    logger.log = lambda step, m, prefix="": logs.append((step, prefix))
    state = sol.train_device(sol.init_state(jax.random.PRNGKey(0)), ds, "pretrain_AE", 5, logger=logger)
    assert int(state.step) == 5
    assert logs and logs[-1][0] == 5


def test_stage2_rec_anchor(solver, state0):
    """beta_rec adds a same-speaker reconstruction anchor to the G loss."""
    s = Solver(solver.hps.replace(beta_rec=5.0))
    state = jax.tree.map(jnp.copy, state0)
    state, m = s.step_patch_g(state, _batch(s.hps, stage2=True))
    assert np.isfinite(float(m["loss_g"]))
    # the anchored loss differs from the unanchored one on the same state
    s0 = Solver(solver.hps)
    state2, m0 = s0.step_patch_g(jax.tree.map(jnp.copy, state0), _batch(s0.hps, stage2=True))
    assert float(m["loss_g"]) != float(m0["loss_g"])


def test_pair_consistency_alignment(solver):
    """Latent sequences offset by pair_dt must align exactly on the overlap
    (zero loss for a shifted copy — the N(0,1) test latents clear the
    anti-collapse separation hinge), positive for unrelated content."""
    h = solver.hps
    rng = np.random.default_rng(0)
    n, e, ds = 8, 16, h.downsample
    base = rng.standard_normal((1, n + 4, e)).astype(np.float32)
    z = jnp.asarray(base[:, :n])
    z2 = jnp.asarray(base[:, 2 : 2 + n])  # pair window starts 2 latent frames later
    dt = jnp.asarray([2 * ds], jnp.int32)
    assert float(solver._pair_consistency(z, z2, dt)) == pytest.approx(0.0, abs=1e-6)
    # negative offset
    assert float(
        solver._pair_consistency(z2, z, jnp.asarray([-2 * ds], jnp.int32))
    ) == pytest.approx(0.0, abs=1e-6)
    # unrelated content -> positive
    z2bad = jnp.asarray(rng.standard_normal((1, n, e)).astype(np.float32))
    assert float(solver._pair_consistency(z, z2bad, dt)) > 0.01
    # zero overlap (|dt| == seg_len) contributes nothing, stays finite
    far = jnp.asarray([n * ds], jnp.int32)
    assert float(solver._pair_consistency(z, z2bad, far)) == pytest.approx(0.0, abs=1e-6)


def test_pair_objective_changes_loss(solver, _state_master):
    """The x2 term is consumed by stage-1 steps: loss_pair is reported,
    scores an unrelated pair higher than an identical pair, and vanishes
    when lambda_pair=0 or the fields are absent."""
    h = solver.hps
    b = _batch(h)
    b_same = dict(b, x2=b["x"], pair_dt=jnp.zeros((h.batch_size,), jnp.int32))
    b_rand = dict(
        b_same,
        x2=jnp.asarray(
            np.random.default_rng(9).standard_normal(np.asarray(b["x"]).shape), jnp.float32
        ),
    )

    fresh = lambda: jax.tree.map(jnp.copy, _state_master)  # noqa: E731
    _, m_same = solver.step_pretrain_ae(fresh(), dict(b_same))
    assert np.isfinite(float(m_same["loss_pair"]))

    # identical pair < unrelated pair needs deterministic latents (binary
    # ST-Gumbel at random init flips ~half the bits regardless of input):
    # continues mode + no dropout makes z a pure function of x
    s_det = Solver(h.replace(enc_mode="continues", enc_dp=0.0))
    det0 = s_det.init_state(jax.random.PRNGKey(0))
    _, m_det_same = s_det.step_pretrain_ae(jax.tree.map(jnp.copy, det0), dict(b_same))
    _, m_det_rand = s_det.step_pretrain_ae(jax.tree.map(jnp.copy, det0), dict(b_rand))
    # identical pair has zero ALIGNMENT cost; the shared separation hinge
    # cancels in the comparison, so unrelated content must score higher
    assert float(m_det_rand["loss_pair"]) > float(m_det_same["loss_pair"]) + 0.01

    _, m_tr = solver.step_train(fresh(), dict(b_same))
    assert "loss_pair" in m_tr and np.isfinite(float(m_tr["loss_pair"]))

    # no pair fields -> no pair metric (and a distinct, pair-free trace)
    _, m_plain = solver.step_pretrain_ae(fresh(), dict(b))
    assert "loss_pair" not in m_plain

    # lambda_pair=0 disables the term even with the fields present
    s0 = Solver(h.replace(lambda_pair=0.0))
    _, m_off = s0.step_pretrain_ae(s0.init_state(jax.random.PRNGKey(0)), dict(b_same))
    assert "loss_pair" not in m_off


def test_pair_objective_moves_encoder(solver, _state_master):
    """Gradients actually flow from the pair term into the encoder: one
    step on identical batches with/without the term yields different
    encoder params."""
    h = solver.hps
    b = _batch(h, seed=4)
    b_pair = dict(
        b,
        x2=jnp.asarray(np.random.default_rng(5).standard_normal(np.asarray(b["x"]).shape), jnp.float32),
        pair_dt=jnp.zeros((h.batch_size,), jnp.int32),
    )
    s_off = Solver(h.replace(lambda_pair=0.0))
    st_a, _ = solver.step_pretrain_ae(jax.tree.map(jnp.copy, _state_master), dict(b_pair))
    st_b, _ = s_off.step_pretrain_ae(jax.tree.map(jnp.copy, _state_master), dict(b_pair))
    la, lb = jax.tree.leaves(st_a.enc), jax.tree.leaves(st_b.enc)
    assert any(not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def test_device_dataset_emits_pairs(tmp_path, tiny_hps):
    """sample_batch carries x2 + pair_dt: offsets on the downsample grid,
    |dt| <= seg_len, and x2 really is the same utterance shifted by dt
    (frame-index features make the shift directly observable)."""
    import h5py
    import json as _json

    from zerospeech_tts_tpu.data.device_dataset import DeviceDataset

    h = tiny_hps.replace(batch_size=16, seg_len=16)
    p = tmp_path / "ds.h5"
    with h5py.File(p, "w") as f:
        t = 120
        arr = np.tile(np.arange(t, dtype=np.float32)[:, None], (1, h.n_feat))
        f.create_dataset("train/A1/A1_0/lin", data=arr)
        f.attrs["speakers"] = _json.dumps({"A1": 0})
    ds = DeviceDataset.from_h5(p, h, feat="lin", stats=False)
    b = ds.sample_batch(jax.random.PRNGKey(3))
    x, x2 = np.asarray(b["x"]), np.asarray(b["x2"])
    dt = np.asarray(b["pair_dt"])
    assert (dt % h.downsample == 0).all()
    assert (np.abs(dt) <= h.seg_len).all()
    assert (dt != 0).any()  # offsets actually vary
    np.testing.assert_allclose(x2[:, 0, 0] - x[:, 0, 0], dt)


def test_restore_refuses_wrong_architecture(solver, tmp_path):
    """A checkpoint from a different architecture must NOT restore into
    template (random-init) fields — strict by default, and the migration
    path still checks shapes (VERDICT r1 weak #6)."""
    state = solver.init_state(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(tmp_path / "ck")
    ckpt.save(state, wait=True)
    ckpt.close()

    big = Solver(solver.hps.replace(emb_size=64))
    tmpl = big.init_state(jax.random.PRNGKey(0))
    strict = CheckpointManager(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="does not match|refusing"):
        strict.restore(tmpl)
    strict.close()
    migr = CheckpointManager(tmp_path / "ck", allow_migration=True)
    with pytest.raises(RuntimeError, match="refusing to migrate|does not match"):
        migr.restore(tmpl)
    migr.close()


def test_restore_schema_migration_opt_in(solver, tmp_path):
    """A checkpoint missing a newer TrainState field refuses to load by
    default and back-fills ONLY that field under allow_migration=True."""
    import dataclasses

    import orbax.checkpoint as ocp

    state = solver.init_state(jax.random.PRNGKey(0))
    state, _ = solver.step_pretrain_ae(state, _batch(solver.hps))
    old = {
        f.name: getattr(state, f.name)
        for f in dataclasses.fields(state)
        if f.name != "train_start"  # simulate a pre-train_start checkpoint
    }
    m = CheckpointManager(tmp_path / "ck")
    m.mgr.save(1, args=ocp.args.StandardSave(old))
    m.mgr.wait_until_finished()
    m.close()

    tmpl = solver.init_state(jax.random.PRNGKey(9))
    strict = CheckpointManager(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="allow-schema-migration"):
        strict.restore(tmpl)
    strict.close()

    migr = CheckpointManager(tmp_path / "ck", allow_migration=True)
    restored = migr.restore(tmpl)
    migr.close()
    assert int(restored.step) == 1
    assert int(restored.train_start) == int(tmpl.train_start)  # back-filled
    for a, b in zip(jax.tree.leaves(state.enc), jax.tree.leaves(restored.enc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ckpt_dir_refuses_critical_hps_mismatch(solver, tmp_path):
    """Re-opening a checkpoint dir with different data-space hps raises
    instead of warning (VERDICT r1 weak #6)."""
    m = CheckpointManager(tmp_path / "ck", hps=solver.hps)
    m.close()
    with pytest.raises(ValueError, match="data-space hps"):
        CheckpointManager(tmp_path / "ck", hps=solver.hps.replace(n_feat=777))
    # same hps re-opens fine
    m2 = CheckpointManager(tmp_path / "ck", hps=solver.hps)
    m2.close()


def test_restore_unknown_step_lists_available(solver, tmp_path):
    state = solver.init_state(jax.random.PRNGKey(0))
    m = CheckpointManager(tmp_path / "ck")
    m.save(state, wait=True)
    with pytest.raises(FileNotFoundError, match="available"):
        m.restore(state, step=42)
    m.close()


def test_pair_collapse_penalized(solver):
    """Temporally constant latents (the trivial optimum of pure overlap
    consistency) must cost at least the separation margin — the failure
    mode observed in the round-2 convergence rerun."""
    z_const = jnp.ones((2, 8, 16), jnp.float32)
    dt = jnp.zeros((2,), jnp.int32)
    val = float(solver._pair_consistency(z_const, z_const, dt))
    assert val >= solver.PAIR_SEP_MARGIN - 1e-6


def test_unit_stability_metric(tmp_path, tiny_hps):
    """unit_stability: runs on an h5 corpus, returns a [0,1] agreement
    with the expected shift bookkeeping."""
    import h5py
    import json as _json

    from zerospeech_tts_tpu import eval as ev

    h = tiny_hps.replace(seg_len=16)
    p = tmp_path / "ds.h5"
    rng = np.random.default_rng(0)
    with h5py.File(p, "w") as f:
        for spk in ["A1", "A2"]:
            x = rng.uniform(0, 1, (200, h.n_feat)).astype(np.float32)
            f.create_dataset(f"train/{spk}/{spk}_0/lin", data=x)
        f.attrs["speakers"] = _json.dumps({"A1": 0, "A2": 1})
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(0))
    rep = ev.unit_stability(sol, state, p, h, split="train", n_utts=2)
    assert 0.0 <= rep["unit_stability"] <= 1.0
    assert rep["n_utterances"] == 2 and rep["shift_frames"] == h.downsample


def test_train_many_pairs_flag(tmp_path, tiny_hps):
    """pairs=False on the device path must actually disable the pair
    objective (the --no-pairs CLI contract)."""
    import h5py
    import json as _json

    from zerospeech_tts_tpu.data.device_dataset import DeviceDataset

    h = tiny_hps.replace(batch_size=2, seg_len=16)
    p = tmp_path / "ds.h5"
    rng = np.random.default_rng(0)
    with h5py.File(p, "w") as f:
        for spk in ["A1", "A2"]:
            f.create_dataset(
                f"train/{spk}/{spk}_0/lin",
                data=rng.uniform(0, 1, (50, h.n_feat)).astype(np.float32),
            )
        f.attrs["speakers"] = _json.dumps({"A1": 0, "A2": 1})
    ds = DeviceDataset.from_h5(p, h, feat="lin")
    sol = Solver(h)
    _, m_on = sol.train_many(sol.init_state(jax.random.PRNGKey(0)), ds, "pretrain_AE", 2)
    _, m_off = sol.train_many(
        sol.init_state(jax.random.PRNGKey(0)), ds, "pretrain_AE", 2, None, False
    )
    assert "loss_pair" in m_on and "loss_pair" not in m_off


def test_ckpt_save_overwrites_existing_step(solver, tmp_path):
    """Rewinding with --load_model STEP re-reaches old step numbers; save
    must overwrite instead of crashing with StepAlreadyExists."""
    s1 = solver.init_state(jax.random.PRNGKey(1))
    s1, _ = solver.step_pretrain_ae(s1, _batch(solver.hps))  # step 1
    m = CheckpointManager(tmp_path / "ck")
    m.save(s1, wait=True)
    s1b = solver.init_state(jax.random.PRNGKey(2))
    s1b, _ = solver.step_pretrain_ae(s1b, _batch(solver.hps, seed=3))  # step 1 again
    m.save(s1b, wait=True)  # must not raise
    restored = m.restore(solver.init_state(jax.random.PRNGKey(0)))
    m.close()
    for a, b in zip(jax.tree.leaves(s1b.enc), jax.tree.leaves(restored.enc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ckpt_read_only_source(solver, tmp_path):
    """A read-only manager must not create directories or stamp hps.json
    into a foreign checkpoint dir (pure-load semantics)."""
    with pytest.raises(FileNotFoundError):
        CheckpointManager(tmp_path / "nope", read_only=True)
    assert not (tmp_path / "nope").exists()

    src = tmp_path / "src"
    w = CheckpointManager(src)  # no hps stamped
    state = solver.init_state(jax.random.PRNGKey(0))
    w.save(state, wait=True)
    w.close()
    (src / "hps.json").unlink(missing_ok=True)
    r = CheckpointManager(src, hps=solver.hps, read_only=True)
    restored = r.restore(solver.init_state(jax.random.PRNGKey(9)))
    r.close()
    assert int(restored.step) == 0
    assert not (src / "hps.json").exists()  # check-only, never written
