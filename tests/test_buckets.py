"""Adaptive bucket-edge planning for corpus conversion.

The uniform `ceil(t/bucket_frames)` scheme loses frames to padding wherever
the corpus length histogram is uneven (31% on the recorded mixed-length
bench, docs/performance.md). `plan_buckets` places the same number of edges
optimally; these tests pin its optimality (vs brute force), its dominance
over uniform quantization, and the fitted Converter's behavior.
"""

import itertools

import jax
import numpy as np
import pytest

from zerospeech_tts_tpu.convert import Converter, _chunk_rows, plan_buckets


MIN_PAD = Converter._MIN_PAD  # padding-invariance constraint: pad 0 or >= 4


def _quant(t, q):
    """ceil-to-quantum with the min-pad bump (mirrors plan_buckets/_bucket_of)."""
    e = -(-t // q) * q
    while 0 < e - t < MIN_PAD:
        e += q
    return e


def _waste(lengths, edges):
    edges = sorted(edges)
    total = 0
    for t in lengths:
        e = next((e for e in edges if e == t or e - t >= MIN_PAD), None)
        assert e is not None, f"no edge covers {t}"
        total += e - t
    return total


def _brute_force(lengths, k, q):
    cands = sorted({_quant(t, q) for t in lengths})
    best = None
    for r in range(1, min(k, len(cands)) + 1):
        for sub in itertools.combinations(cands, r):
            if sub[-1] != cands[-1]:
                continue  # must cover the longest utterance
            w = _waste(lengths, sub)
            if best is None or w < best:
                best = w
    return best


def test_plan_buckets_matches_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(5):
        lengths = rng.integers(10, 600, size=20).tolist()
        for k in (1, 2, 3):
            edges = plan_buckets(lengths, k, 32)
            assert len(edges) <= k
            assert all(e % 32 == 0 for e in edges)
            assert _waste(lengths, edges) == _brute_force(lengths, k, 32)


def test_plan_buckets_never_worse_than_uniform():
    rng = np.random.default_rng(1)
    lengths = (rng.uniform(1, 8, size=64) * 80).astype(int).tolist()  # ~1-8s at 80 fr/s
    bucket_frames = 256
    uniform_edges = sorted({_quant(t, bucket_frames) for t in lengths})
    # same program budget, edges on the finer 64-frame grid
    edges = plan_buckets(lengths, len(uniform_edges), 64)
    assert _waste(lengths, edges) <= _waste(lengths, uniform_edges)
    # on this spread the win is substantial (uniform wastes ~31% of frames)
    assert _waste(lengths, edges) < 0.75 * _waste(lengths, uniform_edges)


def test_plan_buckets_edge_cases():
    assert plan_buckets([], 3, 64) == []
    assert plan_buckets([100], 3, 64) == [128]
    # k >= number of distinct quantized lengths -> zero-ish waste plan
    edges = plan_buckets([64, 128, 200], 8, 64)
    assert edges == [64, 128, 256]


def test_fitted_converter_converts_and_respects_plan(tiny_hps):
    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.train import Solver

    h = tiny_hps.replace(n_feat=129)
    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    lengths = [24, 40, 48, 72]
    feats = [rng.uniform(0, 1, (t, 129)).astype(np.float32) for t in lengths]

    conv = Converter(h, acfg, state.enc, state.dec, batch_size=2, bucket_frames=8)
    edges = conv.fit_buckets(lengths, 2)
    assert edges == [48, 72]  # optimal 2-edge plan on the 8-frame grid
    assert conv._bucket_of(40) == 48 and conv._bucket_of(72) == 72
    # beyond the fitted plan: uniform fallback keeps out-of-plan inputs working
    assert conv._bucket_of(100) == 104

    units, wavs = conv.convert_features_multi(feats, [0, 1])
    ds, hop = h.downsample, acfg.hop_length
    for t, u in zip(lengths, units):
        assert u.shape == (-(-t // ds), h.emb_size)  # ceil: all latent rows dumped
        assert set(np.unique(u)) <= {0, 1}
    for k in range(2):
        for t, w in zip(lengths, wavs[k]):
            assert w.dtype == np.int16 and len(w) == (t - 1) * hop


def test_fitted_bucket_identical_when_edge_unchanged(tiny_hps):
    """An utterance whose padded shape is the same under the fitted and the
    uniform plan must produce bit-identical units and wavs (the plan only
    changes WHICH bucket a length lands in, never the program for a shape)."""
    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.train import Solver

    h = tiny_hps.replace(n_feat=129)
    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(0))
    feats = [np.random.default_rng(3).uniform(0, 1, (32, 129)).astype(np.float32)]

    c0 = Converter(h, acfg, state.enc, state.dec, batch_size=1, bucket_frames=32)
    u0, w0 = c0.convert_features_multi(feats, [0])
    c1 = Converter(h, acfg, state.enc, state.dec, batch_size=1, bucket_frames=32)
    c1.fit_buckets([32], 4)
    assert c1.bucket_edges == [32]
    u1, w1 = c1.convert_features_multi(feats, [0])
    np.testing.assert_array_equal(u0[0], u1[0])
    np.testing.assert_array_equal(w0[0][0], w1[0][0])


def test_convert_wav_dir_adaptive(tmp_path, tiny_hps):
    """CLI-level path: convert_wav_dir(adaptive_buckets=K) fits post-trim
    lengths and writes the same artifact set as the uniform path."""
    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.convert import convert_wav_dir
    from zerospeech_tts_tpu.dsp.wavio import save_wav
    from zerospeech_tts_tpu.train import Solver

    h = tiny_hps.replace(n_feat=129)
    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    wav_dir = tmp_path / "wavs"
    for i, n in enumerate([1600, 2600, 4000]):
        save_wav(wav_dir / f"u{i}.wav", (rng.uniform(-0.3, 0.3, n) * 32767).astype(np.int16),
                 acfg.sr)

    conv = Converter(h, acfg, state.enc, state.dec, batch_size=2, bucket_frames=8)
    out = convert_wav_dir(conv, wav_dir, tmp_path / "res", {"S0": 0}, sr=acfg.sr,
                          adaptive_buckets=2)
    assert out["n_utterances"] == 3 and out["n_wavs"] == 3
    # the EXECUTED plan is reported in the result (benchmarks record this,
    # not a recomputed estimate) and the fit is scoped to the call — later
    # conversions on this Converter go back to uniform bucketing
    assert out["bucket_edges"] and len(out["bucket_edges"]) <= 2
    assert out["padding_overhead"] >= 0
    assert conv.bucket_edges is None
    for i in range(3):
        assert (tmp_path / "res" / "units" / f"u{i}.txt").exists()
        assert (tmp_path / "res" / "S0" / f"u{i}.wav").exists()


def test_plan_buckets_rejects_nonpositive_k():
    with pytest.raises(ValueError, match="adaptive bucket count"):
        plan_buckets([100, 200], 0, 64)
    with pytest.raises(ValueError, match="adaptive bucket count"):
        plan_buckets([100, 200], -1, 64)


def test_plan_buckets_target_overhead_smallest_k():
    """target_overhead picks the SMALLEST edge count meeting the padding
    budget: every k below it misses the target, the returned plan meets it."""
    rng = np.random.default_rng(5)
    lengths = (rng.uniform(1, 8, size=64) * 80).astype(int).tolist()
    total = sum(lengths)
    target = 0.10
    edges = plan_buckets(lengths, 16, 32, target_overhead=target)
    assert _waste(lengths, edges) / total <= target
    for k in range(1, len(edges)):
        assert _waste(lengths, plan_buckets(lengths, k, 32)) / total > target


def test_plan_buckets_target_overhead_unreachable_best_effort():
    """An impossible target degrades to the best plan within max_buckets
    (never an error, never a worse plan than the unconstrained optimum)."""
    lengths = [100, 300, 500]
    best = plan_buckets(lengths, 2, 64)
    got = plan_buckets(lengths, 2, 64, target_overhead=0.0)
    assert _waste(lengths, got) == _waste(lengths, best)


def _executed_cost(lengths, edges, cap_fn, dispatch_cost=0.0):
    """True executed overhead of a plan under smallest-covering-edge
    assignment and Converter._chunk_batch chunking (no mesh): executed
    rows*frames minus true frames, plus dispatch_cost per dispatch."""
    edges = sorted(edges)
    groups: dict[int, list[int]] = {}
    for t in lengths:
        e = next(e for e in edges if e == t or e - t >= MIN_PAD)
        groups.setdefault(e, []).append(t)
    cost = 0.0
    for e, ts in groups.items():
        rows, nd = _chunk_rows(len(ts), cap_fn(e))
        cost += rows * e - sum(ts) + dispatch_cost * nd
    return cost


def test_chunk_rows_mirrors_chunk_batch(tiny_hps):
    """_chunk_rows (the planner's chunking model) must agree with the rows
    the Converter actually dispatches: full cap-row chunks + pow2 tail."""
    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.train import Solver

    h = tiny_hps.replace(n_feat=129)
    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)
    state = Solver(h).init_state(jax.random.PRNGKey(0))
    conv = Converter(h, acfg, state.enc, state.dec, batch_size=3)
    for cap in (1, 3, 4, 8, 32):
        for k in (1, 2, 3, 5, 7, 8, 9, 31, 64, 100):
            rows, nd = _chunk_rows(k, cap)
            idxs = list(range(k))
            got_rows, got_nd = 0, 0
            for c0 in range(0, k, cap):  # the convert loop's literal chunking
                ch = idxs[c0 : c0 + cap]
                got_rows += conv._chunk_batch(len(ch), cap)
                got_nd += 1
            assert (rows, nd) == (got_rows, got_nd), (cap, k)


def test_plan_buckets_executed_never_worse():
    """The executed-cost DP must never realize a higher true executed cost
    than the frames-optimal plan does (the motivating failure: 7.7% frame
    padding, 24% executed overhead from pow2 tails across thin buckets)."""
    def cap_fn(tb, budget=8 * 1024):
        cap = 1
        while cap * 2 * tb <= budget and cap * 2 <= 128:
            cap *= 2
        return max(cap, 8)  # mirrors Converter._bucket_cap(batch_size=8)

    rng = np.random.default_rng(7)
    for trial in range(4):
        lengths = (rng.uniform(1, 8, size=48) * 80).astype(int).tolist()
        for dc in (0.0, 512.0):
            for k in (2, 4, 8, 12):
                e_frames = plan_buckets(lengths, k, 64)
                e_exec = plan_buckets(lengths, k, 64, cap_fn=cap_fn, dispatch_cost=dc)
                assert _executed_cost(lengths, e_exec, cap_fn, dc) <= \
                    _executed_cost(lengths, e_frames, cap_fn, dc) + 1e-9


def test_plan_buckets_executed_matches_brute_force():
    """Exactness of the executed-cost DP vs exhaustive edge-subset search
    (candidates = quantized group values; larger edges only add frames)."""
    cap_fn = lambda tb: 4
    rng = np.random.default_rng(8)
    for trial in range(3):
        lengths = rng.integers(10, 400, size=14).tolist()
        cands = sorted({_quant(t, 32) for t in lengths})
        for k in (1, 2, 3):
            got = plan_buckets(lengths, k, 32, cap_fn=cap_fn, dispatch_cost=100.0)
            best = min(
                _executed_cost(lengths, sub, cap_fn, 100.0)
                for r in range(1, min(k, len(cands)) + 1)
                for sub in itertools.combinations(cands, r)
                if sub[-1] == cands[-1]
            )
            assert _executed_cost(lengths, got, cap_fn, 100.0) == pytest.approx(best)


def test_plan_buckets_executed_prefers_fewer_thin_buckets():
    """With a per-dispatch cost, the executed model consolidates lengths
    that the frames model would split into many tail-rounded buckets."""
    # 12 groups of 1 utterance each: frames mode spends all 12 edges
    lengths = [64 * i for i in range(1, 13)]
    e_frames = plan_buckets(lengths, 12, 64)
    assert len(e_frames) == 12
    e_exec = plan_buckets(lengths, 12, 64, cap_fn=lambda tb: 8,
                          dispatch_cost=4096.0)
    assert len(e_exec) < 12  # dispatch cost makes 12 singleton dispatches lose


def test_fit_buckets_executed_cost_model(tiny_hps):
    """Converter.fit_buckets(cost_model='executed') plans against the
    Converter's OWN _bucket_cap chunking and never realizes more executed
    rows*frames than the frames plan; bad cost_model is rejected."""
    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.train import Solver

    h = tiny_hps.replace(n_feat=129)
    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)
    state = Solver(h).init_state(jax.random.PRNGKey(0))
    conv = Converter(h, acfg, state.enc, state.dec, batch_size=2,
                     bucket_frames=8, frame_budget=2 * 64)
    rng = np.random.default_rng(9)
    lengths = (rng.uniform(8, 120, size=40)).astype(int).tolist()
    ef = list(conv.fit_buckets(lengths, 6, cost_model="frames"))
    ee = list(conv.fit_buckets(lengths, 6, cost_model="executed"))
    assert _executed_cost(lengths, ee, conv._bucket_cap) <= \
        _executed_cost(lengths, ef, conv._bucket_cap) + 1e-9
    with pytest.raises(ValueError, match="cost_model"):
        conv.fit_buckets(lengths, 6, cost_model="rows")


def test_bucket_cap_frame_budget(tiny_hps):
    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.train import Solver

    h = tiny_hps.replace(n_feat=129)
    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(0))
    conv = Converter(h, acfg, state.enc, state.dec, batch_size=8,
                     frame_budget=8 * 1024)
    # short buckets take more rows (pow2 within rows*frames <= budget) ...
    assert conv._bucket_of(128) == 128 and conv._bucket_cap(128) == 64
    assert conv._bucket_cap(256) == 32
    # ... long buckets never drop below the flat batch_size
    assert conv._bucket_cap(2048) == 8
    # 128-row ceiling
    conv128 = Converter(h, acfg, state.enc, state.dec, batch_size=8,
                        frame_budget=1 << 20)
    assert conv128._bucket_cap(64) == 128
    # no budget -> flat cap
    conv_flat = Converter(h, acfg, state.enc, state.dec, batch_size=8)
    assert conv_flat._bucket_cap(64) == 8


def test_frame_budget_units_unchanged(tiny_hps):
    """frame_budget regroups dispatches; the per-utterance units must be
    identical to the flat-batch path (hard bits are grouping-invariant)."""
    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.train import Solver

    h = tiny_hps.replace(n_feat=129)
    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    lengths = [16, 16, 24, 24, 24, 32, 64]
    feats = [rng.uniform(0, 1, (t, 129)).astype(np.float32) for t in lengths]

    c_flat = Converter(h, acfg, state.enc, state.dec, batch_size=2, bucket_frames=8)
    u_flat, w_flat = c_flat.convert_features_multi(feats, [0])
    c_bud = Converter(h, acfg, state.enc, state.dec, batch_size=2, bucket_frames=8,
                      frame_budget=2 * 64)
    assert c_bud._bucket_cap(16) == 8  # the short bucket really regroups
    u_bud, w_bud = c_bud.convert_features_multi(feats, [0])
    for a, b in zip(u_flat, u_bud):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(w_flat[0], w_bud[0]):
        assert a.shape == b.shape


def test_round_rows_shape_set_and_waste_bound():
    """_round_rows picks the smallest allowed shape (pow2 plus 3*2^i) >= k:
    monotone, capped, and the round-up waste is bounded at 1/3 of the
    chunk (the pure-pow2 scheme it replaced wasted up to ~1x: 9 -> 16)."""
    from zerospeech_tts_tpu.convert import _round_rows

    allowed = sorted(
        {2**i for i in range(9)} | {3 * 2**i for i in range(8)}
    )
    for cap in (1, 3, 4, 8, 24, 32, 128):
        prev = 0
        for k in range(1, 140):
            bs = _round_rows(k, cap)
            assert bs >= min(k, cap)
            assert bs <= cap
            assert bs >= prev or k > cap  # monotone until the cap clamps
            prev = bs
            if k <= cap:
                assert bs in allowed, (k, cap, bs)
                assert bs == min(s for s in allowed if s >= k and s <= cap) or bs == cap
                assert bs - k <= max((k - 1) // 2, 0) or bs == k, (k, bs)
