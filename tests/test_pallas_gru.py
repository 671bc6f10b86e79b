"""ops/pallas_gru: the whole-recurrence GRU scan kernel (interpret mode on
CPU) against the models/layers.py lax.scan implementation — the oracle the
kernel must reproduce (ref model.py GRU semantics per SURVEY.md §2).

Covers: forward scan, reversed+length-masked scan (the padding-invariance
contract of bucketed encoding), bf16 inputs with f32 state, module-level
impl switch (GRU/BiGRU/Encoder/Decoder param-compatibility both ways),
and the Converter's cross-target folded decode under both impls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zerospeech_tts_tpu.config import AudioConfig, Hps
from zerospeech_tts_tpu.models import Decoder, Encoder
from zerospeech_tts_tpu.models.layers import GRU, BiGRU
from zerospeech_tts_tpu.ops.pallas_gru import (
    _pick_t_block,
    pallas_gru_scan,
    pallas_gru_supported,
)


def _scan_oracle(xw, wh, bh, lengths=None, reverse=False):
    """The exact lax.scan recurrence from models/layers.py."""
    b, t, h3 = xw.shape
    h = h3 // 3
    if reverse:
        xw = jnp.flip(xw, axis=1)

    def cell(hprev, xw_t):
        hw = hprev @ wh + bh
        xr, xz, xn = jnp.split(xw_t, 3, -1)
        hr, hz, hn = jnp.split(hw, 3, -1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * hprev

    h0 = jnp.zeros((b, h), xw.dtype)
    if reverse and lengths is not None:
        pos = jnp.arange(t - 1, -1, -1, dtype=jnp.int32)
        valid = pos[:, None] < jnp.asarray(lengths, jnp.int32)[None, :]

        def stepm(hprev, inp):
            xw_t, v = inp
            hnew = jnp.where(v[:, None], cell(hprev, xw_t), hprev)
            return hnew, hnew

        _, ys = jax.lax.scan(stepm, h0, (jnp.swapaxes(xw, 0, 1), valid))
    else:
        _, ys = jax.lax.scan(lambda hp, x: (cell(hp, x),) * 2, h0, jnp.swapaxes(xw, 0, 1))
    ys = jnp.swapaxes(ys, 0, 1)
    return jnp.flip(ys, 1) if reverse else ys


def _rand(b, t, h):
    rng = np.random.default_rng(7)
    xw = rng.standard_normal((b, t, 3 * h)).astype(np.float32)
    wh = (0.3 * rng.standard_normal((h, 3 * h))).astype(np.float32)
    bh = (0.1 * rng.standard_normal(3 * h)).astype(np.float32)
    return xw, wh, bh


def test_forward_matches_scan_f32():
    xw, wh, bh = _rand(8, 48, 128)
    got = pallas_gru_scan(xw, wh, bh, interpret=True)
    want = _scan_oracle(xw, wh, bh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_reverse_masked_matches_scan_f32():
    xw, wh, bh = _rand(8, 48, 128)
    lens = np.array([48, 30, 17, 48, 5, 33, 48, 1], np.int32)
    got = pallas_gru_scan(xw, wh, bh, lens, reverse=True, interpret=True)
    want = _scan_oracle(xw, wh, bh, lens, reverse=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # pad rows pass state through: before each row's tail the output is 0
    got = np.asarray(got)
    for i, L in enumerate(lens):
        assert np.all(got[i, L:] == 0.0), i


def test_reverse_unmasked_matches_scan_f32():
    xw, wh, bh = _rand(16, 32, 128)
    got = pallas_gru_scan(xw, wh, bh, reverse=True, interpret=True)
    want = _scan_oracle(xw, wh, bh, reverse=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_bf16_close_to_f32_oracle():
    xw, wh, bh = _rand(16, 40, 128)
    got = pallas_gru_scan(
        xw.astype(jnp.bfloat16), wh.astype(jnp.bfloat16), bh, interpret=True
    )
    assert got.dtype == jnp.bfloat16
    want = _scan_oracle(xw, wh, bh)
    # bf16 inputs (f32 state/gates): error is dominated by the input
    # rounding recirculating through ~40 steps — the bf16 *scan* is worse
    # (bf16 state too). Bound mean tightly and max loosely.
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want))
    assert err.mean() < 0.02, err.mean()
    assert err.max() < 0.5, err.max()
    # and the kernel's bf16 run tracks a bf16-input scan at least as well
    want_bf = _scan_oracle(
        xw.astype(jnp.bfloat16), wh.astype(jnp.bfloat16), bh.astype(jnp.bfloat16)
    )
    err_bf = np.abs(np.asarray(want_bf, np.float32) - np.asarray(want))
    assert err.mean() <= err_bf.mean() * 1.5 + 1e-3, (err.mean(), err_bf.mean())


def test_t_block_picker():
    assert _pick_t_block(512, 16) == 16
    assert _pick_t_block(48, 16) == 16
    assert _pick_t_block(50, 16) == 10
    assert _pick_t_block(7, 16) == 7
    # slab budget shrinks the block
    assert _pick_t_block(512, 64, row_bytes=1 << 20) <= 4


def test_supported_gate():
    assert pallas_gru_supported(8, 64, 128, jnp.float32)
    assert not pallas_gru_supported(5, 64, 128, jnp.float32)  # batch tile
    assert not pallas_gru_supported(8, 64, 100, jnp.float32)  # lane align
    assert not pallas_gru_supported(8, 64, 128, jnp.int32)  # dtype
    # bf16 needs 16-row batches
    assert not pallas_gru_supported(8, 64, 128, jnp.bfloat16)
    assert pallas_gru_supported(16, 64, 128, jnp.bfloat16)


def test_gru_module_impl_switch_param_compatible():
    """Same params, same (close) outputs through the module-level switch;
    unsupported shapes silently fall back to the scan."""
    x = np.random.default_rng(1).standard_normal((8, 24, 64)).astype(np.float32)
    m_scan = GRU(128, impl="scan")
    m_pal = GRU(128, impl="pallas")
    p = m_scan.init(jax.random.PRNGKey(0), x)
    y1 = m_scan.apply(p, x)
    y2 = m_pal.apply(p, x)  # same param tree works for both impls
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    # batch 3: unsupported -> fallback equals scan exactly
    y3 = m_pal.apply(p, x[:3])
    np.testing.assert_array_equal(np.asarray(y3), np.asarray(m_scan.apply(p, x[:3])))


def test_bigru_masked_impl_switch():
    x = np.random.default_rng(2).standard_normal((8, 24, 64)).astype(np.float32)
    lens = np.array([24, 11, 24, 3, 17, 24, 9, 24], np.int32)
    m_scan = BiGRU(128, impl="scan")
    m_pal = BiGRU(128, impl="pallas")
    p = m_scan.init(jax.random.PRNGKey(0), x)
    y1 = m_scan.apply(p, x, lengths=lens)
    y2 = m_pal.apply(p, x, lengths=lens)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


@pytest.fixture(scope="module")
def tiny():
    hps = Hps(
        seg_len=32, n_feat=129, emb_size=256, spk_emb_size=32, n_speakers=4,
        bank_channels=32, conv_channels=128,
    )
    acfg = AudioConfig(n_fft=256, win_length=256, hop_length=64, n_mels=40, gl_iters=2)
    k = jax.random.PRNGKey(0)
    enc, dec = Encoder(hps), Decoder(hps)
    ep = enc.init(k, np.zeros((1, hps.seg_len, hps.n_feat), np.float32))
    dp = dec.init(
        k, np.zeros((1, hps.n_bins, hps.emb_size), np.float32), np.zeros((1,), np.int32)
    )
    return hps, acfg, ep, dp


def test_encoder_decoder_gru_impl(tiny):
    hps, acfg, ep, dp = tiny
    x = np.random.default_rng(3).uniform(0, 1, (8, 64, hps.n_feat)).astype(np.float32)
    lens = np.array([64, 64, 40, 64, 33, 64, 64, 57], np.int32)
    e1 = Encoder(hps, gru_impl="scan").apply(ep, x, lengths=lens)
    e2 = Encoder(hps, gru_impl="pallas").apply(ep, x, lengths=lens)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=2e-5)
    z = (np.random.default_rng(4).uniform(size=(8, 8, hps.emb_size)) < 0.5).astype(
        np.float32
    )
    spk = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int32)
    d1 = Decoder(hps, gru_impl="scan").apply(dp, z, spk)
    d2 = Decoder(hps, gru_impl="pallas").apply(dp, z, spk)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-5)


def _rand_tame(b, t, h):
    """Like _rand but with a contractive-ish wh (spectral norm ~1.5): the
    BACKWARD recurrence amplifies by ||wh|| per step, so gradient
    comparisons need a realistically-scaled weight (orthogonal init in the
    real model has norm 1), not the adversarial 0.3*N(0,1) at h=128
    (norm ~9) used for the forward tests."""
    rng = np.random.default_rng(11)
    xw = rng.standard_normal((b, t, 3 * h)).astype(np.float32)
    wh = (0.05 * rng.standard_normal((h, 3 * h))).astype(np.float32)
    bh = (0.1 * rng.standard_normal(3 * h)).astype(np.float32)
    return xw, wh, bh


@pytest.mark.parametrize("reverse", [False, True])
def test_grad_matches_scan_oracle(reverse):
    """The custom-VJP backward kernel (training path) against jax.grad of
    the lax.scan oracle — dxw, dwh, dbh all within float tolerance."""
    from zerospeech_tts_tpu.ops.pallas_gru import gru_scan_diff

    xw, wh, bh = _rand_tame(8, 24, 128)
    ct = np.random.default_rng(12).standard_normal((8, 24, 128)).astype(np.float32)

    def loss_p(*a):
        return jnp.sum(gru_scan_diff(reverse, *a) * ct)

    def loss_r(*a):
        return jnp.sum(_scan_oracle(*a, reverse=reverse) * ct)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(xw, wh, bh)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(xw, wh, bh)
    for name, a, b in zip(("dxw", "dwh", "dbh"), gp, gr):
        scale = float(jnp.abs(b).max()) + 1e-9
        err = float(jnp.abs(a - b).max()) / scale
        assert err < 1e-5, (name, err)


def test_grad_masked_forward_rejected():
    """Masked+forward is not a thing the kernel implements — it must fail
    loudly, not silently mis-mask."""
    from zerospeech_tts_tpu.ops.pallas_gru import pallas_gru_scan

    xw, wh, bh = _rand_tame(8, 16, 128)
    with pytest.raises(NotImplementedError):
        pallas_gru_scan(xw, wh, bh, np.full(8, 16, np.int32), reverse=False)


def test_module_param_grads_both_impls():
    """jax.grad through the GRU module: parameter gradients via the Pallas
    custom VJP match the scan impl (the solver trains through this path)."""
    x = np.random.default_rng(5).standard_normal((8, 24, 64)).astype(np.float32)
    m_scan, m_pal = GRU(128, impl="scan"), GRU(128, impl="pallas")
    p = m_scan.init(jax.random.PRNGKey(0), x)

    def loss(m):
        return lambda p: jnp.sum(jnp.square(m.apply(p, x)))

    g1 = jax.grad(loss(m_scan))(p)
    g2 = jax.grad(loss(m_pal))(p)
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1)
    flat2, _ = jax.tree_util.tree_flatten_with_path(g2)
    for (k1, a), (_, b) in zip(flat1, flat2):
        scale = float(jnp.abs(a).max()) + 1e-9
        err = float(jnp.abs(a - b).max()) / scale
        assert err < 1e-4, (jax.tree_util.keystr(k1), err)


def test_kernels_pin_matmul_precision():
    """A global --matmul-precision float32 override must not leak into the
    Pallas kernels: their dots pin Precision.DEFAULT explicitly (Mosaic
    rejects contract_precision<fp32> on bf16 vectors — seen on hardware).
    Semantics check here: same outputs under the global override."""
    from zerospeech_tts_tpu.ops.pallas_gru import gru_scan_diff

    xw, wh, bh = _rand_tame(8, 16, 128)
    base = gru_scan_diff(False, xw, wh, bh)
    with jax.default_matmul_precision("float32"):
        over = gru_scan_diff(False, xw, wh, bh)
        g = jax.grad(lambda *a: jnp.sum(gru_scan_diff(False, *a)))(xw, wh, bh)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(over))
    assert np.all(np.isfinite(np.asarray(g)))


def test_solver_gru_impl_explicit():
    """Solver(gru_impl=...) plumbs through; auto on CPU resolves to scan."""
    from zerospeech_tts_tpu.train import Solver

    hps = Hps(
        seg_len=32, n_feat=129, emb_size=256, spk_emb_size=32, n_speakers=4,
        bank_channels=32, conv_channels=128,
    )
    assert Solver(hps).encoder.gru_impl == "scan"  # cpu auto
    assert Solver(hps, gru_impl="pallas").decoder.gru_impl == "pallas"


def test_converter_gru_impl_units_and_audio(tiny):
    """Full conversion programs under both impls: identical units (the
    challenge artifact — encoder f32 scan vs f32 pallas agree here), audio
    within float tolerance, through the folded cross-target decode."""
    from zerospeech_tts_tpu.convert import Converter

    hps, acfg, ep, dp = tiny
    feats = [
        np.random.default_rng(i).uniform(0, 1, (57 + 13 * i, hps.n_feat)).astype(np.float32)
        for i in range(8)
    ]
    c1 = Converter(hps, acfg, ep, dp, batch_size=8, bucket_frames=32, gl_iters=2,
                   gru_impl="scan")
    c2 = Converter(hps, acfg, ep, dp, batch_size=8, bucket_frames=32, gl_iters=2,
                   gru_impl="pallas")
    u1, w1 = c1.convert_features_multi(feats, [1, 2])
    u2, w2 = c2.convert_features_multi(feats, [1, 2])
    for a, b in zip(u1, u2):
        np.testing.assert_array_equal(a, b)
    for t in range(2):
        for a, b in zip(w1[t], w2[t]):
            ref = a.astype(np.float64)
            err = ref - b.astype(np.float64)
            snr = 10 * np.log10(np.mean(ref**2) / max(np.mean(err**2), 1e-12))
            assert snr > 40.0, snr
