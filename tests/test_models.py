"""Model-library tests: shapes/dtypes, MBV straight-through gradients,
speaker-conditioning sensitivity (SURVEY.md §4 rebuild test pyramid)."""

import jax
import jax.numpy as jnp
import numpy as np

from zerospeech_tts_tpu.models import (
    Decoder,
    Encoder,
    PatchDiscriminator,
    SpeakerClassifier,
    discretize,
    gumbel_softmax,
    hard_units,
    straight_through,
)


def _enc_dec(tiny_hps, rng_seed=0):
    h = tiny_hps
    k = jax.random.PRNGKey(rng_seed)
    x = jax.random.normal(k, (2, h.seg_len, h.n_feat))
    enc = Encoder(h)
    ep = enc.init(k, x)
    logits = enc.apply(ep, x)
    return h, k, x, enc, ep, logits


# ------------------------------------------------------------------ encoder


def test_encoder_shapes(tiny_hps):
    h, k, x, enc, ep, logits = _enc_dec(tiny_hps)
    assert logits.shape == (2, h.seg_len // h.downsample, h.emb_size, 2)
    assert jnp.isfinite(logits).all()


def test_encoder_dropout_needs_rng(tiny_hps):
    h, k, x, enc, ep, _ = _enc_dec(tiny_hps)
    out1 = enc.apply(ep, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = enc.apply(ep, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


# ---------------------------------------------------------------------- MBV


def test_mbv_binary_values(tiny_hps):
    h, k, x, enc, ep, logits = _enc_dec(tiny_hps)
    z = discretize(logits, "binary", 1.0, jax.random.PRNGKey(3))
    vals = np.unique(np.asarray(z))
    assert set(vals).issubset({0.0, 1.0})
    # deterministic inference path
    zd = discretize(logits, "binary", 1.0, None)
    assert set(np.unique(np.asarray(zd))).issubset({0.0, 1.0})
    u = hard_units(logits)
    assert u.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(u), np.asarray(zd).astype(np.int32))


def test_mbv_straight_through_gradients():
    """Hard forward, soft backward: grads must be nonzero and equal the
    soft-sample grads."""
    k = jax.random.PRNGKey(0)
    logits = jax.random.normal(k, (4, 6, 2))

    def f_hard(lg):
        soft = gumbel_softmax(lg, 0.7, jax.random.PRNGKey(1))
        return jnp.sum(straight_through(soft)[..., 0] ** 2 * 0.5)

    def f_soft(lg):
        soft = gumbel_softmax(lg, 0.7, jax.random.PRNGKey(1))
        return jnp.sum(straight_through(soft)[..., 0] * soft[..., 0])

    g = jax.grad(f_hard)(logits)
    assert float(jnp.abs(g).max()) > 0
    # forward value is exactly hard
    soft = gumbel_softmax(logits, 0.7, jax.random.PRNGKey(1))
    st = straight_through(soft)
    assert set(np.unique(np.asarray(st))).issubset({0.0, 1.0})


def test_mbv_one_hot_and_continuous(tiny_hps):
    h, k, x, enc, ep, logits = _enc_dec(tiny_hps)
    oh = discretize(logits, "one_hot", 1.0, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(oh.sum(-1)), 1.0, atol=1e-5)
    ct = discretize(logits, "continues", 1.0, jax.random.PRNGKey(1))
    assert ct.shape == logits.shape[:-1]
    np.testing.assert_allclose(np.asarray(ct), np.asarray(logits[..., 0]))


# ------------------------------------------------------------------ decoder


def test_decoder_reconstructs_shape_and_uses_speaker(tiny_hps):
    h, k, x, enc, ep, logits = _enc_dec(tiny_hps)
    z = discretize(logits, "binary", 1.0, None)
    dec = Decoder(h)
    spk0 = jnp.zeros(2, dtype=jnp.int32)
    spk1 = jnp.ones(2, dtype=jnp.int32)
    dp = dec.init(k, z, spk0)
    y0 = dec.apply(dp, z, spk0)
    y1 = dec.apply(dp, z, spk1)
    assert y0.shape == (2, h.seg_len, h.n_feat)
    # speaker conditioning must change the output
    assert float(jnp.abs(y0 - y1).mean()) > 1e-6


# ----------------------------------------------------------------- adversary


def test_speaker_classifier(tiny_hps):
    h = tiny_hps
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (3, h.n_bins, h.emb_size))
    clf = SpeakerClassifier(h)
    cp = clf.init(k, z)
    out = clf.apply(cp, z)
    assert out.shape == (3, h.n_speakers)


def test_patch_discriminator(tiny_hps):
    h = tiny_hps
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (3, h.seg_len, h.n_feat))
    dis = PatchDiscriminator(h)
    dp = dis.init(k, x)
    patch, spk = dis.apply(dp, x)
    assert patch.ndim == 3 and patch.shape[0] == 3
    assert spk.shape == (3, h.n_speakers)
    # differentiable wrt input (needed for WGAN-GP)
    g = jax.grad(lambda xx: dis.apply(dp, xx)[0].mean())(x)
    assert float(jnp.abs(g).max()) > 0


def test_converter_respects_enc_mode(tiny_hps):
    """Conversion follows hps.enc_mode (ref enc-mode switch): one_hot dumps
    argmax one-hot rows and decodes from them; continues decodes from the
    RAW logits while the dump is their binary reading; binary unchanged."""
    import numpy as np

    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.convert import Converter
    from zerospeech_tts_tpu.train import Solver

    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=1)
    wav = (0.5 * np.sin(2 * np.pi * 220 * np.arange(4000) / 16000)).astype(np.float32)
    for mode in ("binary", "one_hot", "continues"):
        h = tiny_hps.replace(n_feat=129, enc_mode=mode)
        sol = Solver(h)
        state = sol.init_state(jax.random.PRNGKey(0))
        conv = Converter(h, acfg, state.enc, state.dec, batch_size=1, bucket_frames=32)
        units, wavs = conv.convert_wavs_multi([wav], [0], trim=False)
        u = units[0]
        assert set(np.unique(u)).issubset({0, 1}), mode
        if mode == "one_hot":
            assert (u.sum(axis=1) == 1).all()  # exactly one bit per frame
        assert np.isfinite(wavs[0][0].astype(np.float32)).all(), mode
        eu = conv.encode_units_from_wavs([wav], trim=False)[0]
        np.testing.assert_array_equal(u, eu)  # units-only path agrees


# ------------------------------------------------- padding invariance (units)


def test_encoder_padding_invariant(tiny_hps):
    """Length-masked encoding of a padded bucket == exact-length encoding
    (the reference converts batch-1 at exact length, ref convert.py per
    SURVEY.md §3.4): per-stage mirror refills give convs exact reflect
    context, and the masked backward GRU starts at the true tail."""
    h = tiny_hps
    k = jax.random.PRNGKey(7)
    T = 72  # not a multiple of downsample: exercises the ceil length chain
    x = jax.random.normal(k, (1, T, h.n_feat))
    enc = Encoder(h)
    ep = enc.init(k, jnp.zeros((1, 128, h.n_feat)))
    exact = np.asarray(enc.apply(ep, x))  # rows: ceil(ceil(ceil(72/2)/2)/2) = 9
    garbage = 10.0 * jax.random.normal(jax.random.PRNGKey(9), (1, 128 - T, h.n_feat))
    masked = np.asarray(enc.apply(ep, jnp.concatenate([x, garbage], axis=1),
                                  lengths=jnp.asarray([T])))
    td = exact.shape[1]
    np.testing.assert_allclose(masked[:, :td], exact, atol=2e-5, rtol=0)
    np.testing.assert_array_equal(
        np.asarray(hard_units(jnp.asarray(masked[:, :td]))),
        np.asarray(hard_units(jnp.asarray(exact))),
    )
    # without lengths, the same garbage DOES leak (the masking is load-bearing)
    plain = np.asarray(enc.apply(ep, jnp.concatenate([x, garbage], axis=1)))
    assert np.abs(plain[:, :td] - exact).max() > 1e-3


def test_decoder_padding_invariant(tiny_hps):
    """Mirror-filled decoding of a padded latent bucket == exact-length
    decoding on every true output frame."""
    h = tiny_hps
    k = jax.random.PRNGKey(3)
    lz = 9
    z = (jax.random.uniform(k, (1, lz, h.emb_size)) < 0.5).astype(jnp.float32)
    spk = jnp.asarray([1])
    dec = Decoder(h)
    dp = dec.init(k, jnp.zeros((1, 16, h.emb_size)), spk)
    exact = np.asarray(dec.apply(dp, z, spk))
    garbage = 10.0 * jax.random.normal(jax.random.PRNGKey(5), (1, 16 - lz, h.emb_size))
    masked = np.asarray(
        dec.apply(dp, jnp.concatenate([z, garbage], axis=1), spk, lengths=jnp.asarray([lz]))
    )
    np.testing.assert_allclose(masked[:, : lz * h.downsample], exact, atol=2e-5, rtol=0)


def test_converter_units_padding_invariant(tiny_hps):
    """End-to-end: bucketed batch unit dumps == exact-length unpadded
    encoding, bit-for-bit, across pad regimes — mid-bucket pad, pad 1..3
    (exercises the _bucket_of minimum-padding bump), and pad 0 (exact
    bucket edge)."""
    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.convert import Converter
    from zerospeech_tts_tpu.dsp import audio as A
    from zerospeech_tts_tpu.train import Solver

    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=1)
    h = tiny_hps.replace(n_feat=129)
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(0))
    conv = Converter(h, acfg, state.enc, state.dec, batch_size=2, bucket_frames=32)
    assert conv._bucket_of(31) == 64 and conv._bucket_of(32) == 32  # bump rule

    rng = np.random.default_rng(11)
    feats = []
    for t in (20, 31, 32, 63):
        y = (rng.standard_normal((t - 1) * acfg.hop_length + 17) * 0.3).astype(np.float32)
        mel, mag = A.get_spectrograms(y, acfg, bucket_frames=32)
        assert mag.shape[0] == t
        feats.append(np.asarray(mag))
    units = conv.encode_units(feats)
    for f, u in zip(feats, units):
        # exact-length baseline, including the program's bf16 wire rounding;
        # the dump has ceil(t/ds) rows — ALL of the exact encoder's output,
        # including the final partial-group unit
        xe = jnp.asarray(f)[None].astype(jnp.bfloat16).astype(jnp.float32)
        exact = np.asarray(hard_units(conv.encoder.apply(state.enc, xe)))[0]
        assert u.shape[0] == -(-f.shape[0] // h.downsample) == exact.shape[0]
        np.testing.assert_array_equal(u, exact)
