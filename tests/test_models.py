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
