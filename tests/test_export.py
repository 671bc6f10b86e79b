"""Deployment export bundle: round-trip fidelity, converter equivalence,
and the CLI export -> convert/serve --from-export flow."""

import json

import jax
import numpy as np
import pytest

from zerospeech_tts_tpu.config import AudioConfig
from zerospeech_tts_tpu.convert import Converter
from zerospeech_tts_tpu.export import export_model, load_export
from zerospeech_tts_tpu.train import Solver

ACFG = dict(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)


def _tone(n, f=220.0, sr=16000):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_export_roundtrip_and_converter_equivalence(tmp_path, tiny_hps):
    h = tiny_hps.replace(n_feat=129)
    acfg = AudioConfig(**ACFG)
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(0))
    speakers = {"S01": 0, "V001": 1}

    info = export_model(tmp_path / "bundle", h, acfg, state.enc, state.dec, speakers)
    assert info["params_bytes"] > 0 and info["n_speakers"] == 2
    b = load_export(tmp_path / "bundle")
    assert b.hps == h and b.acfg == acfg and b.speakers == speakers
    assert b.stats is None and b.feat == "lin"
    for x, y in zip(jax.tree.leaves(state.enc), jax.tree.leaves(b.enc)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    wavs = [_tone(3000), _tone(5200, f=300.0)]
    c0 = Converter(h, acfg, state.enc, state.dec, batch_size=2, bucket_frames=32)
    c1 = Converter(b.hps, b.acfg, b.enc, b.dec, batch_size=2, bucket_frames=32)
    u0, w0 = c0.convert_wavs_multi(wavs, [0, 1], trim=False)
    u1, w1 = c1.convert_wavs_multi(wavs, [0, 1], trim=False)
    for a, c in zip(u0, u1):
        np.testing.assert_array_equal(a, c)
    for k in range(2):
        for a, c in zip(w0[k], w1[k]):
            np.testing.assert_array_equal(a, c)

    # bundle is MUCH leaner than the training state (no clf/dis/optimizers)
    full_bytes = sum(
        leaf.nbytes for leaf in jax.tree.leaves(state) if hasattr(leaf, "nbytes")
    )
    assert info["params_bytes"] < 0.5 * full_bytes

    # re-export into the same dir overwrites cleanly
    export_model(tmp_path / "bundle", h, acfg, state.enc, state.dec, speakers)
    assert load_export(tmp_path / "bundle").speakers == speakers


def test_export_speaker_stats_roundtrip(tmp_path, tiny_hps):
    from zerospeech_tts_tpu.data.speaker_norm import GLOBAL_KEY, SpeakerStats

    h = tiny_hps.replace(n_feat=129, speaker_norm=True)
    acfg = AudioConfig(**ACFG)
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    mean = {s: rng.normal(size=129).astype(np.float32) for s in ("S01", GLOBAL_KEY)}
    std = {s: rng.uniform(0.5, 2.0, 129).astype(np.float32) for s in ("S01", GLOBAL_KEY)}
    stats = SpeakerStats(mean, std)

    export_model(
        tmp_path / "b", h, acfg, state.enc, state.dec, {"S01": 0}, stats=stats
    )
    b = load_export(tmp_path / "b")
    assert set(b.stats.mean) == {"S01", GLOBAL_KEY}
    np.testing.assert_array_equal(b.stats.mean["S01"], mean["S01"])
    np.testing.assert_array_equal(b.stats.std[GLOBAL_KEY], std[GLOBAL_KEY])

    # speaker_norm without stats must refuse both ways
    with pytest.raises(ValueError, match="stats"):
        export_model(tmp_path / "b2", h, acfg, state.enc, state.dec, {"S01": 0})


def test_export_cli_flow(tmp_path, tiny_hps, capsys):
    """zstts export from a real checkpoint dir, then convert --from-export
    --from-wavs with NO -dataset_path/-ckpt_dir (the deployment-host
    scenario)."""
    from zerospeech_tts_tpu.cli import main as cli_main
    from zerospeech_tts_tpu.convert import read_units
    from zerospeech_tts_tpu.dsp.wavio import save_wav
    from zerospeech_tts_tpu.train import CheckpointManager

    import dataclasses
    import h5py

    h = tiny_hps.replace(n_feat=129)
    hps_path = tmp_path / "hps.json"
    cfg = dataclasses.asdict(h)
    cfg["audio"] = ACFG
    hps_path.write_text(json.dumps(cfg))

    # a checkpoint + a minimal h5 carrying the speaker map
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(2))
    mgr = CheckpointManager(tmp_path / "ck", hps=h)
    mgr.save(state, wait=True)
    mgr.close()
    with h5py.File(tmp_path / "ds.h5", "w") as f:
        f.attrs["speakers"] = json.dumps({"S01": 0, "V001": 1})

    cli_main([
        "export", "--platform", "cpu", "-hps", str(hps_path),
        "-dataset_path", str(tmp_path / "ds.h5"), "-ckpt_dir", str(tmp_path / "ck"),
        "--out", str(tmp_path / "bundle"),
    ])
    info = json.loads(capsys.readouterr().out)
    assert info["n_speakers"] == 2 and info["step"] == 0

    wav_dir = tmp_path / "wavs"
    for i in range(2):
        save_wav(wav_dir / f"u{i}.wav", _tone(4000, f=200.0 + 60 * i), 16000)
    out = tmp_path / "out"
    cli_main([
        "convert", "--platform", "cpu", "--from-export", str(tmp_path / "bundle"),
        "-result_dir", str(out), "--from-wavs", str(wav_dir),
        "--target", "V001", "--gl-iters", "2", "--batch-size", "2",
    ])
    units = sorted((out / "units").glob("*.txt"))
    assert len(units) == 2
    assert set(np.unique(read_units(units[0]))).issubset({0, 1})
    assert len(sorted((out / "V001").glob("*.wav"))) == 2

    # neither --from-export nor h5/ckpt -> loud exit
    with pytest.raises(SystemExit, match="from-export"):
        cli_main(["convert", "--platform", "cpu", "-result_dir", str(out)])
