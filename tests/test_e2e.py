"""End-to-end slice through the real CLI (SURVEY.md §7 "Minimum end-to-end
slice"): preprocess -> stage-1 train -> stage-2 train -> corpus convert ->
single-utterance convert, on a synthetic 3-speaker toy corpus."""

import json

import numpy as np
import pytest

from zerospeech_tts_tpu.cli import main as cli_main
from zerospeech_tts_tpu.convert import read_units
from zerospeech_tts_tpu.dsp.wavio import load_wav, save_wav

TINY_AUDIO = {
    "n_fft": 256,
    "hop_length": 64,
    "win_length": 256,
    "n_mels": 20,
    "gl_iters": 8,
}
TINY_HPS = {
    "batch_size": 4,
    "seg_len": 32,
    "n_feat": 129,
    "emb_size": 16,
    "spk_emb_size": 8,
    "n_speakers": 8,
    "bank_size": 4,
    "bank_channels": 8,
    "conv_channels": 16,
    "n_critic": 1,
    "log_interval": 1,
    "save_interval": 100,
    "audio": TINY_AUDIO,
}


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    hps_path = root / "hps.json"
    hps_path.write_text(json.dumps(TINY_HPS))

    corpus = root / "corpus"
    rng = np.random.default_rng(0)
    for split, speakers in [("train", ["S01", "S02", "V001", "V002"]), ("test", ["S09"])]:
        for spk in speakers:
            for i in range(2):
                n = 12000
                t = np.arange(n) / 16000
                f0 = 180 + 50 * (hash(spk) % 5) + 30 * i
                y = (0.4 * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.standard_normal(n)).astype(
                    np.float32
                )
                save_wav(corpus / split / f"{spk}_{i:04d}.wav", y, 16000)

    ds = root / "ds.h5"
    idx = root / "index.json"
    ckpt = root / "ckpt"
    out = root / "result"
    return dict(root=root, hps=hps_path, corpus=corpus, ds=ds, idx=idx, ckpt=ckpt, out=out)


def test_01_preprocess(pipeline):
    p = pipeline
    cli_main(
        [
            "preprocess",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "--corpus", str(p["corpus"]),
            "-dataset_path", str(p["ds"]),
            "-index_path", str(p["idx"]),
            "--n-samples", "200",
        ]
    )
    assert p["ds"].exists() and p["idx"].exists()
    assert len(json.loads(p["idx"].read_text())) == 200


def test_02_train_stage1(pipeline):
    p = pipeline
    cli_main(
        [
            "train1",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "-dataset_path", str(p["ds"]),
            "-index_path", str(p["idx"]),
            "-ckpt_dir", str(p["ckpt"]),
            "--iters-override", "2",
        ]
    )
    assert any(p["ckpt"].iterdir())
    metrics = [
        json.loads(l) for l in open(p["ckpt"] / "logs" / "metrics.jsonl") if l.strip()
    ]
    modes = {m["mode"] for m in metrics}
    assert {"pretrain_AE", "pretrain_C", "train"} <= modes


def test_03_train_stage2(pipeline):
    p = pipeline
    cli_main(
        [
            "train2",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "-dataset_path", str(p["ds"]),
            "-index_path", str(p["idx"]),
            "-ckpt_dir", str(p["ckpt"]),
            "--iters-override", "2",
            "--targets", "V001", "V002",
        ]
    )
    metrics = [
        json.loads(l) for l in open(p["ckpt"] / "logs" / "metrics.jsonl") if l.strip()
    ]
    assert any(m["mode"] == "patchGAN" for m in metrics)


def test_04_convert_corpus(pipeline):
    p = pipeline
    cli_main(
        [
            "convert",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "-dataset_path", str(p["ds"]),
            "-ckpt_dir", str(p["ckpt"]),
            "-result_dir", str(p["out"]),
            "--target", "V001", "V002",
            "--gl-iters", "4",
            "--batch-size", "2",
        ]
    )
    units = sorted((p["out"] / "units").glob("*.txt"))
    assert len(units) == 2  # test split has 2 utterances
    u = read_units(units[0])
    assert u.shape[1] == TINY_HPS["emb_size"]
    assert set(np.unique(u)).issubset({0, 1})
    for tgt in ("V001", "V002"):
        wavs = sorted((p["out"] / tgt).glob("*.wav"))
        assert len(wavs) == 2
        y = load_wav(wavs[0], 16000)
        assert len(y) > 1000 and np.isfinite(y).all()


def test_05_convert_single(pipeline):
    p = pipeline
    src = next((p["corpus"] / "test").glob("*.wav"))
    cli_main(
        [
            "convert-single",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "-dataset_path", str(p["ds"]),
            "-ckpt_dir", str(p["ckpt"]),
            "-result_dir", str(p["out"] / "single"),
            "--source", str(src),
            "--target", "V001",
            "--gl-iters", "4",
        ]
    )
    outs = list((p["out"] / "single" / "V001").glob("*.wav"))
    assert len(outs) == 1
    assert len(load_wav(outs[0], 16000)) > 500


def test_06_convert_rejects_bad_target(pipeline):
    p = pipeline
    with pytest.raises(SystemExit, match="not in corpus"):
        cli_main(
            [
                "convert",
                "--platform", "cpu",
                "-hps", str(p["hps"]),
                "-dataset_path", str(p["ds"]),
                "-ckpt_dir", str(p["ckpt"]),
                "-result_dir", str(p["out"]),
                "--target", "NOPE",
            ]
        )


def test_07_units_only(pipeline):
    p = pipeline
    out = p["root"] / "units_only"
    cli_main(
        [
            "convert",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "-dataset_path", str(p["ds"]),
            "-ckpt_dir", str(p["ckpt"]),
            "-result_dir", str(out),
            "--units-only",
        ]
    )
    units = sorted((out / "units").glob("*.txt"))
    assert len(units) == 2
    u = read_units(units[0])
    assert set(np.unique(u)).issubset({0, 1})
    # no wavs were synthesized
    assert not any(d.is_dir() and d.name.startswith("V") for d in out.iterdir())


def test_08_mel_pipeline(tmp_path_factory):
    """Train + convert on 80-dim mel features (--feat mel): the decoder
    output goes through melspectrogram2wav (pinv mel lift + GL)."""
    root = tmp_path_factory.mktemp("mel_e2e")
    hps = dict(TINY_HPS, n_feat=20)  # = TINY_AUDIO n_mels
    hps_path = root / "hps.json"
    hps_path.write_text(json.dumps(hps))
    corpus = root / "corpus"
    rng = np.random.default_rng(0)
    for split, speakers in [("train", ["S01", "V001"]), ("test", ["S09"])]:
        for spk in speakers:
            for i in range(2):
                t = np.arange(12000) / 16000
                y = (0.4 * np.sin(2 * np.pi * (200 + 40 * i) * t)).astype(np.float32)
                save_wav(corpus / split / f"{spk}_{i:04d}.wav", y, 16000)
    ds, idx, ckpt, out = root / "ds.h5", root / "i.json", root / "ck", root / "out"
    cli_main(["preprocess", "--platform", "cpu", "-hps", str(hps_path), "--corpus", str(corpus),
              "-dataset_path", str(ds), "-index_path", str(idx), "--n-samples", "50"])
    cli_main(["train1", "--platform", "cpu", "-hps", str(hps_path), "-dataset_path", str(ds),
              "-index_path", str(idx), "-ckpt_dir", str(ckpt), "--iters-override", "1",
              "--feat", "mel"])
    cli_main(["convert", "--platform", "cpu", "-hps", str(hps_path), "-dataset_path", str(ds),
              "-ckpt_dir", str(ckpt), "-result_dir", str(out), "--target", "V001",
              "--gl-iters", "4", "--batch-size", "2", "--feat", "mel"])
    wavs = list((out / "V001").glob("*.wav"))
    assert len(wavs) == 2
    y = load_wav(wavs[0], 16000)
    assert len(y) > 1000 and np.isfinite(y).all()


def test_09_train1_auto_resume(pipeline, capsys):
    p = pipeline
    cli_main(
        [
            "train1",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "-dataset_path", str(p["ds"]),
            "-index_path", str(p["idx"]),
            "-ckpt_dir", str(p["ckpt"]),
            "--iters-override", "1",
        ]
    )
    out = capsys.readouterr().out
    assert "resumed from step" in out


def test_10_eval_metrics(pipeline, capsys):
    p = pipeline
    cli_main(
        [
            "eval",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "--units", str(p["out"] / "units"),
            "--recon",
            "-dataset_path", str(p["ds"]),
            "-ckpt_dir", str(p["ckpt"]),
            "--n-segments", "8",
        ]
    )
    rep = json.loads(capsys.readouterr().out)
    br = rep["bitrate"]
    assert br["n_utterances"] == 2 and br["bitrate_bits_per_second"] > 0
    assert 0 <= rep["units"]["active_fraction"] <= 1
    assert rep["reconstruction"]["recon_l1"] > 0


def test_11_convert_from_chosen_step(pipeline):
    """--load_model STEP converts from a NON-latest checkpoint (ref
    main.py --load_model model selection)."""
    from zerospeech_tts_tpu.train import CheckpointManager

    p = pipeline
    m = CheckpointManager(p["ckpt"])
    steps = m.all_steps()
    m.close()
    assert len(steps) >= 2, steps
    chosen = steps[0]  # oldest retained step != latest
    out = p["root"] / f"result_step{chosen}"
    cli_main(
        [
            "convert",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "-dataset_path", str(p["ds"]),
            "-ckpt_dir", str(p["ckpt"]),
            "-result_dir", str(out),
            "--target", "V001",
            "--gl-iters", "4",
            "--batch-size", "2",
            "--load_model", str(chosen),
        ]
    )
    assert len(sorted((out / "units").glob("*.txt"))) == 2
    # selecting a bogus step fails loudly with the available list
    with pytest.raises(FileNotFoundError, match="available"):
        cli_main(
            [
                "convert", "--platform", "cpu", "-hps", str(p["hps"]),
                "-dataset_path", str(p["ds"]), "-ckpt_dir", str(p["ckpt"]),
                "-result_dir", str(out), "--target", "V001",
                "--load_model", "999999",
            ]
        )


def test_12_train1_from_external_ckpt_dir(pipeline, tmp_path, capsys):
    """--load_model DIR starts training from a model in ANOTHER checkpoint
    directory (the reference's load-specific-model use case)."""
    p = pipeline
    new_ckpt = tmp_path / "fork"
    cli_main(
        [
            "train1",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "-dataset_path", str(p["ds"]),
            "-index_path", str(p["idx"]),
            "-ckpt_dir", str(new_ckpt),
            "--iters-override", "1",
            "--load_model", str(p["ckpt"]),
        ]
    )
    out = capsys.readouterr().out
    assert "resumed from step" in out
    assert any(new_ckpt.iterdir())


def test_13_convert_from_wavs(pipeline):
    """--from-wavs DIR: corpus conversion straight from test wavs (the
    literal ref --test stack, SURVEY.md §3.4) — on-device frontend, no h5
    features. Source stats are global (out-of-corpus contract), so units
    may differ slightly from the h5 path; artifacts + shapes must match."""
    p = pipeline
    out = p["root"] / "result_from_wavs"
    cli_main(
        [
            "convert",
            "--platform", "cpu",
            "-hps", str(p["hps"]),
            "-dataset_path", str(p["ds"]),
            "-ckpt_dir", str(p["ckpt"]),
            "-result_dir", str(out),
            "--from-wavs", str(p["corpus"] / "test"),
            "--target", "V001",
            "--gl-iters", "4",
            "--batch-size", "2",
        ]
    )
    units = sorted((out / "units").glob("*.txt"))
    ref_units = sorted((p["out"] / "units").glob("*.txt"))
    assert [u.name for u in units] == [u.name for u in ref_units]
    for uf, rf in zip(units, ref_units):
        a, b = read_units(uf), read_units(rf)
        assert a.shape == b.shape  # same trim -> same frame count
        assert set(np.unique(a)).issubset({0, 1})
    wavs = sorted((out / "V001").glob("*.wav"))
    assert len(wavs) == 2
    y = load_wav(wavs[0], 16000)
    assert len(y) > 1000 and np.isfinite(y).all()


def test_14_surprise_mesh_e2e(tmp_path_factory):
    """BASELINE.json config #5: surprise-language end-to-end on a TPU mesh
    — preprocess -> stage-1 -> stage-2 -> convert, all through the real
    CLI with --mesh (DP for train1/convert, DP x TP for train2, so the
    place_state CLI path runs under a model axis too). Tiny geometry on
    the 8 fake devices; the surprise variant differs from english only in
    its speaker budget (ref ships per-language hps, SURVEY.md §5)."""
    root = tmp_path_factory.mktemp("surprise_e2e")
    hps = dict(TINY_HPS, n_speakers=12)  # surprise: different speaker budget
    hps_path = root / "hps_surprise.json"
    hps_path.write_text(json.dumps(hps))
    corpus = root / "corpus"
    rng = np.random.default_rng(1)
    for split, speakers in [("train", ["I01", "I02", "I03", "V001"]), ("test", ["I09"])]:
        for spk in speakers:
            for i in range(2):
                t = np.arange(12000) / 16000
                f0 = 160 + 45 * (hash(spk) % 4) + 25 * i
                y = (0.4 * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.standard_normal(12000)).astype(np.float32)
                save_wav(corpus / split / f"{spk}_{i:04d}.wav", y, 16000)
    ds, idx, ckpt, out = root / "ds.h5", root / "i.json", root / "ck", root / "out"
    cli_main(["preprocess", "--platform", "cpu", "-hps", str(hps_path), "--corpus", str(corpus),
              "-dataset_path", str(ds), "-index_path", str(idx), "--n-samples", "100"])
    cli_main(["train1", "--platform", "cpu", "--mesh", "data=2", "-hps", str(hps_path),
              "-dataset_path", str(ds), "-index_path", str(idx), "-ckpt_dir", str(ckpt),
              "--iters-override", "2"])
    cli_main(["train2", "--platform", "cpu", "--mesh", "data=2,model=2", "-hps", str(hps_path),
              "-dataset_path", str(ds), "-index_path", str(idx), "-ckpt_dir", str(ckpt),
              "--iters-override", "2", "--targets", "V001"])
    cli_main(["convert", "--platform", "cpu", "--mesh", "data=2", "-hps", str(hps_path),
              "-dataset_path", str(ds), "-ckpt_dir", str(ckpt), "-result_dir", str(out),
              "--target", "V001", "--gl-iters", "4", "--batch-size", "2"])
    units = sorted((out / "units").glob("*.txt"))
    assert len(units) == 2
    assert set(np.unique(read_units(units[0]))).issubset({0, 1})
    wavs = sorted((out / "V001").glob("*.wav"))
    assert len(wavs) == 2
    y = load_wav(wavs[0], 16000)
    assert len(y) > 1000 and np.isfinite(y).all()
