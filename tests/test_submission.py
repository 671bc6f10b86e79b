"""Submission packager/validator (SURVEY.md §4: the reference's output
contract is the challenge archive's content — unit txt + 16 kHz wavs;
ref convert.py:~1-200 per SURVEY §3.4). Pure host-side file tests."""

import zipfile

import numpy as np
import pytest
from scipy.io import wavfile

from zerospeech_tts_tpu.submission import (
    build_submission,
    render_metadata,
    validate_submission,
)


def _mk_result_dir(root, utts=("u1", "u2"), target="V001", width=8, sr=16000):
    units = root / "units"
    wavs = root / target
    units.mkdir(parents=True)
    wavs.mkdir()
    rng = np.random.default_rng(0)
    for u in utts:
        np.savetxt(units / f"{u}.txt", rng.integers(0, 2, (12, width)), fmt="%d")
        tone = (8000 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.int16)
        wavfile.write(wavs / f"{u}.wav", sr, tone)
    return root


def test_build_and_validate_roundtrip(tmp_path):
    res = _mk_result_dir(tmp_path / "out")
    zp = tmp_path / "sub.zip"
    rep = build_submission(zp, {"english": (res, "V001")}, metadata={"author": "t"})
    assert rep["ok"], rep["problems"]
    lang = rep["languages"]["english"]
    assert lang["n_utterances"] == 2 and lang["unit_width"] == 8
    assert lang["bitrate"]["bitrate_bits_per_second"] > 0
    with zipfile.ZipFile(zp) as zf:
        names = set(zf.namelist())
        assert "metadata.yaml" in names
        assert "english/test/u1.txt" in names and "english/test/u1.wav" in names
        meta = zf.read("metadata.yaml").decode()
    assert "author: t" in meta and "open source: true" in meta


def test_build_two_languages(tmp_path):
    en = _mk_result_dir(tmp_path / "en")
    su = _mk_result_dir(tmp_path / "su", utts=("s1",), width=4)
    rep = build_submission(
        tmp_path / "s.zip", {"english": (en, "V001"), "surprise": (su, "V001")}
    )
    assert rep["ok"]
    assert set(rep["languages"]) == {"english", "surprise"}
    assert rep["languages"]["surprise"]["unit_width"] == 4


def test_build_refuses_missing_wav(tmp_path):
    res = _mk_result_dir(tmp_path / "out")
    (res / "V001" / "u2.wav").unlink()
    with pytest.raises(FileNotFoundError, match="no wav"):
        build_submission(tmp_path / "s.zip", {"english": (res, "V001")})


def test_validate_finds_content_problems(tmp_path):
    zp = tmp_path / "bad.zip"
    sr = 16000
    import io

    buf = io.BytesIO()
    wavfile.write(buf, 8000, np.zeros(800, np.int16))  # wrong sr AND silent
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("english/test/a.txt", "0 1 2\n")  # non-binary
        zf.writestr("english/test/a.wav", buf.getvalue())
        zf.writestr("english/test/b.txt", "0 1\n1 0\n")  # no wav pair
        zf.writestr("english/stray.bin", "x")  # bad placement
        # no metadata.yaml
    rep = validate_submission(zp, sr=sr)
    assert not rep["ok"]
    text = "\n".join(rep["problems"])
    assert "metadata.yaml missing" in text
    assert "non-binary" in text
    assert "sample rate 8000" in text
    assert "silent audio" in text
    assert "b.txt has no synthesized wav" in text
    assert "stray.bin" in text


def test_metadata_quoting():
    txt = render_metadata({"author": "a: b", "extra": 3})
    assert '"a: b"' in txt  # colon forces quoting
    assert "extra: 3" in txt
    assert txt.splitlines()[0].startswith("author")


def test_cli_submission_verb(tmp_path, capsys):
    from zerospeech_tts_tpu.cli import main

    res = _mk_result_dir(tmp_path / "out")
    zp = tmp_path / "s.zip"
    main(["submission", "--lang", f"english={res}:V001", "-o", str(zp)])
    assert zp.exists()
    out = capsys.readouterr().out
    assert '"ok": true' in out
    main(["submission", "--validate", str(zp)])
    assert '"ok": true' in capsys.readouterr().out
    with pytest.raises(SystemExit):
        main(["submission", "--lang", "bad-spec", "-o", str(zp)])
