#!/usr/bin/env python
"""Reference-parity harness (VERDICT r1 missing #3 / SURVEY.md §7 hard-part #1).

The reference mount ``/root/reference`` has been EMPTY in every round so
far (0 files — see SURVEY.md provenance note); all parity claims therefore
stand on torch.stft/scipy oracles. THE MOMENT the mount populates, this
script produces the real evidence:

    python tools/parity_vs_ref.py [--reference /root/reference]
                                  [--out docs/parity_report.json]

What it does when a reference tree exists:

1.  **hps re-extraction** — finds ``hps/*.json`` in the reference and
    diffs every field against ours (``zerospeech_tts_tpu/hps/*.json``),
    flagging values we reconstructed wrongly (n_speakers, alpha_enc,
    schedules — SURVEY grades them M).
2.  **DSP parity** — imports the reference's ``preprocess``/``utils``
    module (torch/numpy, CPU), runs its spectrogram extraction on shared
    synthetic wavs, runs ours on the same samples, and reports per-feature
    max-abs / mean-abs diffs (gates: mel-L1 <= 1e-3 per BASELINE.json).
3.  **Vocoder parity** — runs the reference Griffin-Lim (when a callable
    is found) and ours (gl_momentum=0 = plain GL) from the same magnitudes
    and compares magnitude-consistency.
4.  Writes a machine-readable JSON report and exits nonzero if any gate
    that COULD be evaluated failed; missing pieces are reported as
    ``skipped``, never silently dropped.

With an empty mount it prints the skip reason and exits 0 — so the
harness is runnable (and CI-safe) today.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def ref_tree_files(ref: Path) -> list[Path]:
    if not ref.is_dir():
        return []
    return [p for p in ref.rglob("*") if p.is_file()]


def make_test_wavs(seconds: float = 2.0, sr: int = 16000, n: int = 4) -> list[np.ndarray]:
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    wavs = []
    for i in range(n):
        f0 = 180 + 60 * i
        y = (
            0.4 * np.sin(2 * np.pi * f0 * t)
            + 0.15 * np.sin(2 * np.pi * 3.1 * f0 * t)
            + 0.02 * rng.standard_normal(t.shape[0])
        )
        wavs.append(y.astype(np.float32))
    return wavs


def import_ref_module(ref: Path, names: tuple[str, ...]):
    """Import the first module of ``names`` found in the reference tree
    (by filename), isolated from our package path."""
    for name in names:
        hits = sorted(ref.rglob(f"{name}.py"))
        if not hits:
            continue
        spec = importlib.util.spec_from_file_location(f"ref_{name}", hits[0])
        mod = importlib.util.module_from_spec(spec)
        sys.path.insert(0, str(hits[0].parent))
        try:
            spec.loader.exec_module(mod)
            return name, hits[0], mod
        except Exception as e:  # report, keep going — partial evidence > none
            return name, hits[0], e
        finally:
            sys.path.pop(0)
    return None, None, None


def diff_hps(ref: Path, report: dict) -> None:
    ours_dir = REPO / "zerospeech_tts_tpu" / "hps"
    ref_jsons = sorted(ref.rglob("hps/*.json")) or sorted(ref.rglob("*.json"))
    if not ref_jsons:
        report["hps"] = {"skipped": "no hps json found in reference tree"}
        return
    out = {}
    for rj in ref_jsons:
        try:
            ref_vals = json.loads(rj.read_text())
        except Exception as e:
            out[rj.name] = {"error": f"unparseable: {e}"}
            continue
        ours_path = ours_dir / rj.name
        if not ours_path.exists():
            out[rj.name] = {"missing_ours": True, "ref_keys": sorted(ref_vals)}
            continue
        ours = json.loads(ours_path.read_text())
        diffs = {
            k: {"ref": ref_vals[k], "ours": ours.get(k, "<absent>")}
            for k in ref_vals
            if not str(k).startswith("_") and ours.get(k) != ref_vals[k]
        }
        out[rj.name] = {"fields_differing": diffs, "n_ref_fields": len(ref_vals)}
    report["hps"] = out


def dsp_parity(ref: Path, report: dict) -> bool:
    """Feature-extraction diff on shared wavs. Returns False on gate fail."""
    name, path, mod = import_ref_module(ref, ("preprocess", "utils", "audio"))
    if mod is None:
        report["dsp"] = {"skipped": "no preprocess/utils/audio module in reference"}
        return True
    if isinstance(mod, Exception):
        report["dsp"] = {"skipped": f"reference module {path} failed to import: {mod}"}
        return True
    fn = None
    for cand in ("get_spectrograms", "logmelspectrogram", "wav2spectrogram", "spectrogram"):
        if hasattr(mod, cand):
            fn = getattr(mod, cand)
            break
    if fn is None:
        report["dsp"] = {
            "skipped": f"{name}.py has no recognized extraction fn",
            "module_attrs": sorted(a for a in dir(mod) if not a.startswith("_"))[:40],
        }
        return True

    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.dsp import audio as A

    acfg = AudioConfig()
    rows, ok = [], True
    for i, y in enumerate(make_test_wavs()):
        try:
            ref_out = fn(y)
        except Exception as e:
            report["dsp"] = {"skipped": f"reference {name}.{fn.__name__} raised: {e}"}
            return True
        mel_ref, lin_ref = (ref_out if isinstance(ref_out, tuple) else (ref_out, None))[:2]
        mel_ours, lin_ours = A.get_spectrograms(y, acfg)
        row = {"wav": i}
        for tag, a, b in (("mel", mel_ref, mel_ours), ("lin", lin_ref, lin_ours)):
            if a is None:
                continue
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            tmin = min(a.shape[0], b.shape[0])
            if a.shape[1:] != b.shape[1:]:
                row[tag] = {"shape_ref": list(a.shape), "shape_ours": list(b.shape)}
                ok = False
                continue
            d = np.abs(a[:tmin] - b[:tmin])
            row[tag] = {"l1": float(d.mean()), "max": float(d.max())}
            if tag == "mel" and d.mean() > 1e-3:  # BASELINE.json gate
                ok = False
        rows.append(row)
    report["dsp"] = {"module": str(path), "fn": fn.__name__, "per_wav": rows, "gate_mel_l1": 1e-3}
    return ok


def vocoder_parity(ref: Path, report: dict) -> bool:
    name, path, mod = import_ref_module(ref, ("utils", "preprocess", "synthesis"))
    fn = None
    if mod is not None and not isinstance(mod, Exception):
        for cand in ("spectrogram2wav", "griffin_lim", "inv_spectrogram"):
            if hasattr(mod, cand):
                fn = getattr(mod, cand)
                break
    if fn is None:
        report["vocoder"] = {"skipped": "no reference Griffin-Lim callable found"}
        return True

    import jax.numpy as jnp

    from zerospeech_tts_tpu.config import AudioConfig
    from zerospeech_tts_tpu.dsp import audio as A

    acfg = AudioConfig(gl_momentum=0.0)  # plain GL = the reference algorithm
    y = make_test_wavs(n=1)[0]
    mel, lin = A.get_spectrograms(y, acfg)
    try:
        wav_ref = np.asarray(fn(np.asarray(lin)))
    except Exception as e:
        report["vocoder"] = {"skipped": f"reference {fn.__name__} raised: {e}"}
        return True
    wav_ours = np.asarray(A.spectrogram2wav(jnp.asarray(lin), acfg))

    def consistency(w):
        re, im = A.stft(jnp.asarray(w.astype(np.float32)), acfg, method="fused")
        m2 = np.hypot(np.asarray(re), np.asarray(im))
        # target magnitudes from the shared lin features
        amp = np.power(10.0, (np.clip(lin, 0, 1) * acfg.max_db - acfg.max_db + acfg.ref_db) * 0.05)
        tmin = min(m2.shape[0], amp.shape[0])
        return float(
            np.linalg.norm(m2[:tmin] - amp[:tmin]) / max(np.linalg.norm(amp[:tmin]), 1e-9)
        )

    c_ref, c_ours = consistency(wav_ref), consistency(wav_ours)
    report["vocoder"] = {"fn": f"{path}:{fn.__name__}", "consistency_ref": c_ref,
                         "consistency_ours": c_ours, "gate_abs_diff": 0.05}
    return abs(c_ref - c_ours) <= 0.05


def units_e2e(ref: Path, report: dict) -> bool:
    """End-to-end discrete-unit diff (VERDICT r2 item 8): run the SAME
    wavs through the reference's feature+encoder+binarize stack and
    through ours. Bit-identical units require the reference's trained
    weights on both sides, so this section:

    1. finds a torch checkpoint in the reference tree and the reference
       model module;
    2. runs the reference stack and records its unit streams to
       ``docs/ref_units_sample.json`` (the offline comparison artifact);
    3. if a weight-port module exists (``tools/port_ref_weights.py``,
       written against the REAL layer names once the tree is readable —
       guessing a state_dict mapping blind would be untestable), ports
       the weights into our Encoder, runs our stack on the same wavs,
       and gates on exact unit equality.
    """
    ckpts = [
        p for p in ref.rglob("*")
        if p.is_file() and p.suffix in (".pt", ".pth", ".ckpt", ".pkl")
    ]
    if not ckpts:
        report["units_e2e"] = {"skipped": "no torch checkpoint in reference tree"}
        return True
    name, path, mod = import_ref_module(ref, ("model",))
    if mod is None or isinstance(mod, Exception):
        report["units_e2e"] = {"skipped": f"reference model module unusable: {mod}"}
        return True
    fe_name, fe_path, fe_mod = import_ref_module(ref, ("preprocess", "utils"))
    get_spec = getattr(fe_mod, "get_spectrograms", None) if fe_mod and not isinstance(fe_mod, Exception) else None
    if get_spec is None or not hasattr(mod, "Encoder"):
        report["units_e2e"] = {"skipped": "reference Encoder/get_spectrograms not found"}
        return True
    try:
        import torch

        state = torch.load(ckpts[0], map_location="cpu")
        enc_sd = state.get("encoder", state) if isinstance(state, dict) else state
        ref_units = []
        enc = mod.Encoder()
        enc.load_state_dict(enc_sd if hasattr(enc_sd, "keys") else enc_sd.state_dict())
        enc.eval()
        with torch.no_grad():
            for y in make_test_wavs(n=2):
                mel, lin = get_spec(y)[:2]
                x = torch.as_tensor(np.asarray(lin), dtype=torch.float32)[None]
                out = enc(x)
                z = out[0] if isinstance(out, tuple) else out
                ref_units.append((np.asarray(z) > 0.5).astype(int).tolist())
        (REPO / "docs" / "ref_units_sample.json").write_text(
            json.dumps({"ckpt": str(ckpts[0]), "units": ref_units}) + "\n"
        )
    except Exception as e:
        report["units_e2e"] = {"skipped": f"reference encode failed: {e!r}", "ckpt": str(ckpts[0])}
        return True

    port_path = REPO / "tools" / "port_ref_weights.py"
    if not port_path.exists():
        report["units_e2e"] = {
            "recorded": "docs/ref_units_sample.json",
            "pending": "write tools/port_ref_weights.py against the real "
                       "state_dict names, then re-run for the exact-equality gate",
        }
        return True
    try:
        # a broken port module must record a failure, not crash the harness
        # before the JSON report is written (every other section degrades
        # to a recorded skip the same way)
        spec = importlib.util.spec_from_file_location("port_ref_weights", port_path)
        port = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(port)
        ours = port.port_encoder(ckpts[0])  # -> flax params
        from zerospeech_tts_tpu.config import AudioConfig, Hps
        from zerospeech_tts_tpu.dsp import audio as A
        from zerospeech_tts_tpu.models import Encoder, hard_units

        hps, acfg = Hps(), AudioConfig()
        ok = True
        diffs = []
        for i, y in enumerate(make_test_wavs(n=2)):
            _, lin = A.get_spectrograms(y, acfg)
            u = np.asarray(hard_units(Encoder(hps).apply(ours, np.asarray(lin)[None])))[0]
            r = np.asarray(json.loads((REPO / "docs" / "ref_units_sample.json").read_text())["units"][i])
            tmin = min(len(u), r.shape[1] if r.ndim == 3 else len(r))
            agree = float((u[:tmin] == r.reshape(-1, r.shape[-1])[:tmin]).mean())
            diffs.append(agree)
            ok = ok and agree == 1.0
        report["units_e2e"] = {"agreement": diffs, "gate": "exact (1.0)"}
        return ok
    except Exception as e:
        report["units_e2e"] = {"failed": f"weight port raised: {e!r}", "port": str(port_path)}
        return False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=str(REPO / "docs" / "parity_report.json"))
    args = ap.parse_args(argv)

    ref = Path(args.reference)
    files = ref_tree_files(ref)
    if not files:
        print(f"SKIP: reference mount {ref} is empty (0 files) — nothing to diff. "
              f"Re-run this script when the mount populates.")
        return 0

    import jax

    jax.config.update("jax_platforms", "cpu")  # parity runs CPU-deterministic

    report: dict = {"reference": str(ref), "n_ref_files": len(files)}
    diff_hps(ref, report)
    ok = dsp_parity(ref, report)
    ok = vocoder_parity(ref, report) and ok
    ok = units_e2e(ref, report) and ok
    report["ok"] = ok

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    print(f"\nparity report -> {out}  ({'OK' if ok else 'GATE FAILED'})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
