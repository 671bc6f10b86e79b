"""Serving layer: micro-batching service + HTTP front (serve.py).

Runs on CPU with a tiny random-init model — the service contract
(batching, per-request results, error isolation, wire formats) is what's
under test, not audio quality.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from zerospeech_tts_tpu.config import AudioConfig
from zerospeech_tts_tpu.convert import Converter
from zerospeech_tts_tpu.serve import ConversionService, serve_http, units_text
from zerospeech_tts_tpu.train import Solver


@pytest.fixture(scope="module")
def service(tiny_hps):
    h = tiny_hps.replace(n_feat=129)
    acfg = AudioConfig(n_fft=256, hop_length=64, win_length=256, n_mels=20, gl_iters=2)
    sol = Solver(h)
    state = sol.init_state(jax.random.PRNGKey(0))
    conv = Converter(h, acfg, state.enc, state.dec, batch_size=2, bucket_frames=32)
    svc = ConversionService(
        conv, {"V001": 0, "V002": 1}, window_ms=120.0, max_batch=2
    )
    yield svc
    svc.close()


def _tone(n=3000, f=220.0, sr=16000):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_service_convert_roundtrip(service):
    res = service.convert(_tone(), ("V001",), trim=False)
    assert set(res["wavs"]) == {"V001"}
    assert res["units"].ndim == 2 and set(np.unique(res["units"])) <= {0, 1}
    assert res["wavs"]["V001"].dtype == np.int16 and len(res["wavs"]["V001"]) > 0


def test_service_micro_batches_same_key(service):
    """Two same-target requests enqueued atomically share ONE program
    dispatch; each still gets its own result.

    Deterministic by construction (the threaded version of this test was
    wall-clock-sensitive: under concurrent pytest load the batching
    window could expire between the two submits, or a cold compile could
    outlive the thread-join timeout). The service's condition variable is
    a ``threading.Condition()`` whose default lock is an RLock, so the
    test thread can hold it across both ``submit`` calls — the dispatch
    worker cannot pop the queue until both requests are in it, and the
    co-batching assertion becomes exact, independent of host load."""
    d0 = service.dispatches
    with service._cv:  # worker can't take a batch while we hold the lock
        reqs = [
            service.submit(_tone(f=220.0 + 60 * i), ("V001", "V002"), trim=False)
            for i in range(2)
        ]
    results = [r.result(timeout=900) for r in reqs]
    assert results[0]["units"].shape == results[1]["units"].shape
    assert not np.array_equal(
        results[0]["wavs"]["V001"], results[1]["wavs"]["V001"]
    )  # distinct inputs -> distinct outputs (no result mixup)
    assert service.dispatches - d0 == 1  # exactly one co-batched dispatch


def test_service_units_only_and_errors(service):
    res = service.convert(_tone(), (), trim=False)
    assert "wavs" not in res and res["units"].shape[1] == service.converter.hps.emb_size
    with pytest.raises(KeyError):
        service.submit(_tone(), ("NOSUCH",))
    with pytest.raises(ValueError):
        service.submit(np.zeros(8, np.float32), ("V001",), trim=False)
    # a failed batch must not wedge the worker
    assert service.convert(_tone(), ("V001",), trim=False)["units"].size > 0


def test_http_server_end_to_end(service):
    import scipy.io.wavfile

    httpd = serve_http(service, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["speakers"] == 2
        with urllib.request.urlopen(f"{base}/speakers", timeout=30) as r:
            assert json.loads(r.read())["speakers"] == ["V001", "V002"]

        buf = io.BytesIO()
        scipy.io.wavfile.write(buf, 16000, (_tone() * 32767).astype(np.int16))
        wav_bytes = buf.getvalue()

        req = urllib.request.Request(
            f"{base}/convert?targets=V001&trim=0", data=wav_bytes, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        rows = out["units"].splitlines()
        assert rows and set("".join(rows[0].split())) <= {"0", "1"}
        sr, pcm = scipy.io.wavfile.read(
            io.BytesIO(base64.b64decode(out["wavs"]["V001"]))
        )
        assert sr == 16000 and pcm.dtype == np.int16 and len(pcm) > 0

        # JSON body (raw PCM16 + resample), units-only endpoint
        body = json.dumps(
            {
                "pcm16_b64": base64.b64encode(
                    (_tone(n=6000, sr=8000) * 32767).astype(np.int16).tobytes()
                ).decode(),
                "sr": 8000,
            }
        ).encode()
        req = urllib.request.Request(
            f"{base}/units?trim=0",
            data=body,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["units"].splitlines()

        # bad target -> 400 with an error message, server stays up
        req = urllib.request.Request(
            f"{base}/convert?targets=NOSUCH&trim=0", data=wav_bytes, method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "NOSUCH" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_units_text_format():
    u = np.array([[0, 1, 1], [1, 0, 0]], np.int32)
    assert units_text(u) == "0 1 1\n1 0 0"


def test_plan_key_canonicalization(service):
    assert service.plan_key(("V002", "V001", "V002")) == ("V001", "V002")
    with pytest.raises(ValueError):
        service.plan_key(tuple(f"V001" for _ in range(99)) + tuple(
            f"X{i}" for i in range(99)
        ))
    with pytest.raises(KeyError):
        service.plan_key(("V001", "NOSUCH"))


def test_solo_batch_failure_is_not_redispatched():
    """A failing SINGLE-request batch is its own solo retry: the owner gets
    the original error and the program is NOT dispatched a second time."""
    from zerospeech_tts_tpu.serve import ConversionService

    class _Acfg:
        top_db, hop_length = 15.0, 64

    calls = []

    class _StubConverter:
        batch_size, stats, acfg = 4, None, _Acfg()

        def encode_units_from_wavs(self, wavs, trim=False):
            calls.append(len(wavs))
            raise ValueError("bad input")

    svc = ConversionService(_StubConverter(), {"V001": 0}, window_ms=5.0)
    try:
        with pytest.raises(ValueError, match="bad input"):
            svc.convert(np.ones(2048, np.float32), (), trim=False, timeout=30)
        assert calls == [1]  # exactly one dispatch, no pointless retry
    finally:
        svc.close()


def test_batch_failure_retries_individually():
    """A batch dispatch failure falls back to per-request runs: the good
    request succeeds, only the bad one's owner sees the error."""
    from zerospeech_tts_tpu.serve import ConversionService

    class _Acfg:
        top_db, hop_length = 15.0, 64

    class _StubConverter:
        batch_size, stats, acfg = 4, None, _Acfg()

        def encode_units_from_wavs(self, wavs, trim=False):
            if len(wavs) > 1:
                raise RuntimeError("batch blew up")
            if len(wavs[0]) == 4096:  # the poisoned utterance
                raise RuntimeError("bad input")
            return [np.zeros((3, 8), np.int32)]

    svc = ConversionService(_StubConverter(), {"V001": 0}, window_ms=150.0)
    try:
        good = svc.submit(np.ones(2048, np.float32), (), trim=False)
        bad = svc.submit(np.ones(4096, np.float32), (), trim=False)
        assert good.result(30)["units"].shape == (3, 8)
        with pytest.raises(RuntimeError, match="bad input"):
            bad.result(30)
        # queues must not leak drained keys
        assert svc._queues == {}
    finally:
        svc.close()


def test_bad_first_request_does_not_poison_companions():
    """FIFO order must not matter: with the poisoned request FIRST in the
    batch and its failure input-shaped (ValueError), the healthy co-batched
    requests are still retried solo and served."""
    from zerospeech_tts_tpu.serve import ConversionService

    class _Acfg:
        top_db, hop_length = 15.0, 64

    class _StubConverter:
        batch_size, stats, acfg = 4, None, _Acfg()

        def encode_units_from_wavs(self, wavs, trim=False):
            if any(len(w) == 4096 for w in wavs):  # poisoned utterance
                raise ValueError("bad input")
            return [np.zeros((3, 8), np.int32) for _ in wavs]

    svc = ConversionService(_StubConverter(), {"V001": 0}, window_ms=150.0)
    try:
        bad = svc.submit(np.ones(4096, np.float32), (), trim=False)  # first
        good1 = svc.submit(np.ones(2048, np.float32), (), trim=False)
        good2 = svc.submit(np.ones(1024, np.float32), (), trim=False)
        with pytest.raises(ValueError, match="bad input"):
            bad.result(30)
        assert good1.result(30)["units"].shape == (3, 8)
        assert good2.result(30)["units"].shape == (3, 8)
    finally:
        svc.close()


def test_submit_rejects_overlong_utterance(service):
    service.max_frames = 16
    try:
        with pytest.raises(ValueError, match="frames"):
            service.submit(_tone(n=16000), ("V001",), trim=False)
    finally:
        service.max_frames = 32768


def test_http_rejects_oversized_body(service):
    import scipy.io.wavfile

    httpd = serve_http(service, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    service.max_body_bytes = 1024
    try:
        buf = io.BytesIO()
        scipy.io.wavfile.write(buf, 16000, (_tone() * 32767).astype(np.int16))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/units?trim=0", data=buf.getvalue(), method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "cap" in json.loads(e.read())["error"]
    finally:
        service.max_body_bytes = 64 << 20
        httpd.shutdown()
        httpd.server_close()


def test_warmup_precompiles_buckets(service):
    """warmup() runs the full-conversion and units-only programs for each
    requested bucket so the first client request hits a warm program."""
    d0 = service.dispatches
    dt = service.warmup([48, 64], n_targets=1)
    assert dt >= 0.0
    # warmup used the converter directly (no service dispatches consumed)
    assert service.dispatches == d0
    # the programs are cached for those buckets now
    conv = service.converter
    assert any(k[0] == 64 if isinstance(k, tuple) else k == 64 for k in conv._wav_progs)
