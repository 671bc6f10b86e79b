"""Serving runtime — persistent conversion service + stdlib HTTP front.

No reference counterpart (the reference repo is batch CLI only, ref
main.py:~1-150); this is the deployment story of the TPU rebuild: the
Converter's fixed-shape XLA programs compile ONCE per length bucket and
stay warm in a long-lived process, and concurrent requests MICRO-BATCH
onto them — the shape-stable, large-batch execution model TPUs want,
exposed as a service.

Design:

* ``ConversionService`` — a single dispatch worker thread owns all JAX
  calls (one stream, no device contention). Requests queue per "plan
  key" (the canonicalized — sorted, deduplicated, count-capped — tuple
  of target speakers; ``()`` = units-only). The worker drains the
  oldest key's queue, waits up to ``window_ms`` for more requests of
  the same key (micro-batching window), then runs ONE conversion
  program over the gathered utterances. Silence-trim happens at submit
  time so requests with different trim settings still share a batch.
  If a batch dispatch fails, its requests are retried individually so
  one bad input cannot poison co-batched clients.
* ``serve_http`` — a ``ThreadingHTTPServer`` front end (stdlib only).
  Handler threads block on their request's future, so the micro-batcher
  sees every in-flight request at once:

      GET  /healthz           -> {"ok": true, platform, speakers, dispatches}
      GET  /speakers          -> {"speakers": [...]}
      POST /convert?targets=V001,V002[&trim=0]   body: WAV bytes
      POST /units[?trim=0]                        body: WAV bytes
      (both POSTs also accept JSON {"pcm16_b64": ..., "sr": N})

  /convert returns {"units": <challenge text format>, "wavs":
  {target: base64 PCM16 WAV}}; /units returns just the units.

Start it with ``zstts serve -dataset_path ds.h5 -ckpt_dir ckpt --port
8571`` — or ``zstts serve --from-export bundle/`` on a deployment host
that has only a ``zstts export`` bundle — plus the usual ``--bf16
--enc-f32 --wire-mulaw --gl-iters`` deployment knobs and the
``--max-body-mb / --max-frames`` admission caps. The default request
timeout is generous (15 min) because the FIRST request of each new
utterance-length bucket pays that bucket's XLA compile;
``--request-timeout`` tunes it.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from collections import deque
from concurrent import futures
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from zerospeech_tts_tpu.convert import units_text  # noqa: F401  (re-export: HTTP + file dumps share the format)
from zerospeech_tts_tpu.dsp.wavio import load_wav, resample, trim_silence

MAX_TARGETS = 16  # per request: bounds the per-target decode/GL program size


class _Request:
    """One utterance waiting for a dispatch."""

    __slots__ = ("wav", "key", "seq", "future")

    def __init__(self, wav: np.ndarray, key: tuple, seq: int):
        self.wav = wav
        self.key = key
        self.seq = seq
        self.future = Future()

    def result(self, timeout: float | None = None):
        try:
            return self.future.result(timeout)
        except futures.TimeoutError:  # 3.10: NOT an alias of builtin TimeoutError
            raise TimeoutError("conversion request timed out") from None


class ConversionService:
    """Micro-batching front over a warm :class:`~zerospeech_tts_tpu.convert.Converter`.

    ``speakers`` maps target speaker name -> id (the corpus speaker map).
    ``window_ms`` bounds added latency: after the first request of a
    batch arrives, the worker waits at most this long for companions.
    ``request_timeout`` is the default wait in :meth:`convert`; the
    first request per utterance-length bucket pays an XLA compile, so
    keep it generous.
    """

    def __init__(
        self,
        converter,
        speakers: dict[str, int],
        window_ms: float = 5.0,
        max_batch: int | None = None,
        request_timeout: float = 900.0,
        max_body_bytes: int = 64 << 20,
        max_frames: int = 32768,
    ):
        self.converter = converter
        self.speakers = dict(speakers)
        self.window_s = window_ms / 1000.0
        self.max_batch = max_batch or converter.batch_size
        self.request_timeout = request_timeout
        # admission control: one oversized upload would otherwise allocate
        # unbounded memory AND force a fresh length-bucket XLA compile that
        # head-of-line-blocks the single dispatch worker for every client
        self.max_body_bytes = max_body_bytes
        self.max_frames = max_frames  # 32768 = Pallas-GL ceiling (~6.8 min)
        self.dispatches = 0  # observability: one per program-batch run
        self.served = 0
        self._seq = 0
        self._queues: dict[tuple, deque[_Request]] = {}
        self._cv = threading.Condition()
        self._stopping = False
        self._worker = threading.Thread(
            target=self._worker_loop, name="zstts-dispatch", daemon=True
        )
        self._worker.start()

    # ------------------------------------------------------------- client

    def plan_key(self, targets) -> tuple:
        """Canonical batching key: sorted unique target names (the
        response is keyed by name, so order/duplicates carry no
        information — canonicalizing maximizes batch sharing)."""
        uniq = sorted(dict.fromkeys(targets))
        if len(uniq) > MAX_TARGETS:
            raise ValueError(
                f"{len(uniq)} target speakers in one request (max {MAX_TARGETS}); "
                "split the request"
            )
        for t in uniq:
            if t not in self.speakers:
                raise KeyError(f"unknown target speaker {t!r}")
        return tuple(uniq)

    def submit(self, wav: np.ndarray, targets, trim: bool = True) -> _Request:
        """Enqueue one utterance; returns a future-carrying request.
        ``targets=()`` means units-only (no synthesis)."""
        key = self.plan_key(targets)
        wav = np.asarray(wav, np.float32)
        if trim:
            wav = trim_silence(wav, self.converter.acfg.top_db)
        if len(wav) < self.converter.acfg.hop_length + 1:
            raise ValueError("utterance shorter than one frame after trim")
        from zerospeech_tts_tpu.dsp.audio import n_frames_for

        n_frames = n_frames_for(len(wav), self.converter.acfg)
        if self.max_frames and n_frames > self.max_frames:
            raise ValueError(
                f"utterance is {n_frames} frames, above the service cap "
                f"{self.max_frames} (each new length bucket compiles a new "
                "XLA program; split long audio client-side)"
            )
        with self._cv:
            if self._stopping:
                raise RuntimeError("service is shut down")
            req = _Request(wav, key, self._seq)
            self._seq += 1
            self._queues.setdefault(key, deque()).append(req)
            self._cv.notify_all()
        return req

    def convert(self, wav, targets, trim: bool = True, timeout: float | None = None):
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(wav, targets, trim=trim).result(
            self.request_timeout if timeout is None else timeout
        )

    def close(self) -> None:
        with self._cv:
            self._stopping = True
            self._cv.notify_all()
        self._worker.join(timeout=10)

    def warmup(self, bucket_frames: list[int], n_targets: int = 1) -> float:
        """Precompile the conversion programs for the given utterance-length
        buckets BEFORE the first client arrives: one dummy batch through the
        n_targets-wide program and the units-only program per bucket. Other
        target-set sizes still compile on first use (program shape depends
        on the COUNT of targets, not which ones). Returns seconds spent."""
        import time as _time

        conv = self.converter
        hop = conv.acfg.hop_length
        # one sorted(items) slice: ids and names must denote the SAME speakers
        pairs = sorted(self.speakers.items())[: max(1, n_targets)]
        tgt_names = [n for n, _ in pairs]
        tgt_ids = [i for _, i in pairs]
        t0 = _time.monotonic()
        for tb in bucket_frames:
            tb = -(-int(tb) // conv.bucket_frames) * conv.bucket_frames
            wav = np.zeros(tb * hop - 1, np.float32)
            wav[:: hop] = 0.1  # clicks: survives any future silence handling
            conv.convert_wavs_multi(
                [wav], tgt_ids,
                tgt_names=tgt_names if conv.stats is not None else None,
                trim=False,
            )
            conv.encode_units_from_wavs([wav], trim=False)
        return _time.monotonic() - t0

    # ------------------------------------------------------------- worker

    def _oldest_key(self):
        """Key whose head request has waited longest (FIFO across keys)."""
        best, best_seq = None, None
        for k, q in self._queues.items():
            if q and (best_seq is None or q[0].seq < best_seq):
                best, best_seq = k, q[0].seq
        return best

    def _worker_loop(self):
        while True:
            with self._cv:
                key = self._oldest_key()
                while key is None and not self._stopping:
                    self._cv.wait(timeout=0.1)
                    key = self._oldest_key()
                if key is None and self._stopping:
                    return
                # micro-batch window: gather same-key companions
                deadline = time.monotonic() + self.window_s
                q = self._queues[key]
                while len(q) < self.max_batch:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                batch = [q.popleft() for _ in range(min(len(q), self.max_batch))]
                if not q:
                    del self._queues[key]  # drained keys must not accumulate
            try:
                self._run(key, batch)
            except BaseException as batch_err:  # noqa: BLE001
                # one bad utterance must not poison co-batched clients:
                # retry solo. Input-shaped errors (ValueError/KeyError) are
                # per-request by construction and never stop the retries —
                # FIFO order must not decide whether healthy companions get
                # served. Other errors (OOM / compile / bug) are classified
                # systemic only after TWO distinct requests fail solo, at
                # which point replaying the rest would head-of-line-block
                # all other keys for up to max_batch compiles; fail fast.
                def _input_shaped(e: BaseException) -> bool:
                    return isinstance(e, (ValueError, KeyError))

                if len(batch) == 1:
                    # a solo batch IS its own solo retry: re-dispatching the
                    # identical program cannot change the outcome
                    batch[0].future.set_exception(batch_err)
                    continue
                systemic: BaseException | None = None
                solo_failures = 0
                for r in batch:
                    if r.future.done():
                        continue
                    if systemic is not None:
                        r.future.set_exception(systemic)
                        continue
                    try:
                        self._run(key, [r])
                        self.served += 1
                    except BaseException as solo_err:  # noqa: BLE001
                        r.future.set_exception(solo_err)
                        if not _input_shaped(solo_err):
                            solo_failures += 1
                            if solo_failures >= 2:
                                systemic = solo_err
            else:
                self.served += len(batch)

    def _run(self, key: tuple, batch: list[_Request]) -> None:
        conv = self.converter
        wavs = [r.wav for r in batch]
        if key == ():  # units-only plan
            units = conv.encode_units_from_wavs(wavs, trim=False)
            self.dispatches += 1
            results = [{"units": u} for u in units]
        else:
            spk_ids = [self.speakers[t] for t in key]
            units, wavs_out = conv.convert_wavs_multi(
                wavs,
                spk_ids,
                tgt_names=list(key) if conv.stats is not None else None,
                trim=False,
            )
            self.dispatches += 1
            results = [
                {"units": units[i], "wavs": {t: wavs_out[k][i] for k, t in enumerate(key)}}
                for i in range(len(batch))
            ]
        for r, res in zip(batch, results):  # all computed before any resolve
            r.future.set_result(res)


# ------------------------------------------------------------------ HTTP


def _wav_bytes(pcm16: np.ndarray, sr: int) -> bytes:
    import scipy.io.wavfile

    buf = io.BytesIO()
    scipy.io.wavfile.write(buf, sr, np.asarray(pcm16, np.int16))
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    service: ConversionService = None  # set by serve_http
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — http.server API
        path = urlparse(self.path).path
        svc = self.service
        if path == "/healthz":
            import jax

            self._json(
                200,
                {
                    "ok": True,
                    "platform": jax.devices()[0].platform,
                    "speakers": len(svc.speakers),
                    "dispatches": svc.dispatches,
                    "served": svc.served,
                },
            )
        elif path == "/speakers":
            self._json(200, {"speakers": sorted(svc.speakers)})
        else:
            self._json(404, {"error": f"unknown path {path}"})

    def _read_wav(self) -> np.ndarray:
        n = int(self.headers.get("Content-Length", 0))
        cap = self.service.max_body_bytes
        if cap and n > cap:
            # reject BEFORE reading: the unread body poisons keep-alive,
            # so drop the connection after responding
            self.close_connection = True
            raise ValueError(f"request body {n} bytes exceeds the {cap}-byte cap")
        body = self.rfile.read(n)
        sr = self.service.converter.acfg.sr
        if self.headers.get("Content-Type", "").startswith("application/json"):
            obj = json.loads(body)
            pcm = np.frombuffer(base64.b64decode(obj["pcm16_b64"]), np.int16)
            y = pcm.astype(np.float32) / 32768.0
            return resample(y, int(obj.get("sr", sr)), sr)
        return load_wav(io.BytesIO(body), sr)  # WAV container (any rate/width)

    def do_POST(self):  # noqa: N802 — http.server API
        url = urlparse(self.path)
        q = parse_qs(url.query)
        trim = q.get("trim", ["1"])[0].lower() not in ("0", "false", "no")
        try:
            wav = self._read_wav()
            if url.path == "/convert":
                targets = tuple(t for part in q.get("targets", []) for t in part.split(",") if t)
                if not targets:
                    self._json(400, {"error": "targets query parameter required"})
                    return
                res = self.service.convert(wav, targets, trim=trim)
                sr = self.service.converter.acfg.sr
                self._json(
                    200,
                    {
                        "units": units_text(res["units"]),
                        "wavs": {
                            t: base64.b64encode(_wav_bytes(w, sr)).decode()
                            for t, w in res["wavs"].items()
                        },
                    },
                )
            elif url.path == "/units":
                res = self.service.convert(wav, (), trim=trim)
                self._json(200, {"units": units_text(res["units"])})
            else:
                self._json(404, {"error": f"unknown path {url.path}"})
        except (KeyError, ValueError) as e:
            self._json(400, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 — surface to the client
            self._json(500, {"error": f"{type(e).__name__}: {e}"})


def serve_http(
    service: ConversionService, host: str = "127.0.0.1", port: int = 8571
) -> ThreadingHTTPServer:
    """Bind and return the server (caller runs serve_forever / shutdown)."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)
