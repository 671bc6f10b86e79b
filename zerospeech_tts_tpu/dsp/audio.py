"""Jitted audio frontend + Griffin-Lim vocoder.

Reference behavior being rebuilt (SURVEY.md §2 "Audio DSP"; ref
``preprocess.py:~20-80 get_spectrograms`` and ``utils.py:~80-180``
``spectrogram2wav`` / ``melspectrogram2wav`` / ``griffin_lim`` /
``invert_spectrogram``):

    load(16 kHz) -> trim -> preemphasis(0.97) -> STFT(1024, 200, 800)
    -> |mag| and 80-bin mel -> 20*log10(max(1e-5, x))
    -> clip((db - ref_db + max_db) / max_db, 1e-8, 1)

and the inverse: denormalize -> amp -> mag**power -> Griffin-Lim
-> inverse-STFT -> de-preemphasis.

TPU-first design decisions (NOT a librosa translation):

* Everything after wav decode is one jitted XLA program with static shapes
  (wavs are padded to hop-aligned buckets so the corpus compiles a bounded
  number of programs).
* The STFT has two interchangeable backends: ``fft`` (XLA rfft) and
  ``matmul`` (precomputed real-DFT basis => two [T,1024]x[1024,513] matmuls
  that run on the MXU; for a fixed n_fft this is the TPU-native formulation
  and it fuses with the window and the mel projection).
* Overlap-add in the inverse STFT is a static scatter-add (indices are
  compile-time constants), not a Python loop.
* Griffin-Lim is a ``lax.fori_loop`` carrying the complex spectrogram —
  fully on-device, batchable with vmap.
* De-preemphasis (an IIR y[n] = x[n] + p*y[n-1]) uses
  ``lax.associative_scan`` (log-depth linear-recurrence scan) instead of a
  serial per-sample loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zerospeech_tts_tpu.config import AudioConfig
from zerospeech_tts_tpu.dsp.mel import mel_filterbank, mel_inverse_basis

# ---------------------------------------------------------------------------
# static per-config constants (host numpy, cached; become XLA constants)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _window(cfg: AudioConfig) -> np.ndarray:
    """Periodic Hann of win_length, zero-padded centered to n_fft
    (librosa pads the window, not the frame)."""
    n = np.arange(cfg.win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / cfg.win_length)
    lpad = (cfg.n_fft - cfg.win_length) // 2
    out = np.zeros(cfg.n_fft, dtype=np.float64)
    out[lpad : lpad + cfg.win_length] = w
    return out.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _mel_basis(cfg: AudioConfig) -> np.ndarray:
    return mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.effective_fmax)


@functools.lru_cache(maxsize=8)
def _mel_pinv(cfg: AudioConfig) -> np.ndarray:
    return mel_inverse_basis(_mel_basis(cfg))


@functools.lru_cache(maxsize=8)
def _dft_basis(cfg: AudioConfig) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis: frames[T, n_fft] @ basis -> re/im[T, n_freq]."""
    n = np.arange(cfg.n_fft)[:, None]
    k = np.arange(cfg.n_freq)[None, :]
    ang = 2.0 * np.pi * n * k / cfg.n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _idft_basis(cfg: AudioConfig) -> tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT: re/im[T, n_freq] @ basis -> frames[T, n_fft].

    Hermitian-symmetry weights: interior bins count twice, DC/Nyquist once.
    """
    n = np.arange(cfg.n_fft)[None, :]
    k = np.arange(cfg.n_freq)[:, None]
    ang = 2.0 * np.pi * n * k / cfg.n_fft
    w = np.full((cfg.n_freq, 1), 2.0)
    w[0] = 1.0
    if cfg.n_fft % 2 == 0:
        w[-1] = 1.0
    scale = w / cfg.n_fft
    return (np.cos(ang) * scale).astype(np.float32), (-np.sin(ang) * scale).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _fused_bases(cfg: AudioConfig):
    """Window-folded real-DFT bases over the window support only.

    With win_length % hop == 0 the STFT needs just the win_length samples
    under the window: analysis basis = win * DFT rows restricted to the
    support; synthesis basis = inverse-DFT columns restricted to the
    support, pre-multiplied by the synthesis window. Everything else in the
    padded n_fft frame is zero, so the full transform becomes
    [T, win] x [win, n_freq] MXU matmuls with NO gathers or scatters.
    """
    assert cfg.win_length % cfg.hop_length == 0
    lpad = (cfg.n_fft - cfg.win_length) // 2
    sl = slice(lpad, lpad + cfg.win_length)
    win = _window(cfg).astype(np.float64)[sl]
    c, s = _dft_basis(cfg)
    ca = (win[:, None] * c[sl].astype(np.float64)).astype(np.float32)  # [win, n_freq]
    sa = (win[:, None] * s[sl].astype(np.float64)).astype(np.float32)
    ci, si = _idft_basis(cfg)
    cs = (ci.astype(np.float64)[:, sl] * win[None, :]).astype(np.float32)  # [n_freq, win]
    ss = (si.astype(np.float64)[:, sl] * win[None, :]).astype(np.float32)
    return ca, sa, cs, ss


@functools.lru_cache(maxsize=32)
def _fused_wss(cfg: AudioConfig, t: int) -> np.ndarray:
    """Window-square OLA envelope over the fused output span (constant)."""
    win = _window(cfg).astype(np.float64)
    lpad = (cfg.n_fft - cfg.win_length) // 2
    w2 = (win[lpad : lpad + cfg.win_length]) ** 2
    r = cfg.win_length // cfg.hop_length
    out_len = (t - 1 + r) * cfg.hop_length
    wss = np.zeros(out_len)
    idx = np.arange(t)[:, None] * cfg.hop_length + np.arange(cfg.win_length)[None, :]
    np.add.at(wss, idx, w2[None, :])
    wss = np.where(wss > 1e-11, wss, 1.0)
    return wss.astype(np.float32)


def _fused_segments(y: jnp.ndarray, cfg: AudioConfig, length=None) -> jnp.ndarray:
    """[n] signal -> [T, win_length] windowed-support segments using only
    static reshapes/slices (r = win/hop row-shifted views)."""
    n = y.shape[-1]
    t = n_frames_for(n, cfg)
    pad = cfg.n_fft // 2
    lpad = (cfg.n_fft - cfg.win_length) // 2
    ypad = mirror_pad(y, pad, length)
    ys = ypad[lpad:]
    r = cfg.win_length // cfg.hop_length
    rows_needed = (t - 1 + r) * cfg.hop_length
    if ys.shape[-1] < rows_needed:
        ys = jnp.pad(ys, (0, rows_needed - ys.shape[-1]))
    rows = ys[:rows_needed].reshape(t - 1 + r, cfg.hop_length)
    return jnp.concatenate([rows[k : k + t] for k in range(r)], axis=1)


def _fused_ola(frames: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """[T, win_length] synthesis-windowed frames -> signal via r static
    shifted adds (the scatter-free overlap-add)."""
    t = frames.shape[0]
    r = cfg.win_length // cfg.hop_length
    hop = cfg.hop_length
    acc = jnp.zeros((t - 1 + r, hop), frames.dtype)
    for k in range(r):
        acc = acc.at[k : k + t].add(frames[:, k * hop : (k + 1) * hop])
    y = acc.reshape(-1)
    y = y / jnp.asarray(_fused_wss(cfg, t))
    # trim back to the librosa istft span: remove the centering pad relative
    # to the window support start (n_fft//2 - lpad) and cut to (t-1)*hop
    lead = cfg.n_fft // 2 - (cfg.n_fft - cfg.win_length) // 2
    return y[lead : lead + (t - 1) * hop]


def n_frames_for(n_samples: int, cfg: AudioConfig) -> int:
    """librosa center=True frame count: 1 + n_samples // hop."""
    return 1 + n_samples // cfg.hop_length


def resolve_method(cfg: AudioConfig, method: str | None) -> str:
    """None -> pick the fastest valid backend: the gather/scatter-free
    window-folded matmul path when win_length % hop == 0, else FFT."""
    if method is not None:
        return method
    return "fused" if cfg.win_length % cfg.hop_length == 0 else "fft"


def pad_to_bucket(y: np.ndarray, cfg: AudioConfig, bucket_frames: int = 64) -> np.ndarray:
    """Zero-pad a wav to the CANONICAL length of its frame bucket — the
    maximum sample count yielding t_pad frames — so every wav in a bucket
    produces exactly one jit shape (never trims real samples)."""
    t = n_frames_for(len(y), cfg)
    t_pad = -(-t // bucket_frames) * bucket_frames
    target = t_pad * cfg.hop_length - 1  # longest signal with t_pad frames
    if target > len(y):
        y = np.concatenate([y, np.zeros(target - len(y), dtype=y.dtype)])
    return y


# ---------------------------------------------------------------------------
# core transforms (all traceable)
# ---------------------------------------------------------------------------


def preemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    return jnp.concatenate([y[:1], y[1:] - coef * y[:-1]])


def de_emphasis(x: jnp.ndarray, coef: float) -> jnp.ndarray:
    """Inverse of preemphasis: y[n] = x[n] + coef * y[n-1], as a log-depth
    associative scan of the linear recurrence (TPU-friendly; a serial
    per-sample loop over ~1e5 samples would bottleneck conversion)."""

    def combine(a, b):
        # elements are (decay, value): y = decay * y_prev + value
        return a[0] * b[0], b[0] * a[1] + b[1]

    decay = jnp.full_like(x, coef)
    _, y = jax.lax.associative_scan(combine, (decay, x))
    return y


def _frame_indices(n_samples_padded: int, n_frames: int, cfg: AudioConfig) -> np.ndarray:
    idx = np.arange(n_frames)[:, None] * cfg.hop_length + np.arange(cfg.n_fft)[None, :]
    assert idx.max() < n_samples_padded
    return idx


def mirror_pad(y: jnp.ndarray, pad: int, length=None) -> jnp.ndarray:
    """Center reflect-padding with an optional DYNAMIC true length.

    With ``length=None`` this is ``jnp.pad(y, (pad, pad), 'reflect')``. With a
    traced ``length`` (true sample count of a bucket-zero-padded signal) the
    output's first ``pad + length + pad`` positions equal
    ``np.pad(y[:length], (pad, pad), 'reflect')`` EXACTLY — the librosa
    center=True boundary semantics the reference frontend has
    (ref preprocess.py:~20-80) — regardless of how much zero bucket padding
    follows. Positions beyond that span hold the static reflect pad of the
    bucket-padded buffer (zeros/garbage); they feed only frames >= the true
    frame count, which callers slice off.
    """
    n = y.shape[-1]
    if length is None:
        return jnp.pad(y, (pad, pad), mode="reflect")
    L = jnp.maximum(jnp.asarray(length, jnp.int32), 2)
    period = 2 * (L - 1)  # edge-excluded reflection period (np.pad 'reflect')

    def zigzag(i):
        m = jnp.abs(i) % period
        j = jnp.minimum(m, period - m)
        return jnp.take(y, jnp.clip(j, 0, n - 1), axis=-1)

    # An earlier revision gathered the ENTIRE padded span through the zigzag
    # index map — a [n + 2*pad] computed gather per utterance that cost 33 ms
    # of the 90 ms batch-32 conversion program on a v5e (docs/
    # frontend_profile.json). Only 2*pad positions can ever differ from a
    # plain static reflect pad: the head pad (when L-1 < pad the static pad
    # folds about the BUFFER end, not the true length) and the first ``pad``
    # positions at/after the true end (static pad sees the zero bucket
    # padding there). True frames never read past L + pad - 1: frame i spans
    # signal coords [i*hop - pad, i*hop + pad) and the last true frame has
    # i = L // hop. So: static reflect pad + two pad-sized zigzag fix-ups
    # (head at a static offset, tail via a dynamic-start update) is EXACT for
    # every L >= 2 while gathering 2*pad instead of n + 2*pad elements.
    if n - 1 < pad:
        # buffer shorter than the pad: jnp.pad 'reflect' cannot fold more
        # than once — keep the full zigzag gather (tiny arrays only)
        return zigzag(jnp.arange(n + 2 * pad) - pad)
    ypad = jnp.pad(y, (pad, pad), mode="reflect")
    head = zigzag(jnp.arange(-pad, 0))
    tail = zigzag(L + jnp.arange(pad))
    ypad = jax.lax.dynamic_update_slice(ypad, head, (0,))
    return jax.lax.dynamic_update_slice(ypad, tail, (pad + L,))


def frame_signal(y: jnp.ndarray, cfg: AudioConfig, length=None) -> jnp.ndarray:
    """Center-padded framing: reflect-pad n_fft//2 each side (about the true
    ``length`` boundary when given), then gather static strided windows ->
    [n_frames, n_fft]."""
    n = y.shape[-1]
    t = n_frames_for(n, cfg)
    pad = cfg.n_fft // 2
    ypad = mirror_pad(y, pad, length)
    idx = _frame_indices(n + 2 * pad, t, cfg)
    return ypad[idx]


def stft(
    y: jnp.ndarray, cfg: AudioConfig, method: str = "fft", length=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """STFT -> (re, im), each [n_frames, n_freq] (time-major).

    Methods: ``fft`` (XLA rfft), ``matmul`` (real-DFT basis matmul), and
    ``fused`` (window-folded basis + static-slice framing: gather/scatter-
    free, the MXU speed-of-light path; requires win_length % hop == 0).

    ``length`` (traced, optional): true sample count of a bucket-padded
    signal — frames within the true span then match the exact-length
    transform bit-for-bit (see :func:`mirror_pad`).
    """
    if method == "fused":
        ca, sa, _, _ = _fused_bases(cfg)
        segs = _fused_segments(y, cfg, length)
        re = jnp.dot(segs, jnp.asarray(ca), preferred_element_type=jnp.float32)
        im = jnp.dot(segs, jnp.asarray(sa), preferred_element_type=jnp.float32)
        return re, im
    frames = frame_signal(y, cfg, length) * jnp.asarray(_window(cfg))
    if method == "fft":
        spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
        return jnp.real(spec).astype(jnp.float32), jnp.imag(spec).astype(jnp.float32)
    if method == "matmul":
        c, s = _dft_basis(cfg)
        re = jnp.dot(frames, jnp.asarray(c), preferred_element_type=jnp.float32)
        im = jnp.dot(frames, jnp.asarray(s), preferred_element_type=jnp.float32)
        return re, im
    raise ValueError(f"unknown stft method {method!r}")


def istft(re: jnp.ndarray, im: jnp.ndarray, cfg: AudioConfig, method: str = "fft") -> jnp.ndarray:
    """Inverse STFT with window-sum normalization; trims the center padding.
    Output length = (n_frames - 1) * hop."""
    t = re.shape[0]
    if method == "fused":
        _, _, cs, ss = _fused_bases(cfg)
        frames = jnp.dot(re, jnp.asarray(cs), preferred_element_type=jnp.float32) + jnp.dot(
            im, jnp.asarray(ss), preferred_element_type=jnp.float32
        )
        return _fused_ola(frames, cfg)
    if method == "fft":
        frames = jnp.fft.irfft(re + 1j * im, n=cfg.n_fft, axis=-1).astype(jnp.float32)
    elif method == "matmul":
        ci, si = _idft_basis(cfg)
        frames = jnp.dot(re, jnp.asarray(ci), preferred_element_type=jnp.float32) + jnp.dot(
            im, jnp.asarray(si), preferred_element_type=jnp.float32
        )
    else:
        raise ValueError(f"unknown istft method {method!r}")

    win = np.asarray(_window(cfg))
    frames = frames * jnp.asarray(win)

    out_len = (t - 1) * cfg.hop_length + cfg.n_fft
    idx = _frame_indices(out_len, t, cfg)
    y = jnp.zeros(out_len, dtype=jnp.float32).at[idx].add(frames)

    # window-square overlap-add envelope is a compile-time constant
    wss = np.zeros(out_len, dtype=np.float64)
    np.add.at(wss, _frame_indices(out_len, t, cfg), (win.astype(np.float64) ** 2)[None, :])
    wss = np.where(wss > 1e-11, wss, 1.0).astype(np.float32)
    y = y / jnp.asarray(wss)

    pad = cfg.n_fft // 2
    return y[pad:-pad]


def amp_to_db_norm(amp: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """20*log10(max(1e-5, amp)) then [0,1] normalization (ref preprocess)."""
    db = 20.0 * jnp.log10(jnp.maximum(1e-5, amp))
    return jnp.clip((db - cfg.ref_db + cfg.max_db) / cfg.max_db, 1e-8, 1.0)


def db_norm_to_amp(x: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    db = jnp.clip(x, 0.0, 1.0) * cfg.max_db - cfg.max_db + cfg.ref_db
    return jnp.power(10.0, db * 0.05)


# ---------------------------------------------------------------------------
# frontend: wav -> (mel, mag) features
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "method"))
def wav_to_features(y: jnp.ndarray, cfg: AudioConfig, method: str | None = None, length=None):
    """Jitted frontend: preemphasized wav -> (mel[T, n_mels], mag[T, n_freq]),
    both dB-normalized to [0, 1]. method=None auto-selects the Pallas fused
    kernel on TPU (ops.pallas_frontend, ~20x the XLA path on-chip), the
    matmul 'fused' path elsewhere.

    ``length`` (traced, optional): true sample count when ``y`` carries
    zero bucket padding — the true frames then equal the exact-length
    frontend bit-for-bit (reference tail semantics; frames past the true
    count are fold garbage the caller slices off)."""
    if method is None and jax.default_backend() == "tpu" and cfg.win_length % cfg.hop_length == 0:
        method = "pallas"
    if method == "pallas":
        from zerospeech_tts_tpu.ops.pallas_frontend import wav_to_features_pallas

        return wav_to_features_pallas(y, cfg, length=length)
    method = resolve_method(cfg, method)
    yp = preemphasis(y, cfg.preemphasis)
    re, im = stft(yp, cfg, method=method, length=length)
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    mel = jnp.dot(mag, jnp.asarray(_mel_basis(cfg)).T, preferred_element_type=jnp.float32)
    return amp_to_db_norm(mel, cfg), amp_to_db_norm(mag, cfg)


def get_spectrograms(
    y: np.ndarray,
    cfg: AudioConfig,
    bucket_frames: int = 64,
    method: str | None = None,
    sync: bool = True,
):
    """Host entry point matching the reference ``get_spectrograms`` contract
    (ref preprocess.py:~20-80): trimmed float wav -> (mel[T,80], mag[T,513])
    as numpy. Pads to a frame bucket to bound jit recompiles, then slices
    back to the true frame count; the true length rides along as a traced
    scalar so the tail frames keep exact librosa center=True reflection
    semantics despite the zero padding. ``sync=False`` returns lazily-sliced
    DEVICE arrays instead — the corpus-build pipeline defers the
    device->host readback so dispatches overlap transfers."""
    t_true = n_frames_for(len(y), cfg)
    ypad = pad_to_bucket(np.asarray(y, dtype=np.float32), cfg, bucket_frames)
    mel, mag = wav_to_features(jnp.asarray(ypad), cfg, method=method, length=len(y))
    if not sync:
        return mel[:t_true], mag[:t_true]
    return np.asarray(mel)[:t_true], np.asarray(mag)[:t_true]


# ---------------------------------------------------------------------------
# Griffin-Lim vocoder
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "n_iters", "method"))
def griffin_lim(
    mag: jnp.ndarray, cfg: AudioConfig, n_iters: int | None = None, method: str | None = None
) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction (ref utils.py griffin_lim).

    mag: linear-amplitude magnitudes, time-major [n_frames, n_freq].
    Returns the time signal, length (n_frames - 1) * hop.

    Zero-phase init; each iteration is istft -> stft -> phase projection,
    carried through ``lax.fori_loop`` so the whole vocoder is one XLA loop.
    With cfg.gl_momentum > 0 this is the accelerated ("fast") Griffin-Lim
    of Perraudin et al. 2013 — markedly better magnitude consistency at the
    same iteration count (the reference runs plain GL; set gl_momentum=0
    for that behavior).
    """
    if method == "pallas":
        from zerospeech_tts_tpu.ops.pallas_gl import griffin_lim_pallas

        return griffin_lim_pallas(mag, cfg, n_iters=n_iters)
    method = resolve_method(cfg, method)
    n_iters = cfg.gl_iters if n_iters is None else n_iters
    alpha = cfg.gl_momentum

    def project(re, im):
        x = istft(re, im, cfg, method=method)
        er, ei = stft(x, cfg, method=method)
        norm = jnp.maximum(jnp.sqrt(er * er + ei * ei), 1e-8)
        return mag * er / norm, mag * ei / norm

    def body(_, carry):
        cre, cim, tre, tim = carry
        nre, nim = project(cre, cim)
        # extrapolate in the complex-spectrogram domain
        cre2 = nre + alpha * (nre - tre)
        cim2 = nim + alpha * (nim - tim)
        return cre2, cim2, nre, nim

    zero = jnp.zeros_like(mag)
    cre, cim, _, _ = jax.lax.fori_loop(0, n_iters, body, (mag, zero, mag, zero))
    re, im = project(cre, cim)
    return istft(re, im, cfg, method=method)


@functools.partial(jax.jit, static_argnames=("cfg", "n_iters", "method"))
def spectrogram2wav(
    mag_norm: jnp.ndarray, cfg: AudioConfig, n_iters: int | None = None, method: str | None = None
) -> jnp.ndarray:
    """Normalized linear spectrogram [T, n_freq] -> wav (ref utils.py
    spectrogram2wav): denormalize -> amp -> **power -> Griffin-Lim ->
    de-preemphasis."""
    amp = db_norm_to_amp(mag_norm, cfg) ** cfg.gl_power
    y = griffin_lim(amp, cfg, n_iters=n_iters, method=method)
    return de_emphasis(y, cfg.preemphasis)


@functools.partial(jax.jit, static_argnames=("cfg", "n_iters", "method"))
def melspectrogram2wav(
    mel_norm: jnp.ndarray, cfg: AudioConfig, n_iters: int | None = None, method: str | None = None
) -> jnp.ndarray:
    """Normalized mel spectrogram [T, n_mels] -> wav via pinv(mel_basis)
    lift to linear frequency, then the spectrogram2wav path (ref utils.py
    melspectrogram2wav, M)."""
    amp_mel = db_norm_to_amp(mel_norm, cfg)
    amp = jnp.maximum(
        jnp.dot(amp_mel, jnp.asarray(_mel_pinv(cfg)).T, preferred_element_type=jnp.float32), 1e-10
    )
    y = griffin_lim(amp**cfg.gl_power, cfg, n_iters=n_iters, method=method)
    return de_emphasis(y, cfg.preemphasis)
