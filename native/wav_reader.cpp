// Native corpus-decode fast path (the reference's preprocess corpus loop is
// its slowest stage — SURVEY.md §3.1; the reference has no native code, this
// is the rebuild's host-side runtime component).
//
// Exposes a C ABI consumed via ctypes from
// zerospeech_tts_tpu/data/native.py:
//   wr_decode(path, out, max_len, target_sr)        -> n_samples or -errno
//   wr_trim(y, n, top_db, frame_len, hop, &s, &e)   -> 0
//
// Decoding: RIFF/WAVE PCM8/PCM16/PCM32/IEEE-float32, multi-channel
// mono-mix, polyphase-free linear resampling (corpus wavs are already
// 16 kHz; resampling is a compatibility path, parity-checked against the
// scipy fallback only for tolerance). Trimming mirrors
// dsp/wavio.trim_silence (librosa.effects.trim semantics) exactly.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

static float read_sample(const uint8_t* p, uint16_t fmt, uint16_t bits) {
    if (fmt == 3) {  // IEEE float
        float v;
        std::memcpy(&v, p, 4);
        return v;
    }
    switch (bits) {
        case 8:
            return (static_cast<int>(p[0]) - 128) / 128.0f;
        case 16: {
            int16_t v;
            std::memcpy(&v, p, 2);
            return v / 32768.0f;
        }
        case 24: {
            int32_t v = (p[0] << 8) | (p[1] << 16) | (static_cast<int8_t>(p[2]) << 24);
            return (v >> 8) / 8388608.0f;
        }
        case 32: {
            int32_t v;
            std::memcpy(&v, p, 4);
            return v / 2147483648.0f;
        }
        default:
            return 0.0f;
    }
}

// Decode a wav file to mono float32 at target_sr. Returns sample count,
// or a negative error code (-1 open, -2 parse, -3 format, -4 overflow).
int wr_decode(const char* path, float* out, int64_t max_len, int target_sr) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;

    uint8_t hdr[12];
    if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) ||
        std::memcmp(hdr + 8, "WAVE", 4)) {
        std::fclose(f);
        return -2;
    }

    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t sr = 0;
    std::vector<uint8_t> data;

    uint8_t chunk[8];
    while (std::fread(chunk, 1, 8, f) == 8) {
        uint32_t size;
        std::memcpy(&size, chunk + 4, 4);
        if (!std::memcmp(chunk, "fmt ", 4)) {
            std::vector<uint8_t> buf(size);
            if (std::fread(buf.data(), 1, size, f) != size) break;
            if (size < 16) {  // legacy WAVEFORMAT without wBitsPerSample
                std::fclose(f);
                return -3;
            }
            std::memcpy(&fmt, buf.data(), 2);
            std::memcpy(&channels, buf.data() + 2, 2);
            std::memcpy(&sr, buf.data() + 4, 4);
            std::memcpy(&bits, buf.data() + 14, 2);
            if (fmt == 0xFFFE && size >= 26) std::memcpy(&fmt, buf.data() + 24, 2);
        } else if (!std::memcmp(chunk, "data", 4)) {
            data.resize(size);
            size_t got = std::fread(data.data(), 1, size, f);
            data.resize(got);
            break;
        } else {
            std::fseek(f, (size + 1) & ~1u, SEEK_CUR);
        }
    }
    std::fclose(f);

    if (!sr || !channels || !bits || data.empty()) return -3;
    if (fmt != 1 && fmt != 3) return -3;

    const int bytes = bits / 8;
    const int64_t n_in = static_cast<int64_t>(data.size()) / (bytes * channels);

    if (static_cast<int>(sr) == target_sr) {
        if (n_in > max_len) return -4;
        for (int64_t i = 0; i < n_in; ++i) {
            float acc = 0.0f;
            for (int c = 0; c < channels; ++c)
                acc += read_sample(data.data() + (i * channels + c) * bytes, fmt, bits);
            out[i] = acc / channels;
        }
        return static_cast<int>(n_in);
    }

    // linear resample
    const double ratio = static_cast<double>(target_sr) / sr;
    const int64_t n_out = static_cast<int64_t>(n_in * ratio);
    if (n_out > max_len) return -4;
    for (int64_t i = 0; i < n_out; ++i) {
        double pos = i / ratio;
        int64_t i0 = static_cast<int64_t>(pos);
        int64_t i1 = i0 + 1 < n_in ? i0 + 1 : i0;
        double w = pos - i0;
        float a = 0.0f, b = 0.0f;
        for (int c = 0; c < channels; ++c) {
            a += read_sample(data.data() + (i0 * channels + c) * bytes, fmt, bits);
            b += read_sample(data.data() + (i1 * channels + c) * bytes, fmt, bits);
        }
        out[i] = static_cast<float>((a * (1.0 - w) + b * w) / channels);
    }
    return static_cast<int>(n_out);
}

// librosa.effects.trim semantics, mirroring dsp/wavio.trim_silence: frame
// RMS (center-padded), dB relative to peak RMS, keep frames above -top_db.
// Writes [start, end) sample bounds.
int wr_trim(const float* y, int64_t n, float top_db, int frame_length, int hop_length,
            int64_t* start, int64_t* end) {
    if (n <= 0) {
        *start = 0;
        *end = 0;
        return 0;
    }
    const int64_t n_frames = 1 + n / hop_length;
    const int64_t pad = frame_length / 2;
    std::vector<double> rms(n_frames);
    double peak = 0.0;
    for (int64_t t = 0; t < n_frames; ++t) {
        double acc = 0.0;
        const int64_t base = t * hop_length - pad;  // center-padded window start
        for (int k = 0; k < frame_length; ++k) {
            const int64_t i = base + k;
            const double v = (i >= 0 && i < n) ? y[i] : 0.0;
            acc += v * v;
        }
        rms[t] = std::sqrt(acc / frame_length);
        if (rms[t] > peak) peak = rms[t];
    }
    if (peak < 1e-10) peak = 1e-10;
    int64_t first = -1, last = -1;
    for (int64_t t = 0; t < n_frames; ++t) {
        const double db = 20.0 * std::log10((rms[t] > 1e-10 ? rms[t] : 1e-10) / peak);
        if (db > -top_db) {
            if (first < 0) first = t;
            last = t;
        }
    }
    if (first < 0) {
        *start = 0;
        *end = 0;
        return 0;
    }
    *start = first * hop_length;
    int64_t e = (last + 1) * hop_length;
    *end = e < n ? e : n;
    return 0;
}

}  // extern "C"
