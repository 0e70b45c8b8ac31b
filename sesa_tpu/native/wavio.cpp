// Native WAV codec + sample-format conversion for the host I/O path.
//
// The reference's native speed comes from external libraries (libsndfile
// via python-soundfile, ffmpeg — SURVEY.md §2.3). This is the TPU build's
// first-party replacement for the WAV portion: RIFF parse/write with
// PCM16/PCM24/PCM32/FLOAT32 payloads, de/interleaving to channel-major
// float32 (the layout the device pipeline consumes), exposed over a C ABI
// consumed with ctypes (sesa_tpu/native/__init__.py).
//
// Build: g++ -O3 -shared -fPIC -o libsesawav.so wavio.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

#pragma pack(push, 1)
struct RiffHeader {
    char riff[4];
    uint32_t size;
    char wave[4];
};
struct ChunkHeader {
    char id[4];
    uint32_t size;
};
struct FmtChunk {
    uint16_t format;       // 1 = PCM, 3 = IEEE float
    uint16_t channels;
    uint32_t sample_rate;
    uint32_t byte_rate;
    uint16_t block_align;
    uint16_t bits;
};
#pragma pack(pop)

constexpr float kInv16 = 1.0f / 32768.0f;
constexpr float kInv24 = 1.0f / 8388608.0f;
constexpr float kInv32 = 1.0f / 2147483648.0f;

inline float clip1(float v) {
    return v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
}

// Parse RIFF/fmt/data headers; leaves the stream at the first data byte.
// Returns 0 on success and fills fmt/data_size.
int parse_header(FILE* f, FmtChunk* fmt, uint32_t* data_size) {
    RiffHeader rh;
    if (std::fread(&rh, sizeof(rh), 1, f) != 1 ||
        std::memcmp(rh.riff, "RIFF", 4) || std::memcmp(rh.wave, "WAVE", 4)) {
        return -2;
    }
    *data_size = 0;
    ChunkHeader ch;
    while (std::fread(&ch, sizeof(ch), 1, f) == 1) {
        if (!std::memcmp(ch.id, "fmt ", 4)) {
            uint32_t n = ch.size < sizeof(*fmt) ? ch.size : sizeof(*fmt);
            if (std::fread(fmt, n, 1, f) != 1) return -3;
            if (ch.size > n) std::fseek(f, ch.size - n, SEEK_CUR);
        } else if (!std::memcmp(ch.id, "data", 4)) {
            *data_size = ch.size;
            return 0;
        } else {
            std::fseek(f, (ch.size + 1) & ~1u, SEEK_CUR);
        }
    }
    return -4;
}

// De-interleave `frames` frames of raw payload into channel-major float32.
int deinterleave(const uint8_t* raw, float* out, const FmtChunk& fmt,
                 int64_t frames) {
    const int chn = fmt.channels;
    for (int c = 0; c < chn; ++c) {
        float* dst = out + (size_t)c * frames;
        if (fmt.format == 3 && fmt.bits == 32) {
            const float* src = reinterpret_cast<const float*>(raw);
            for (int64_t i = 0; i < frames; ++i) dst[i] = src[i * chn + c];
        } else if (fmt.bits == 16) {
            const int16_t* src = reinterpret_cast<const int16_t*>(raw);
            for (int64_t i = 0; i < frames; ++i) dst[i] = src[i * chn + c] * kInv16;
        } else if (fmt.bits == 24) {
            for (int64_t i = 0; i < frames; ++i) {
                const uint8_t* p = raw + ((size_t)i * chn + c) * 3;
                int32_t v = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                                      (uint32_t)p[2] << 24) >> 8;
                dst[i] = v * kInv24;
            }
        } else if (fmt.bits == 32 && fmt.format == 1) {
            const int32_t* src = reinterpret_cast<const int32_t*>(raw);
            for (int64_t i = 0; i < frames; ++i) dst[i] = src[i * chn + c] * kInv32;
        } else {
            return -6;
        }
    }
    return 0;
}

// Interleave channel-major float32 into the raw payload format.
void interleave(const float* data, uint8_t* raw, int32_t channels,
                int64_t frames, int32_t subtype) {
    for (int c = 0; c < channels; ++c) {
        const float* src = data + (size_t)c * frames;
        if (subtype == 0) {
            float* dst = reinterpret_cast<float*>(raw);
            for (int64_t i = 0; i < frames; ++i) dst[i * channels + c] = src[i];
        } else if (subtype == 1) {
            int16_t* dst = reinterpret_cast<int16_t*>(raw);
            for (int64_t i = 0; i < frames; ++i)
                dst[i * channels + c] = (int16_t)(clip1(src[i]) * 32767.0f);
        } else {
            uint8_t* dst = raw;
            for (int64_t i = 0; i < frames; ++i) {
                int32_t v = (int32_t)(clip1(src[i]) * 8388607.0f);
                uint8_t* p = dst + ((size_t)i * channels + c) * 3;
                p[0] = (uint8_t)(v & 0xff);
                p[1] = (uint8_t)((v >> 8) & 0xff);
                p[2] = (uint8_t)((v >> 16) & 0xff);
            }
        }
    }
}

}  // namespace

extern "C" {

// Probe a wav file: fills channels, sample_rate, frames. Returns 0 on ok.
int sesa_wav_info(const char* path, int32_t* channels, int32_t* sample_rate,
                  int64_t* frames) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    FmtChunk fmt{};
    uint32_t data_size = 0;
    int rc = parse_header(f, &fmt, &data_size);
    std::fclose(f);
    if (rc != 0) return rc;
    if (!fmt.channels || !fmt.bits || !data_size) return -4;
    *channels = fmt.channels;
    *sample_rate = (int32_t)fmt.sample_rate;
    *frames = (int64_t)data_size / (fmt.channels * (fmt.bits / 8));
    return 0;
}

// Read into caller-allocated channel-major float32 buffer (channels*frames).
int sesa_wav_read(const char* path, float* out, int64_t max_frames) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    FmtChunk fmt{};
    uint32_t data_size = 0;
    int rc = parse_header(f, &fmt, &data_size);
    if (rc != 0) { std::fclose(f); return rc; }
    if (!data_size) { std::fclose(f); return -4; }

    const int chn = fmt.channels;
    const int bytes = fmt.bits / 8;
    int64_t frames = (int64_t)data_size / (chn * bytes);
    if (frames > max_frames) frames = max_frames;

    std::vector<uint8_t> raw((size_t)frames * chn * bytes);
    if (std::fread(raw.data(), 1, raw.size(), f) != raw.size()) {
        std::fclose(f);
        return -5;
    }
    std::fclose(f);
    if (deinterleave(raw.data(), out, fmt, frames) != 0) return -6;
    return (int)chn;
}

// Write channel-major float32 (channels*frames) as wav.
// subtype: 0 = FLOAT32, 1 = PCM16, 2 = PCM24
int sesa_wav_write(const char* path, const float* data, int32_t channels,
                   int64_t frames, int32_t sample_rate, int32_t subtype) {
    const int bytes = subtype == 0 ? 4 : (subtype == 1 ? 2 : 3);
    const uint32_t data_size = (uint32_t)(frames * channels * bytes);

    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;

    RiffHeader rh{{'R', 'I', 'F', 'F'},
                  36 + data_size,
                  {'W', 'A', 'V', 'E'}};
    ChunkHeader fmt_h{{'f', 'm', 't', ' '}, 16};
    FmtChunk fmt{};
    fmt.format = subtype == 0 ? 3 : 1;
    fmt.channels = (uint16_t)channels;
    fmt.sample_rate = (uint32_t)sample_rate;
    fmt.bits = (uint16_t)(bytes * 8);
    fmt.block_align = (uint16_t)(channels * bytes);
    fmt.byte_rate = fmt.sample_rate * fmt.block_align;
    ChunkHeader data_h{{'d', 'a', 't', 'a'}, data_size};

    std::fwrite(&rh, sizeof(rh), 1, f);
    std::fwrite(&fmt_h, sizeof(fmt_h), 1, f);
    std::fwrite(&fmt, sizeof(fmt), 1, f);
    std::fwrite(&data_h, sizeof(data_h), 1, f);

    std::vector<uint8_t> raw((size_t)frames * channels * bytes);
    interleave(data, raw.data(), channels, frames, subtype);
    std::fwrite(raw.data(), 1, raw.size(), f);
    std::fclose(f);
    return 0;
}

// Windowed read: `nframes` frames starting at `start` into channel-major
// float32 (channels * nframes). Returns frames actually read (>=0) or <0.
int64_t sesa_wav_read_at(const char* path, float* out, int64_t start,
                         int64_t nframes) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    FmtChunk fmt{};
    uint32_t data_size = 0;
    int rc = parse_header(f, &fmt, &data_size);
    if (rc != 0) { std::fclose(f); return rc; }

    const int chn = fmt.channels;
    const int bytes = fmt.bits / 8;
    const int64_t total = (int64_t)data_size / (chn * bytes);
    if (start < 0 || start >= total) { std::fclose(f); return 0; }
    int64_t frames = nframes;
    if (start + frames > total) frames = total - start;

    std::fseek(f, (long)(start * chn * bytes), SEEK_CUR);
    std::vector<uint8_t> raw((size_t)frames * chn * bytes);
    if (std::fread(raw.data(), 1, raw.size(), f) != raw.size()) {
        std::fclose(f);
        return -5;
    }
    std::fclose(f);
    if (deinterleave(raw.data(), out, fmt, frames) != 0) return -6;
    return frames;
}

// Incremental writer: open once, append chunks, patch sizes on close.
struct SesaWavWriter {
    FILE* f;
    int32_t channels;
    int32_t subtype;
    int64_t frames;
};

void* sesa_wav_writer_open(const char* path, int32_t channels,
                           int32_t sample_rate, int32_t subtype) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return nullptr;
    const int bytes = subtype == 0 ? 4 : (subtype == 1 ? 2 : 3);
    RiffHeader rh{{'R', 'I', 'F', 'F'}, 36, {'W', 'A', 'V', 'E'}};
    ChunkHeader fmt_h{{'f', 'm', 't', ' '}, 16};
    FmtChunk fmt{};
    fmt.format = subtype == 0 ? 3 : 1;
    fmt.channels = (uint16_t)channels;
    fmt.sample_rate = (uint32_t)sample_rate;
    fmt.bits = (uint16_t)(bytes * 8);
    fmt.block_align = (uint16_t)(channels * bytes);
    fmt.byte_rate = fmt.sample_rate * fmt.block_align;
    ChunkHeader data_h{{'d', 'a', 't', 'a'}, 0};
    std::fwrite(&rh, sizeof(rh), 1, f);
    std::fwrite(&fmt_h, sizeof(fmt_h), 1, f);
    std::fwrite(&fmt, sizeof(fmt), 1, f);
    std::fwrite(&data_h, sizeof(data_h), 1, f);
    return new SesaWavWriter{f, channels, subtype, 0};
}

int sesa_wav_writer_write(void* handle, const float* data, int64_t frames) {
    auto* w = static_cast<SesaWavWriter*>(handle);
    if (!w || !w->f) return -1;
    const int bytes = w->subtype == 0 ? 4 : (w->subtype == 1 ? 2 : 3);
    std::vector<uint8_t> raw((size_t)frames * w->channels * bytes);
    interleave(data, raw.data(), w->channels, frames, w->subtype);
    if (std::fwrite(raw.data(), 1, raw.size(), w->f) != raw.size()) return -2;
    w->frames += frames;
    return 0;
}

int sesa_wav_writer_close(void* handle) {
    auto* w = static_cast<SesaWavWriter*>(handle);
    if (!w) return -1;
    const int bytes = w->subtype == 0 ? 4 : (w->subtype == 1 ? 2 : 3);
    const uint32_t data_size = (uint32_t)(w->frames * w->channels * bytes);
    // patch RIFF size (offset 4) and data chunk size (offset 40)
    std::fseek(w->f, 4, SEEK_SET);
    uint32_t riff_size = 36 + data_size;
    std::fwrite(&riff_size, 4, 1, w->f);
    std::fseek(w->f, 40, SEEK_SET);
    std::fwrite(&data_size, 4, 1, w->f);
    std::fclose(w->f);
    delete w;
    return 0;
}

}  // extern "C"
