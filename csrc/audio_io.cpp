// Native audio IO for the data plane: WAV parsing, PCM conversion and
// polyphase resampling, multithreaded batch loading.
//
// Replaces the reference stack's external binary deps on the host data path
// (ffmpeg decode + torchaudio resample feeding per-utterance feature
// extraction, SURVEY.md §2.8) with an in-process C++ loader exposed over a
// plain C ABI (ctypes binding in fangyan_tts_tpu/data/native.py — no
// pybind11 in this image).
//
// Build: csrc/build.sh  ->  csrc/libfangyan_audio.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdio>
#include <vector>
#include <thread>
#include <atomic>

extern "C" {

// Parse a RIFF/WAVE buffer (PCM 8/16/24/32-bit or float32) into mono
// float32. Returns number of samples written (capped at max_out), or -1 on
// parse error. *sample_rate_out receives the file's rate.
int64_t parse_wav(const uint8_t* buf, int64_t len, float* out, int64_t max_out,
                  int32_t* sample_rate_out) {
    if (len < 44 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
        return -1;
    int64_t pos = 12;
    int16_t fmt = 0, channels = 0, bits = 0;
    int32_t rate = 0;
    const uint8_t* data = nullptr;
    int64_t data_len = 0;
    while (pos + 8 <= len) {
        const uint8_t* hdr = buf + pos;
        uint32_t chunk_len;
        memcpy(&chunk_len, hdr + 4, 4);
        // Chunk payloads are untrusted: verify the bytes we read fit in the
        // buffer (a truncated 'fmt ' header near the end must not read OOB).
        if (memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16 && pos + 8 + 16 <= len) {
            memcpy(&fmt, hdr + 8, 2);
            memcpy(&channels, hdr + 10, 2);
            memcpy(&rate, hdr + 12, 4);
            memcpy(&bits, hdr + 22, 2);
        } else if (memcmp(hdr, "data", 4) == 0) {
            data = hdr + 8;
            data_len = chunk_len;
            if (pos + 8 + data_len > len) data_len = len - pos - 8;
        }
        pos += 8 + chunk_len + (chunk_len & 1);
    }
    if (!data || channels <= 0 || rate <= 0) return -1;
    *sample_rate_out = rate;

    const int64_t frame_bytes = (int64_t)channels * (bits / 8);
    if (frame_bytes <= 0) return -1;
    int64_t frames = data_len / frame_bytes;
    if (frames > max_out) frames = max_out;
    const double inv_ch = 1.0 / channels;

    for (int64_t i = 0; i < frames; i++) {
        double acc = 0.0;
        for (int c = 0; c < channels; c++) {
            const uint8_t* p = data + i * frame_bytes + c * (bits / 8);
            double v = 0.0;
            if (fmt == 3 && bits == 32) {  // IEEE float
                float f; memcpy(&f, p, 4); v = f;
            } else if (bits == 16) {
                int16_t s; memcpy(&s, p, 2); v = s / 32768.0;
            } else if (bits == 32) {
                int32_t s; memcpy(&s, p, 4); v = s / 2147483648.0;
            } else if (bits == 24) {
                int32_t s = (p[0] | (p[1] << 8) | (p[2] << 16));
                if (s >= (1 << 23)) s -= (1 << 24);
                v = s / 8388608.0;
            } else if (bits == 8) {
                v = ((int)p[0] - 128) / 128.0;
            }
            acc += v;
        }
        out[i] = (float)(acc * inv_ch);
    }
    return frames;
}

// Polyphase resampling: y[j] = sum_k h[k] * x_up[j*down - k] where x_up is
// the zero-stuffed signal. h has n_taps (odd, centered), already scaled for
// unit DC gain per branch. Returns output length.
int64_t resample_poly(const float* x, int64_t n, float* y, int64_t max_out,
                      const float* h, int64_t n_taps, int32_t up, int32_t down) {
    const int64_t half = n_taps / 2;
    const int64_t out_len = (n * up) / down;
    const int64_t m = out_len < max_out ? out_len : max_out;
    for (int64_t j = 0; j < m; j++) {
        // center of filter aligned like np.convolve(mode='same') on the
        // zero-stuffed signal: up_idx = j*down corresponds to x[(j*down)/up]
        const int64_t center = j * down;
        double acc = 0.0;
        // x_up[t] != 0 only when t % up == 0 -> t = i*up
        // we need h[center + half - t] for t in [center-half, center+half]
        int64_t t_lo = center - half;
        if (t_lo < 0) t_lo = 0;
        int64_t i_lo = (t_lo + up - 1) / up;
        int64_t t_hi = center + half;
        int64_t i_hi = t_hi / up;
        int64_t n_max = n - 1;
        if (i_hi > n_max) i_hi = n_max;
        for (int64_t i = i_lo; i <= i_hi; i++) {
            const int64_t k = center + half - i * up;  // index into h
            if (k >= 0 && k < n_taps) acc += (double)h[k] * x[i];
        }
        y[j] = (float)acc;
    }
    return m;
}

struct BatchJob {
    const char** paths;
    float* out;         // (batch, max_samples) row-major
    int64_t* lengths;   // (batch,)
    int32_t* rates;     // (batch,)
    int64_t max_samples;
    int64_t max_file_bytes;
    std::atomic<int64_t> next{0};
    int64_t count;
};

static void batch_worker(BatchJob* job) {
    std::vector<uint8_t> buf;
    for (;;) {
        int64_t i = job->next.fetch_add(1);
        if (i >= job->count) return;
        job->lengths[i] = 0;
        job->rates[i] = 0;
        FILE* f = fopen(job->paths[i], "rb");
        if (!f) continue;
        fseek(f, 0, SEEK_END);
        long sz = ftell(f);
        fseek(f, 0, SEEK_SET);
        if (sz <= 0 || sz > job->max_file_bytes) { fclose(f); continue; }
        buf.resize(sz);
        size_t rd = fread(buf.data(), 1, sz, f);
        fclose(f);
        if ((long)rd != sz) continue;
        int32_t rate = 0;
        int64_t nsamp = parse_wav(buf.data(), sz, job->out + i * job->max_samples,
                                  job->max_samples, &rate);
        if (nsamp > 0) {
            job->lengths[i] = nsamp;
            job->rates[i] = rate;
        }
    }
}

// Load a batch of WAV files into a preallocated (count, max_samples) float32
// buffer using `threads` worker threads. lengths/rates are per-file outputs
// (0 on failure).
void load_wav_batch(const char** paths, int64_t count, float* out,
                    int64_t* lengths, int32_t* rates, int64_t max_samples,
                    int32_t threads) {
    BatchJob job;
    job.paths = paths;
    job.out = out;
    job.lengths = lengths;
    job.rates = rates;
    job.max_samples = max_samples;
    job.max_file_bytes = (int64_t)1 << 30;
    job.count = count;
    if (threads < 1) threads = 1;
    std::vector<std::thread> pool;
    for (int32_t t = 0; t < threads; t++) pool.emplace_back(batch_worker, &job);
    for (auto& th : pool) th.join();
}

}  // extern "C"
