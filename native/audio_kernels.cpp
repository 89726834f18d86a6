// Host-side audio kernels for the serving path.
//
// The reference leans on torchaudio (C++ sox/ffmpeg) for resampling
// (fireredtts2/fireredtts2.py:65,389) and does float<->int16 PCM conversion
// in Python/numpy per websocket chunk (enhanced_fireredtts2.py hex PCM).
// Here both are small, allocation-free C++ kernels callable via ctypes:
//
//  - polyphase windowed-sinc rational resampler (24k<->16k is ratio 2/3,
//    so the filter bank is tiny and the inner loop is a short dot product);
//  - float32 <-> int16 PCM packing with clipping.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline double sinc(double x) {
    if (x == 0.0) return 1.0;
    const double px = M_PI * x;
    return std::sin(px) / px;
}

// Kaiser window via the standard I0 series.
inline double bessel_i0(double x) {
    double sum = 1.0, term = 1.0;
    const double y = x * x / 4.0;
    for (int k = 1; k < 64; ++k) {
        term *= y / (double)(k * k);
        sum += term;
        if (term < 1e-16 * sum) break;
    }
    return sum;
}

}  // namespace

extern "C" {

// Greatest common divisor (exported for the wrapper's convenience).
long long frtts_gcd(long long a, long long b) {
    while (b) { long long t = a % b; a = b; b = t; }
    return a;
}

// Output length of resample(n_in, up, down) with scipy-compatible sizing:
// ceil(n_in * up / down).
long long frtts_resample_out_len(long long n_in, long long up, long long down) {
    return (n_in * up + down - 1) / down;
}

// Polyphase rational resampler: y = downsample(upfilter(x, up), down).
// Filter: windowed sinc, cutoff min(1/up, 1/down), half_width taps per
// phase (2*half_width+1 total span in input samples), Kaiser beta.
// x: n_in floats; y: frtts_resample_out_len(n_in, up, down) floats.
void frtts_resample_poly(const float* x, long long n_in,
                         long long up, long long down,
                         float* y, long long n_out,
                         int half_width, double beta) {
    const long long g = frtts_gcd(up, down);
    up /= g; down /= g;
    if (up == 1 && down == 1) {
        std::memcpy(y, x, sizeof(float) * (size_t)n_in);
        return;
    }
    // Prototype lowpass at cutoff fc = 1/max(up, down) (normalized to the
    // upsampled rate), length 2*H*up+1 taps, gain `up`.
    const long long H = half_width;
    const long long taps_per_phase = 2 * H + 1;
    const double fc = 1.0 / (double)(up > down ? up : down);
    const double i0b = bessel_i0(beta);
    std::vector<double> filt((size_t)(taps_per_phase * up));
    const long long M = taps_per_phase * up;  // total taps
    for (long long i = 0; i < M; ++i) {
        const double t = (double)(i - (M - 1) / 2);  // M odd when up odd... use centered
        const double m = (double)(M - 1);
        const double w_arg = 2.0 * (double)i / m - 1.0;
        const double win = bessel_i0(beta * std::sqrt(std::fmax(0.0, 1.0 - w_arg * w_arg))) / i0b;
        filt[(size_t)i] = (double)up * fc * sinc(fc * t) * win;
    }
    // Polyphase evaluation: output j taps the upsampled grid at phase
    // p = (j*down) % up, input offset k0 = (j*down) / up.
    for (long long j = 0; j < n_out; ++j) {
        const long long pos = j * down;              // position on up-grid
        const long long phase = pos % up;
        const long long k0 = pos / up;
        double acc = 0.0;
        // up-grid tap index i must satisfy (i - phase) % up == 0 relative
        // to centered filter; walk input samples k around k0.
        for (long long t = -H; t <= H; ++t) {
            const long long k = k0 + t;
            if (k < 0 || k >= n_in) continue;
            // tap on the up-grid between x[k] and output position
            const long long tap = pos - k * up + (M - 1) / 2 - 0;
            // recenter: distance from center in up-grid units
            const long long idx = (M - 1) / 2 + (pos - k * up);
            if (idx < 0 || idx >= M) continue;
            acc += filt[(size_t)idx] * (double)x[(size_t)k];
            (void)tap;
        }
        y[(size_t)j] = (float)acc;
    }
}

// float32 [-1,1] -> int16 PCM with clipping.
void frtts_f32_to_pcm16(const float* x, int16_t* y, long long n) {
    for (long long i = 0; i < n; ++i) {
        float v = x[(size_t)i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        y[(size_t)i] = (int16_t)std::lrintf(v * 32767.0f);
    }
}

// int16 PCM -> float32.
void frtts_pcm16_to_f32(const int16_t* x, float* y, long long n) {
    const float s = 1.0f / 32768.0f;
    for (long long i = 0; i < n; ++i) y[(size_t)i] = (float)x[(size_t)i] * s;
}

}  // extern "C"
