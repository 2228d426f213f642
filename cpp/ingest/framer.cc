// Native ingest-side frame producer (SURVEY.md "runtime around the
// compute path should be native"): the production realization of the
// round-5 pre-framed serving story (kernels/mixfir_preframed.py) — the
// host reader converts a ci16 capture and emits the [NT, span]
// pre-framed planes the pure-matmul serving kernels consume, in one
// pass, so the chip never does window work and Python never loops.
//
// Layout contract (must match mixfir_preframed.frame_planes exactly):
//   row J of each plane = x[J*stride .. J*stride + span), where x is
//   the hist-prefixed sample stream; span - stride = hist, the final
//   row's lookahead beyond the stream is ZERO-filled (frame_planes'
//   shifted-copy padding).
//
// Conversions match srcdsp_tpu.types: int16 -> f32 is x / scale
// (scale = 32767 by default); f32 -> bf16 is IEEE round-to-nearest-
// even on the upper 16 bits (jnp.astype(bfloat16) semantics), verified
// bit-exact against JAX in the tests.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// interleaved ci16 [hist + n_in] samples -> two f32 planes [nt, span]
// (nt = n_in / stride). Returns nt, or -1 on bad geometry.
long ing_frame_ci16_f32(const int16_t* iq, long n_total, long hist,
                        long stride, long span, float scale,
                        float* out_r, float* out_i) {
    if (span - stride != hist || hist <= 0 || stride % hist != 0)
        return -1;
    const long n_in = n_total - hist;
    if (n_in <= 0 || n_in % stride != 0) return -1;
    const long nt = n_in / stride;
    for (long j = 0; j < nt; ++j) {
        const long base = j * stride;
        const long avail = n_total - base;            // samples on hand
        const long m = avail < span ? avail : span;
        const int16_t* src = iq + 2 * base;
        float* dr = out_r + j * span;
        float* di = out_i + j * span;
        for (long k = 0; k < m; ++k) {
            // DIVIDE (not multiply-by-reciprocal): srcdsp_tpu.types'
            // exact conversion rounding, asserted bit-equal in tests
            dr[k] = static_cast<float>(src[2 * k]) / scale;
            di[k] = static_cast<float>(src[2 * k + 1]) / scale;
        }
        for (long k = m; k < span; ++k) { dr[k] = 0.0f; di[k] = 0.0f; }
    }
    return nt;
}

static inline uint16_t f32_to_bf16(float v) {
    uint32_t bits;
    std::memcpy(&bits, &v, 4);
    // IEEE round-to-nearest-even on the truncated 16 bits (NaN-safe:
    // the framer only sees finite capture samples)
    const uint32_t lsb = (bits >> 16) & 1u;
    bits += 0x7FFFu + lsb;
    return static_cast<uint16_t>(bits >> 16);
}

// same, emitting bf16 planes (uint16 storage) — the bf16-ingest
// serving tier's input format.
long ing_frame_ci16_bf16(const int16_t* iq, long n_total, long hist,
                         long stride, long span, float scale,
                         uint16_t* out_r, uint16_t* out_i) {
    if (span - stride != hist || hist <= 0 || stride % hist != 0)
        return -1;
    const long n_in = n_total - hist;
    if (n_in <= 0 || n_in % stride != 0) return -1;
    const long nt = n_in / stride;
    for (long j = 0; j < nt; ++j) {
        const long base = j * stride;
        const long avail = n_total - base;
        const long m = avail < span ? avail : span;
        const int16_t* src = iq + 2 * base;
        uint16_t* dr = out_r + j * span;
        uint16_t* di = out_i + j * span;
        for (long k = 0; k < m; ++k) {
            dr[k] = f32_to_bf16(static_cast<float>(src[2 * k]) / scale);
            di[k] = f32_to_bf16(static_cast<float>(src[2 * k + 1]) / scale);
        }
        for (long k = m; k < span; ++k) { dr[k] = 0; di[k] = 0; }
    }
    return nt;
}

// f32 plane pair [2, n_total] -> framed f32 plane pair (the non-wire
// path, e.g. when an upstream stage already produced planes).
long ing_frame_f32(const float* xr, const float* xi, long n_total,
                   long hist, long stride, long span,
                   float* out_r, float* out_i) {
    if (span - stride != hist || hist <= 0 || stride % hist != 0)
        return -1;
    const long n_in = n_total - hist;
    if (n_in <= 0 || n_in % stride != 0) return -1;
    const long nt = n_in / stride;
    for (long j = 0; j < nt; ++j) {
        const long base = j * stride;
        const long avail = n_total - base;
        const long m = avail < span ? avail : span;
        std::memcpy(out_r + j * span, xr + base, m * sizeof(float));
        std::memcpy(out_i + j * span, xi + base, m * sizeof(float));
        std::memset(out_r + j * span + m, 0, (span - m) * sizeof(float));
        std::memset(out_i + j * span + m, 0, (span - m) * sizeof(float));
    }
    return nt;
}

// threaded variants: rows split across `threads` workers (each row is
// independent, so the parallel form is trivially bit-identical).
long ing_frame_ci16_f32_mt(const int16_t* iq, long n_total, long hist,
                           long stride, long span, float scale,
                           float* out_r, float* out_i, int threads) {
    if (span - stride != hist || hist <= 0 || stride % hist != 0)
        return -1;
    const long n_in = n_total - hist;
    if (n_in <= 0 || n_in % stride != 0) return -1;
    const long nt = n_in / stride;
    if (threads < 2) {
        return ing_frame_ci16_f32(iq, n_total, hist, stride, span,
                                  scale, out_r, out_i);
    }
    std::vector<std::thread> ws;
    const long chunk = (nt + threads - 1) / threads;
    for (int w = 0; w < threads; ++w) {
        const long j0 = w * chunk;
        const long j1 = (j0 + chunk < nt) ? j0 + chunk : nt;
        if (j0 >= j1) break;
        ws.emplace_back([=]() {
            for (long j = j0; j < j1; ++j) {
                const long base = j * stride;
                const int16_t* src = iq + 2 * base;
                float* dr = out_r + j * span;
                float* di = out_i + j * span;
                for (long k = 0; k < span; ++k) {
                    dr[k] = static_cast<float>(src[2 * k]) / scale;
                    di[k] = static_cast<float>(src[2 * k + 1]) / scale;
                }
            }
        });
    }
    for (auto& t : ws) t.join();
    return nt;
}

long ing_frame_ci16_bf16_mt(const int16_t* iq, long n_total, long hist,
                            long stride, long span, float scale,
                            uint16_t* out_r, uint16_t* out_i,
                            int threads) {
    if (span - stride != hist || hist <= 0 || stride % hist != 0)
        return -1;
    const long n_in = n_total - hist;
    if (n_in <= 0 || n_in % stride != 0) return -1;
    const long nt = n_in / stride;
    if (threads < 2) {
        return ing_frame_ci16_bf16(iq, n_total, hist, stride, span,
                                   scale, out_r, out_i);
    }
    std::vector<std::thread> ws;
    const long chunk = (nt + threads - 1) / threads;
    for (int w = 0; w < threads; ++w) {
        const long j0 = w * chunk;
        const long j1 = (j0 + chunk < nt) ? j0 + chunk : nt;
        if (j0 >= j1) break;
        ws.emplace_back([=]() {
            for (long j = j0; j < j1; ++j) {
                const long base = j * stride;
                const int16_t* src = iq + 2 * base;
                uint16_t* dr = out_r + j * span;
                uint16_t* di = out_i + j * span;
                for (long k = 0; k < span; ++k) {
                    dr[k] = f32_to_bf16(
                        static_cast<float>(src[2 * k]) / scale);
                    di[k] = f32_to_bf16(
                        static_cast<float>(src[2 * k + 1]) / scale);
                }
            }
        });
    }
    for (auto& t : ws) t.join();
    return nt;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// byte wire formats (rtl-sdr cu8, HackRF ci8) — io/capture.py's exact
// conversion formulas, framed in the same one pass.

namespace {

template <typename T, typename Conv>
long frame_bytes(const T* iq, long n_total, long hist, long stride,
                 long span, Conv cv, float* out_r, float* out_i,
                 int threads) {
    if (span - stride != hist || hist <= 0 || stride % hist != 0)
        return -1;
    const long n_in = n_total - hist;
    if (n_in <= 0 || n_in % stride != 0) return -1;
    const long nt = n_in / stride;
    auto rows = [=](long j0, long j1) {
        for (long j = j0; j < j1; ++j) {
            const T* src = iq + 2 * j * stride;
            float* dr = out_r + j * span;
            float* di = out_i + j * span;
            for (long k = 0; k < span; ++k) {
                dr[k] = cv(src[2 * k]);
                di[k] = cv(src[2 * k + 1]);
            }
        }
    };
    if (threads < 2) {
        rows(0, nt);
        return nt;
    }
    std::vector<std::thread> ws;
    const long chunk = (nt + threads - 1) / threads;
    for (int w = 0; w < threads; ++w) {
        const long j0 = w * chunk;
        const long j1 = (j0 + chunk < nt) ? j0 + chunk : nt;
        if (j0 >= j1) break;
        ws.emplace_back([=]() { rows(j0, j1); });
    }
    for (auto& t : ws) t.join();
    return nt;
}

}  // namespace

extern "C" {

long ing_frame_cu8_f32_mt(const uint8_t* iq, long n_total, long hist,
                          long stride, long span,
                          float* out_r, float* out_i, int threads) {
    return frame_bytes(iq, n_total, hist, stride, span,
                       [](uint8_t v) {
                           return (static_cast<float>(v) - 127.5f)
                                  / 127.5f;
                       }, out_r, out_i, threads);
}

long ing_frame_ci8_f32_mt(const int8_t* iq, long n_total, long hist,
                          long stride, long span,
                          float* out_r, float* out_i, int threads) {
    return frame_bytes(iq, n_total, hist, stride, span,
                       [](int8_t v) {
                           return static_cast<float>(v) / 127.0f;
                       }, out_r, out_i, threads);
}

}  // extern "C"
