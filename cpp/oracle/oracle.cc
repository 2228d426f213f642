// C++ golden oracle (SURVEY.md §2 N1).
//
// The reference library is native C++ (header-only template classes with
// per-sample loops over stateful delay lines); the new framework's
// bit-exactness oracle is therefore native C++ too: a from-scratch,
// loop-style reimplementation of the primitive semantics (C1-C10) that the
// JAX/Pallas paths are tested against within SNR bounds (integer paths:
// bit-exact).
//
// Semantics contract (shared with srcdsp_tpu.ops/*.py docstrings):
//   - causal FIR from rest:       y[n] = sum_k h[k] x[n-k]
//   - decimation keeps y[j*M]
//   - NCO: uint32 phase accumulator, 2^-32 turns; w = exp(+j*2*pi*ph)
//   - resample: y[j] = sum_k h[k] u[j*M - k], u = zero-stuffed upsample
//   - int16 <-> float: y = x/scale; y = clip(rint(x*scale)) round-half-even
//
// Accumulation is double precision (the oracle is the accuracy ceiling).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
// Complex buffers are interleaved float32 I,Q.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cfenv>
#include <complex>
#include <vector>

extern "C" {

static const double kTwoPi = 6.283185307179586476925286766559;
static const double kInvScale32 = 1.0 / 4294967296.0;

// ---------- C1: conversions ----------

void orc_i16_to_f32(const int16_t* in, float* out, long n, float scale) {
  // divide (not multiply-by-reciprocal): bit-exact with the numpy/JAX twins
  for (long i = 0; i < n; ++i) out[i] = static_cast<float>(in[i]) / scale;
}

void orc_f32_to_i16(const float* in, int16_t* out, long n, float scale) {
  // round-half-to-even via nearbyint in the default rounding mode
  for (long i = 0; i < n; ++i) {
    float v = std::nearbyintf(in[i] * scale);
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = static_cast<int16_t>(v);
  }
}

// ---------- C2/C3: FIR + decimating FIR ----------

void orc_fir(const float* x, long n, const float* taps, long t, int decim,
             float* y) {
  // x, y interleaved complex; real taps; n input samples -> n/decim outputs
  const long nout = n / decim;
  for (long j = 0; j < nout; ++j) {
    const long c = j * decim;  // output sample index in input time
    double ar = 0.0, ai = 0.0;
    const long kmax = (c < t - 1) ? c : t - 1;
    for (long k = 0; k <= kmax; ++k) {
      const double h = taps[k];
      ar += h * x[2 * (c - k)];
      ai += h * x[2 * (c - k) + 1];
    }
    y[2 * j] = static_cast<float>(ar);
    y[2 * j + 1] = static_cast<float>(ai);
  }
}

void orc_fir_c(const float* x, long n, const float* taps, long t, int decim,
               float* y) {
  // complex taps (interleaved)
  const long nout = n / decim;
  for (long j = 0; j < nout; ++j) {
    const long c = j * decim;
    double ar = 0.0, ai = 0.0;
    const long kmax = (c < t - 1) ? c : t - 1;
    for (long k = 0; k <= kmax; ++k) {
      const double hr = taps[2 * k], hi = taps[2 * k + 1];
      const double xr = x[2 * (c - k)], xi = x[2 * (c - k) + 1];
      ar += hr * xr - hi * xi;
      ai += hr * xi + hi * xr;
    }
    y[2 * j] = static_cast<float>(ar);
    y[2 * j + 1] = static_cast<float>(ai);
  }
}

// ---------- C4: NCO mix ----------

void orc_nco_phasor(uint32_t word0, uint32_t dword, long n, float* w) {
  uint32_t ph = word0;
  for (long i = 0; i < n; ++i) {
    const double ang = kTwoPi * (static_cast<double>(ph) * kInvScale32);
    w[2 * i] = static_cast<float>(std::cos(ang));
    w[2 * i + 1] = static_cast<float>(std::sin(ang));
    ph += dword;  // wraps mod 2^32: exact, matches ops.nco
  }
}

void orc_nco_mix(const float* x, long n, uint32_t word0, uint32_t dword,
                 float* y, uint32_t* phase_end) {
  uint32_t ph = word0;
  for (long i = 0; i < n; ++i) {
    const double ang = kTwoPi * (static_cast<double>(ph) * kInvScale32);
    const double c = std::cos(ang), s = std::sin(ang);
    const double xr = x[2 * i], xi = x[2 * i + 1];
    y[2 * i] = static_cast<float>(xr * c - xi * s);
    y[2 * i + 1] = static_cast<float>(xr * s + xi * c);
    ph += dword;
  }
  if (phase_end) *phase_end = ph;
}

// ---------- C5: rational resampler ----------

void orc_resample(const float* x, long n, const float* taps, long t, int up,
                  int down, float* y) {
  // y[j] = sum_k h[k] u[j*down - k], u[i*up] = x[i]; nout = n*up/down
  const long nout = (n * up) / down;
  for (long j = 0; j < nout; ++j) {
    const long c = static_cast<long>(j) * down;
    double ar = 0.0, ai = 0.0;
    for (long k = 0; k < t; ++k) {
      const long ui = c - k;
      if (ui < 0) break;           // causal from rest
      if (ui % up != 0) continue;  // zero-stuffed position
      const long i = ui / up;
      if (i >= n) continue;
      const double h = taps[k];
      ar += h * x[2 * i];
      ai += h * x[2 * i + 1];
    }
    y[2 * j] = static_cast<float>(ar);
    y[2 * j + 1] = static_cast<float>(ai);
  }
}

// ---------- C6: FFT (iterative radix-2, double precision) ----------

void orc_fft(const float* x, float* y, long n, int inverse) {
  std::vector<std::complex<double>> a(n);
  for (long i = 0; i < n; ++i) a[i] = {x[2 * i], x[2 * i + 1]};
  // bit-reversal permutation
  for (long i = 1, j = 0; i < n; ++i) {
    long bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (long len = 2; len <= n; len <<= 1) {
    const double ang = (inverse ? kTwoPi : -kTwoPi) / len;
    const std::complex<double> wl(std::cos(ang), std::sin(ang));
    for (long i = 0; i < n; i += len) {
      std::complex<double> w(1.0, 0.0);
      for (long k = 0; k < len / 2; ++k) {
        const auto u = a[i + k];
        const auto v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
  const double norm = inverse ? 1.0 / n : 1.0;
  for (long i = 0; i < n; ++i) {
    y[2 * i] = static_cast<float>(a[i].real() * norm);
    y[2 * i + 1] = static_cast<float>(a[i].imag() * norm);
  }
}

// ---------- C8: frequency discriminator ----------

void orc_discriminate(const float* x, long n, float* d) {
  // d[i] = angle(x[i] * conj(x[i-1])) / 2pi, x[-1] = 0 -> d[0] = 0
  double pr = 0.0, pi = 0.0;
  for (long i = 0; i < n; ++i) {
    const double xr = x[2 * i], xi = x[2 * i + 1];
    const double zr = xr * pr + xi * pi;   // x[i] * conj(x[i-1])
    const double zi = xi * pr - xr * pi;
    d[i] = static_cast<float>((zr == 0.0 && zi == 0.0)
                                  ? 0.0
                                  : std::atan2(zi, zr) / kTwoPi);
    pr = xr;
    pi = xi;
  }
}

// ---------- sync: O&M timing estimate + linear-interp sampler ----------

void orc_timing_estimate(const float* metric, long n, int sps, float forget,
                         float* acc_io, float* tau_out) {
  // metric real, acc_io = {re, im}; mirrors chains.sync.timing_estimate
  double cr = 0.0, ci = 0.0;
  for (long i = 0; i < n; ++i) {
    const double ang = -kTwoPi * (static_cast<double>(i % sps)) / sps;
    cr += metric[i] * std::cos(ang);
    ci += metric[i] * std::sin(ang);
  }
  const double ar = forget * acc_io[0] + cr;
  const double ai = forget * acc_io[1] + ci;
  acc_io[0] = static_cast<float>(ar);
  acc_io[1] = static_cast<float>(ai);
  double tau = -(sps / kTwoPi) * std::atan2(ai, ar);
  tau = std::fmod(tau, static_cast<double>(sps));
  if (tau < 0) tau += sps;
  *tau_out = static_cast<float>(tau);
}

void orc_timing_sample_c(const float* last, const float* x, long n, int sps,
                         float tau, float* sym) {
  // complex sampler; last has sps+1 samples; mirrors chains.sync
  const long nsym = n / sps;
  const long total = n + sps + 1;
  std::vector<float> xin(2 * total);
  std::memcpy(xin.data(), last, 2 * (sps + 1) * sizeof(float));
  std::memcpy(xin.data() + 2 * (sps + 1), x, 2 * n * sizeof(float));
  double phase = std::fmod(static_cast<double>(tau) + 1.0,
                           static_cast<double>(sps));
  for (long k = 0; k < nsym; ++k) {
    const double t = static_cast<double>(k) * sps + phase;
    const long i0 = static_cast<long>(std::floor(t));
    const double f = t - i0;
    sym[2 * k] = static_cast<float>((1.0 - f) * xin[2 * i0] +
                                    f * xin[2 * (i0 + 1)]);
    sym[2 * k + 1] = static_cast<float>((1.0 - f) * xin[2 * i0 + 1] +
                                        f * xin[2 * (i0 + 1) + 1]);
  }
}

// ---------- C2 streaming: FIR with carried delay line ----------

void orc_fir_stream(const float* x, long n, const float* taps, long t,
                    int decim, float* hist_io, float* y) {
  // Tail-in/tail-out form of orc_fir: hist_io carries the last t-1 input
  // samples of the stream (interleaved complex, zeros at stream start).
  // Feeding blocks b0, b1, ... yields outputs identical to one orc_fir
  // call on the concatenation — the direct C++ twin of ops.fir.fir_apply's
  // carried FirState.
  const long h = t - 1;
  const long total = h + n;
  std::vector<float> xin(2 * total);
  std::memcpy(xin.data(), hist_io, 2 * h * sizeof(float));
  std::memcpy(xin.data() + 2 * h, x, 2 * n * sizeof(float));
  const long nout = n / decim;
  for (long j = 0; j < nout; ++j) {
    const long c = h + j * decim;
    double ar = 0.0, ai = 0.0;
    for (long k = 0; k < t; ++k) {
      const double hh = taps[k];
      ar += hh * xin[2 * (c - k)];
      ai += hh * xin[2 * (c - k) + 1];
    }
    y[2 * j] = static_cast<float>(ar);
    y[2 * j + 1] = static_cast<float>(ai);
  }
  std::memcpy(hist_io, xin.data() + 2 * (total - h), 2 * h * sizeof(float));
}

// ---------- C10: polyphase channelizer ----------

void orc_channelize(const float* x, long n, const float* proto, long t_raw,
                    int m, float* y) {
  // y layout: channel-major [m][n/m] interleaved complex.
  // y[ch][k] = sum_j h[j] x[k*m - j] e^{+j*2*pi*ch*j/m}  (causal from rest)
  const long t = ((t_raw + m - 1) / m) * m;  // zero-padded prototype length
  std::vector<double> h(t, 0.0);
  for (long j = 0; j < t_raw; ++j) h[j] = proto[j];
  const long kframes = n / m;
  std::vector<double> vr(m), vi(m);
  for (long k = 0; k < kframes; ++k) {
    // fold: v[p] = sum_l h[l*m+p] x[k*m - (l*m+p)]
    for (int p = 0; p < m; ++p) { vr[p] = 0.0; vi[p] = 0.0; }
    for (long j = 0; j < t; ++j) {
      const long xi_idx = k * m - j;
      if (xi_idx < 0) break;
      const int p = static_cast<int>(j % m);
      vr[p] += h[j] * x[2 * xi_idx];
      vi[p] += h[j] * x[2 * xi_idx + 1];
    }
    // y[ch][k] = sum_p v[p] e^{+j*2*pi*ch*p/m}
    for (int ch = 0; ch < m; ++ch) {
      double ar = 0.0, ai = 0.0;
      for (int p = 0; p < m; ++p) {
        const double ang = kTwoPi * ch * p / m;
        const double c = std::cos(ang), s = std::sin(ang);
        ar += vr[p] * c - vi[p] * s;
        ai += vr[p] * s + vi[p] * c;
      }
      y[2 * (static_cast<long>(ch) * kframes + k)] = static_cast<float>(ar);
      y[2 * (static_cast<long>(ch) * kframes + k) + 1] =
          static_cast<float>(ai);
    }
  }
}

void orc_channelize_stream(const float* x, long n, const float* proto,
                           long t_raw, int m, float* hist_io, float* y) {
  // Tail-in/tail-out analysis bank: hist_io carries the last T-1 wideband
  // samples (T = prototype zero-padded to a multiple of m; interleaved
  // complex, zeros at stream start). Block outputs concatenated over calls
  // equal one orc_channelize call — the C++ twin of
  // chains.channelizer.channelize_apply's carried ChannelizerState.
  const long t = ((t_raw + m - 1) / m) * m;
  const long h = t - 1;
  std::vector<double> hh(t, 0.0);
  for (long j = 0; j < t_raw; ++j) hh[j] = proto[j];
  const long total = h + n;
  std::vector<float> xin(2 * total);
  std::memcpy(xin.data(), hist_io, 2 * h * sizeof(float));
  std::memcpy(xin.data() + 2 * h, x, 2 * n * sizeof(float));
  const long kframes = n / m;
  std::vector<double> vr(m), vi(m);
  for (long k = 0; k < kframes; ++k) {
    for (int p = 0; p < m; ++p) { vr[p] = 0.0; vi[p] = 0.0; }
    const long c = h + k * m;  // frame anchor in xin
    for (long j = 0; j < t; ++j) {
      const long idx = c - j;
      const int p = static_cast<int>(j % m);
      vr[p] += hh[j] * xin[2 * idx];
      vi[p] += hh[j] * xin[2 * idx + 1];
    }
    for (int ch = 0; ch < m; ++ch) {
      double ar = 0.0, ai = 0.0;
      for (int p = 0; p < m; ++p) {
        const double ang = kTwoPi * ch * p / m;
        const double c_ = std::cos(ang), s_ = std::sin(ang);
        ar += vr[p] * c_ - vi[p] * s_;
        ai += vr[p] * s_ + vi[p] * c_;
      }
      y[2 * (static_cast<long>(ch) * kframes + k)] = static_cast<float>(ar);
      y[2 * (static_cast<long>(ch) * kframes + k) + 1] =
          static_cast<float>(ai);
    }
  }
  std::memcpy(hist_io, xin.data() + 2 * (total - h), 2 * h * sizeof(float));
}

void orc_channelize_os2(const float* x, long n, const float* proto,
                        long t_raw, int m, float* y) {
  // 2x-oversampled analysis (chains.channelizer.channelize_os2_apply from
  // rest): frames advance by hop = m/2;
  //   y[ch][k] = (-1)^{ch*k} sum_j h[j] x[k*hop - j] e^{+j*2*pi*ch*j/m}
  const long t = ((t_raw + m - 1) / m) * m;
  std::vector<double> hh(t, 0.0);
  for (long j = 0; j < t_raw; ++j) hh[j] = proto[j];
  const int hop = m / 2;
  const long kframes = n / hop;
  std::vector<double> vr(m), vi(m);
  for (long k = 0; k < kframes; ++k) {
    for (int p = 0; p < m; ++p) { vr[p] = 0.0; vi[p] = 0.0; }
    for (long j = 0; j < t; ++j) {
      const long idx = k * hop - j;
      if (idx < 0) break;
      const int p = static_cast<int>(j % m);
      vr[p] += hh[j] * x[2 * idx];
      vi[p] += hh[j] * x[2 * idx + 1];
    }
    for (int ch = 0; ch < m; ++ch) {
      double ar = 0.0, ai = 0.0;
      for (int p = 0; p < m; ++p) {
        const double ang = kTwoPi * ch * p / m;
        const double c_ = std::cos(ang), s_ = std::sin(ang);
        ar += vr[p] * c_ - vi[p] * s_;
        ai += vr[p] * s_ + vi[p] * c_;
      }
      const double tw = ((static_cast<long>(ch) * k) % 2 == 1) ? -1.0 : 1.0;
      y[2 * (static_cast<long>(ch) * kframes + k)] =
          static_cast<float>(ar * tw);
      y[2 * (static_cast<long>(ch) * kframes + k) + 1] =
          static_cast<float>(ai * tw);
    }
  }
}

void orc_synthesize(const float* y, int m, long kframes, const float* proto,
                    long t_raw, float* x) {
  // Polyphase synthesis bank (chains.channelizer.synthesize_apply from
  // rest). y: channel-major [m][kframes] interleaved complex ->
  // x: [kframes*m] wideband.
  //   v[k][q]   = sum_ch y[ch][k] e^{+j*2*pi*ch*q/m}
  //   x[k*m+q]  = m * sum_l f_q[l] v[k-l][q],  f_q[l] = h[l*m+q], v[<0]=0
  const long t = ((t_raw + m - 1) / m) * m;
  const long pp = t / m;
  std::vector<double> hh(t, 0.0);
  for (long j = 0; j < t_raw; ++j) hh[j] = proto[j];
  // phase frames v[k][q]
  std::vector<double> vrr(kframes * m), vii(kframes * m);
  for (long k = 0; k < kframes; ++k) {
    for (int q = 0; q < m; ++q) {
      double ar = 0.0, ai = 0.0;
      for (int ch = 0; ch < m; ++ch) {
        const double ang = kTwoPi * ch * q / m;
        const double c_ = std::cos(ang), s_ = std::sin(ang);
        const double yr = y[2 * (static_cast<long>(ch) * kframes + k)];
        const double yi = y[2 * (static_cast<long>(ch) * kframes + k) + 1];
        ar += yr * c_ - yi * s_;
        ai += yr * s_ + yi * c_;
      }
      vrr[k * m + q] = ar;
      vii[k * m + q] = ai;
    }
  }
  for (long k = 0; k < kframes; ++k) {
    for (int q = 0; q < m; ++q) {
      double ar = 0.0, ai = 0.0;
      for (long l = 0; l < pp; ++l) {
        const long kf = k - l;
        if (kf < 0) break;
        const double f = hh[l * m + q];
        ar += f * vrr[kf * m + q];
        ai += f * vii[kf * m + q];
      }
      x[2 * (k * m + q)] = static_cast<float>(ar * m);
      x[2 * (k * m + q) + 1] = static_cast<float>(ai * m);
    }
  }
}

void orc_synthesize_os2(const float* y, int m, long kframes,
                        const float* proto, long t_raw, float* x) {
  // 2x-oversampled synthesis (chains.channelizer.synthesize_os2_apply
  // from rest). y: [m][kframes] channel-major interleaved complex (frames
  // at rate 2fs/M, analysis twiddle already folded in) ->
  // x: [kframes*m/2] wideband.
  //   v[k][q] = sum_ch y[ch][k] e^{+j*2*pi*ch*q/m}
  //   x[n]    = hop * sum_l f[l*hop + r] v[k-l][(k*hop + r) mod m],
  //             n = k*hop + r, r in [0, hop), hop = m/2, v[<0] = 0
  const long t = ((t_raw + m - 1) / m) * m;
  const int hop = m / 2;
  const long lags = t / hop;  // 2P frame lags overlap each hop
  std::vector<double> hh(t, 0.0);
  for (long j = 0; j < t_raw; ++j) hh[j] = proto[j];
  std::vector<double> vrr(kframes * m), vii(kframes * m);
  for (long k = 0; k < kframes; ++k) {
    for (int q = 0; q < m; ++q) {
      double ar = 0.0, ai = 0.0;
      for (int ch = 0; ch < m; ++ch) {
        const double ang = kTwoPi * ch * q / m;
        const double c_ = std::cos(ang), s_ = std::sin(ang);
        const double yr = y[2 * (static_cast<long>(ch) * kframes + k)];
        const double yi = y[2 * (static_cast<long>(ch) * kframes + k) + 1];
        ar += yr * c_ - yi * s_;
        ai += yr * s_ + yi * c_;
      }
      vrr[k * m + q] = ar;
      vii[k * m + q] = ai;
    }
  }
  for (long k = 0; k < kframes; ++k) {
    for (int r = 0; r < hop; ++r) {
      const int q = static_cast<int>((k * hop + r) % m);
      double ar = 0.0, ai = 0.0;
      for (long l = 0; l < lags; ++l) {
        const long kf = k - l;
        if (kf < 0) break;
        const double f = hh[l * hop + r];
        ar += f * vrr[kf * m + q];
        ai += f * vii[kf * m + q];
      }
      x[2 * (k * hop + r)] = static_cast<float>(ar * hop);
      x[2 * (k * hop + r) + 1] = static_cast<float>(ai * hop);
    }
  }
}

// ---------- IIR (beyond-parity: ops/iir.py twin) ----------

void orc_iir_stream(const float* x, long n, const double* b, const double* a,
                    long p, float* z_io, float* y) {
  // Direct-form-II-transposed, double-precision accumulate, normalized
  // coefficients b[0..p], a[0..p] with a[0] == 1. z_io: carried complex
  // state [p] (interleaved; zeros at stream start). Block outputs
  // concatenated over calls == one whole-signal run — the C++ twin of
  // ops.iir.iir_apply's carried IirState (different state coordinates,
  // identical filter semantics).
  std::vector<double> zr(p), zi(p);
  for (long j = 0; j < p; ++j) { zr[j] = z_io[2 * j]; zi[j] = z_io[2 * j + 1]; }
  for (long i = 0; i < n; ++i) {
    const double xr = x[2 * i], xi = x[2 * i + 1];
    const double yr = b[0] * xr + zr[0];
    const double yi = b[0] * xi + zi[0];
    for (long j = 0; j + 1 < p; ++j) {
      zr[j] = b[j + 1] * xr + zr[j + 1] - a[j + 1] * yr;
      zi[j] = b[j + 1] * xi + zi[j + 1] - a[j + 1] * yi;
    }
    if (p > 0) {
      zr[p - 1] = b[p] * xr - a[p] * yr;
      zi[p - 1] = b[p] * xi - a[p] * yi;
    }
    y[2 * i] = static_cast<float>(yr);
    y[2 * i + 1] = static_cast<float>(yi);
  }
  for (long j = 0; j < p; ++j) { z_io[2 * j] = static_cast<float>(zr[j]);
                                 z_io[2 * j + 1] = static_cast<float>(zi[j]); }
}

void orc_resample_stream(const float* x, long n, const float* taps, long t,
                         int up, int down, float* hist_io, long* off_io,
                         float* y) {
  // Tail-in/tail-out rational resampler: hist_io carries the last
  // ceil((t-1)/up) input samples (interleaved complex, zeros at stream
  // start); off_io carries the output-phase remainder (0 at start).
  // Block outputs concatenated over calls == one orc_resample call.
  const long hist = (t - 1 + up - 1) / up;  // input-domain history
  const long total = hist + n;
  std::vector<float> xin(2 * total);
  std::memcpy(xin.data(), hist_io, 2 * hist * sizeof(float));
  std::memcpy(xin.data() + 2 * hist, x, 2 * n * sizeof(float));
  // global output index j consumed so far: off_io holds j0 such that the
  // stream position of xin[hist] (this block's first sample) is i0 = j0
  // outputs already emitted <=> global input index g0 with j0 = emitted.
  const long g0 = *off_io;                 // global input samples consumed
  const long j0 = (g0 * up) / down;        // outputs emitted by prior blocks
  const long jend = ((g0 + n) * up) / down;      // outputs after this block
  for (long j = j0; j < jend; ++j) {
    const long c = j * down;               // global zero-stuffed index
    double ar = 0.0, ai = 0.0;
    for (long k = 0; k < t; ++k) {
      const long ui = c - k;
      if (ui < 0) break;
      if (ui % up != 0) continue;
      const long i = ui / up;              // global input index
      const long local = i - g0 + hist;    // index into xin
      if (local < 0 || local >= total) continue;
      const double h = taps[k];
      ar += h * xin[2 * local];
      ai += h * xin[2 * local + 1];
    }
    y[2 * (j - j0)] = static_cast<float>(ar);
    y[2 * (j - j0) + 1] = static_cast<float>(ai);
  }
  *off_io = g0 + n;
  std::memcpy(hist_io, xin.data() + 2 * (total - hist),
              2 * hist * sizeof(float));
}


// ---------------------------------------------------------------------
// CPM transmitter twin (srcdsp_tpu/chains/tx.py cpm_tx_apply): the
// frequency pulse is pre-quantized to int32 phase-increment words
// [nspan*sps]; the per-sample word is an exact +-word shift-and-add over
// the +-1 NRZ bits and the phase is a wrapping int32 cumsum. The WORD
// pipeline here is bit-identical to the JAX path (two's-complement
// arithmetic); only the final exp() differs at float rounding.
void orc_cpm_tx(const unsigned char* bits, long nsym,
                const int32_t* words, int nspan, int sps,
                int32_t phase0, int32_t* phase_words_out,
                float* out_re, float* out_im) {
  std::vector<int> hist(nspan > 0 ? nspan - 1 : 0, 0);  // newest first
  int32_t acc = phase0;
  const double inv = std::pow(2.0, -32);
  long n = nsym * sps;
  for (long k = 0; k < nsym; ++k) {
    int nrz = bits[k] ? 1 : -1;
    for (int r = 0; r < sps; ++r) {
      int64_t w = (int64_t)nrz * words[0 * sps + r];
      for (int j = 1; j < nspan; ++j) {
        w += (int64_t)hist[j - 1] * words[j * sps + r];
      }
      int32_t w32 = (int32_t)(uint32_t)w;      // wrap like int32
      long i = k * sps + r;
      phase_words_out[i] = acc;                // phase BEFORE the step
      double ph = (double)acc * inv;           // turns
      out_re[i] = (float)std::cos(2.0 * M_PI * ph);
      out_im[i] = (float)std::sin(2.0 * M_PI * ph);
      acc = (int32_t)(uint32_t)((uint32_t)acc + (uint32_t)w32);
    }
    for (int j = (int)hist.size() - 1; j > 0; --j) hist[j] = hist[j - 1];
    if (!hist.empty()) hist[0] = nrz;
  }
  (void)n;
}

}  // extern "C"
