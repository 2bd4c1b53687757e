// Native host-side audio runtime for heart_murmur_detection_tpu.
//
// The reference delegates decode/trim to librosa on the CPU inside its
// per-file hot loop (src/util.py:222-243). Here the host work — RIFF/WAV
// decode, silence trim, split/pad windowing — is C++ behind a C ABI
// (ctypes-loaded; see heart_murmur_detection_tpu/utils/native.py), with a
// worker-thread prefetch queue so decode overlaps TPU compute. Semantics
// match audio/reference_np.py + audio/pad.py exactly (tested against them).
//
// Build: sh native/build.sh  ->  native/libhmdt_native.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode (PCM 8/16/24/32 + float32/64, mono-mean), no resample (host
// wrapper resamples via scipy when sample rates differ).
// Returns n_samples, or -1 on error. *out is malloc'd float32; caller frees
// via hmdt_free. *sr_out receives the native sample rate.
// ---------------------------------------------------------------------------

static double read_sample(const uint8_t* p, int fmt, int bits) {
  if (fmt == 3) {  // IEEE float
    if (bits == 32) {
      float v;
      std::memcpy(&v, p, 4);
      return v;
    }
    double v;
    std::memcpy(&v, p, 8);
    return v;
  }
  switch (bits) {
    case 8:
      return ((double)(*p) - 128.0) / 128.0;
    case 16: {
      int16_t v;
      std::memcpy(&v, p, 2);
      return v / 32768.0;
    }
    case 24: {
      int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      return v / 8388608.0;
    }
    case 32: {
      int32_t v;
      std::memcpy(&v, p, 4);
      return v / 2147483648.0;
    }
  }
  return 0.0;
}

long hmdt_decode_wav(const char* path, float** out, int* sr_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> raw((size_t)size);
  if (std::fread(raw.data(), 1, (size_t)size, f) != (size_t)size) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  if (size < 44 || std::memcmp(raw.data(), "RIFF", 4) ||
      std::memcmp(raw.data() + 8, "WAVE", 4))
    return -1;

  int fmt = 0, channels = 0, bits = 0, sr = 0;
  const uint8_t* data = nullptr;
  uint32_t data_size = 0;
  size_t pos = 12;
  while (pos + 8 <= (size_t)size) {
    uint32_t csize;
    std::memcpy(&csize, raw.data() + pos + 4, 4);
    const uint8_t* body = raw.data() + pos + 8;
    if (!std::memcmp(raw.data() + pos, "fmt ", 4)) {
      // fmt body must fit in the buffer: 16 bytes read unconditionally and
      // 26 for WAVE_FORMAT_EXTENSIBLE (truncated files over-read otherwise)
      if (csize < 16 || pos + 8 + (size_t)csize > (size_t)size) return -1;
      uint16_t afmt, ch, b;
      uint32_t rate;
      std::memcpy(&afmt, body, 2);
      std::memcpy(&ch, body + 2, 2);
      std::memcpy(&rate, body + 4, 4);
      std::memcpy(&b, body + 14, 2);
      if (afmt == 0xFFFE && csize >= 40) std::memcpy(&afmt, body + 24, 2);
      fmt = afmt;
      channels = ch;
      sr = (int)rate;
      bits = b;
    } else if (!std::memcmp(raw.data() + pos, "data", 4)) {
      data = body;
      data_size = csize;
      if (pos + 8 + data_size > (size_t)size) data_size = (uint32_t)(size - pos - 8);
    }
    // clamp the advance so a bogus csize can't wrap pos past the buffer
    size_t adv = (size_t)csize + ((size_t)csize & 1);
    if (adv > (size_t)size - pos - 8) break;
    pos += 8 + adv;
  }
  if (!data || !channels || !bits || (fmt != 1 && fmt != 3)) return -1;

  int bytes = bits / 8;
  long frames = data_size / (bytes * channels);
  float* buf = (float*)std::malloc(sizeof(float) * (size_t)frames);
  if (!buf) return -1;
  for (long i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c)
      acc += read_sample(data + (i * channels + c) * bytes, fmt, bits);
    buf[i] = (float)(acc / channels);
  }
  *out = buf;
  *sr_out = sr;
  return frames;
}

void hmdt_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// Silence trim bounds: librosa.effects.trim semantics (frame rms^2 in dB
// relative to the max frame, keep frames > -top_db; sample bounds on hop
// boundaries). Matches audio/reference_np.trim_silence.
// ---------------------------------------------------------------------------

void hmdt_trim_bounds(const float* y, long n, long frame_length, long hop_length,
                      double top_db, long* start_out, long* end_out) {
  long pad = frame_length / 2;
  long padded = n + 2 * pad;
  long n_frames = 1 + (padded - frame_length) / hop_length;
  if (n_frames <= 0) {
    *start_out = 0;
    *end_out = 0;
    return;
  }
  std::vector<double> mse((size_t)n_frames);
  // prefix sums of y^2 over the zero-padded signal
  std::vector<double> pref((size_t)n + 1, 0.0);
  for (long i = 0; i < n; ++i) pref[(size_t)i + 1] = pref[(size_t)i] + (double)y[i] * y[i];
  double max_mse = 0.0;
  for (long t = 0; t < n_frames; ++t) {
    long a = t * hop_length - pad;          // window start in signal coords
    long b = a + frame_length;              // window end (exclusive)
    long ca = a < 0 ? 0 : (a > n ? n : a);
    long cb = b < 0 ? 0 : (b > n ? n : b);
    double e = pref[(size_t)cb] - pref[(size_t)ca];
    mse[(size_t)t] = e / (double)frame_length;
    if (mse[(size_t)t] > max_mse) max_mse = mse[(size_t)t];
  }
  double amin = 1e-10;
  double ref_db = 10.0 * std::log10(max_mse > amin ? max_mse : amin);
  long first = -1, last = -1;
  for (long t = 0; t < n_frames; ++t) {
    double db = 10.0 * std::log10(mse[(size_t)t] > amin ? mse[(size_t)t] : amin) - ref_db;
    if (db > -top_db) {
      if (first < 0) first = t;
      last = t;
    }
  }
  if (first < 0) {
    *start_out = 0;
    *end_out = 0;
    return;
  }
  long start = first * hop_length;
  long end = (last + 1) * hop_length;
  if (end > n) end = n;
  *start_out = start;
  *end_out = end;
}

// ---------------------------------------------------------------------------
// decode + trim + fixed-length window copy into a caller-provided buffer:
// the single call the batched extractor makes per clip. Policy mirrors
// get_entire_signal(pad=True, types='repeat'|'zero', max_sec) for output
// buffers of max_len samples; returns the valid length written, or -1.
// ---------------------------------------------------------------------------

long hmdt_load_clip(const char* path, float* out_buf, long max_len,
                    long min_len, int pad_zero, int sr_expected,
                    long trim_frame, long trim_hop) {
  float* y = nullptr;
  int sr = 0;
  long n = hmdt_decode_wav(path, &y, &sr);
  if (n < 0) return -1;
  if (sr_expected > 0 && sr != sr_expected) {
    // resample handled by the python wrapper; signal mismatch
    hmdt_free(y);
    return -2;
  }
  long s, e;
  hmdt_trim_bounds(y, n, trim_frame, trim_hop, 60.0, &s, &e);
  long m = e - s;
  const float* src = y + s;

  long out_n;
  if (m >= min_len) {
    out_n = m > max_len ? max_len : m;
    std::memcpy(out_buf, src, sizeof(float) * (size_t)out_n);
  } else if (pad_zero) {
    // 'zero' policy, single window (_zero_padding, src/util.py:504-519)
    std::memset(out_buf, 0, sizeof(float) * (size_t)min_len);
    if (m > 0 && (double)m / (double)min_len < 0.5) {
      long cur = 0;
      while (cur + m < min_len) {
        std::memcpy(out_buf + cur, src, sizeof(float) * (size_t)m);
        cur += m;
      }
    } else if (m > 0) {
      std::memcpy(out_buf, src, sizeof(float) * (size_t)m);
    }
    out_n = min_len;
  } else {
    // 'repeat' policy: source at the END, front filled with the tail of the
    // repeated clip (deterministic branch, audio/pad.py)
    long left = min_len - m;
    if (m > 0) {
      std::memcpy(out_buf + left, src, sizeof(float) * (size_t)m);
      for (long i = 0; i < left; ++i) {
        // aug = clip tiled; take aug[len(aug)-left+i] where len(aug) is the
        // smallest 2^k * m >= left
        long aug_len = m;
        while (aug_len < left) aug_len *= 2;
        long idx = (aug_len - left + i) % m;
        out_buf[i] = src[idx];
      }
    } else {
      std::memset(out_buf, 0, sizeof(float) * (size_t)min_len);
    }
    out_n = min_len;
  }
  hmdt_free(y);
  return out_n;
}

}  // extern "C"
