// Native host runtime for the TPU VALL-E X framework.
//
// The TPU owns all tensor compute (JAX/XLA/Pallas); this library owns the
// host-side hot paths that sit in front of it — the pieces the reference
// delegated to native pip dependencies (HF tokenizers in Rust, libsndfile,
// torchaudio resampling; SURVEY.md §2.4):
//
//   vn_tokenize    UTF-8 phoneme string → char-level token ids
//                  (the production vocab has zero merges, so encoding is an
//                  exact codepoint→id lookup)
//   vn_load_wav    RIFF/WAVE PCM decode (8/16/32-bit int + float32),
//                  stereo→mono downmix
//   vn_resample    windowed-sinc polyphase resampler (Kaiser-ish Hann
//                  window, zero-phase), used for enrollment-clip 16k/44.1k
//                  → 24k conversion
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). Build:
//   make -C native    (or: g++ -O3 -shared -fPIC -o libvallex_native.so ...)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_map>
#include <mutex>

extern "C" {

// ---------------------------------------------------------------------------
// Tokenizer: codepoint → id map
// ---------------------------------------------------------------------------

static std::unordered_map<uint32_t, int32_t> g_vocab;
static std::mutex g_vocab_mu;
static int32_t g_unk_id = 0;

// vocab: parallel arrays of unicode codepoints and ids
void vn_set_vocab(const uint32_t* codepoints, const int32_t* ids, int n,
                  int32_t unk_id) {
  std::lock_guard<std::mutex> lock(g_vocab_mu);
  g_vocab.clear();
  for (int i = 0; i < n; i++) g_vocab[codepoints[i]] = ids[i];
  g_unk_id = unk_id;
}

// UTF-8 decode one codepoint; returns bytes consumed (0 on error)
static int utf8_decode(const unsigned char* s, int len, uint32_t* cp) {
  if (len <= 0) return 0;
  unsigned char c = s[0];
  if (c < 0x80) { *cp = c; return 1; }
  if ((c >> 5) == 0x6 && len >= 2) {
    *cp = ((c & 0x1F) << 6) | (s[1] & 0x3F);
    return 2;
  }
  if ((c >> 4) == 0xE && len >= 3) {
    *cp = ((c & 0x0F) << 12) | ((s[1] & 0x3F) << 6) | (s[2] & 0x3F);
    return 3;
  }
  if ((c >> 3) == 0x1E && len >= 4) {
    *cp = ((c & 0x07) << 18) | ((s[1] & 0x3F) << 12) | ((s[2] & 0x3F) << 6) |
          (s[3] & 0x3F);
    return 4;
  }
  return 0;
}

// → number of ids written (≤ max_out); unknown codepoints map to unk_id
int vn_tokenize(const char* utf8, int32_t* out_ids, int max_out) {
  const unsigned char* s = (const unsigned char*)utf8;
  int len = (int)strlen(utf8);
  int pos = 0, n = 0;
  while (pos < len && n < max_out) {
    uint32_t cp;
    int used = utf8_decode(s + pos, len - pos, &cp);
    if (used == 0) { pos++; continue; }  // skip malformed byte
    pos += used;
    auto it = g_vocab.find(cp);
    out_ids[n++] = (it == g_vocab.end()) ? g_unk_id : it->second;
  }
  return n;
}

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

// Returns number of mono samples written to out (or required size if out is
// null); -1 on error. sample_rate_out receives the file's rate.
long vn_load_wav(const char* path, float* out, long max_out,
                 int32_t* sample_rate_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) ||
      fread(&riff_size, 4, 1, f) != 1 || fread(wave, 1, 4, f) != 4 ||
      memcmp(wave, "WAVE", 4)) {
    fclose(f);
    return -1;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  long data_pos = -1;
  uint32_t data_len = 0;
  while (true) {
    char id[4];
    uint32_t sz;
    if (fread(id, 1, 4, f) != 4 || fread(&sz, 4, 1, f) != 1) break;
    if (!memcmp(id, "fmt ", 4)) {
      uint8_t buf[16];
      if (sz < 16 || fread(buf, 1, 16, f) != 16) { fclose(f); return -1; }
      fmt = buf[0] | (buf[1] << 8);
      channels = buf[2] | (buf[3] << 8);
      memcpy(&rate, buf + 4, 4);
      bits = buf[14] | (buf[15] << 8);
      if (sz > 16) fseek(f, sz - 16, SEEK_CUR);
    } else if (!memcmp(id, "data", 4)) {
      data_pos = ftell(f);
      data_len = sz;
      fseek(f, (sz + 1) & ~1u, SEEK_CUR);
    } else {
      fseek(f, (sz + 1) & ~1u, SEEK_CUR);
    }
    if (feof(f)) break;
  }
  if (data_pos < 0 || channels == 0 || bits == 0) { fclose(f); return -1; }
  int bytes_per = bits / 8;
  long frames = data_len / (bytes_per * channels);
  *sample_rate_out = (int32_t)rate;
  if (!out) { fclose(f); return frames; }
  if (frames > max_out) frames = max_out;

  fseek(f, data_pos, SEEK_SET);
  std::vector<uint8_t> raw((size_t)frames * bytes_per * channels);
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    fclose(f);
    return -1;
  }
  fclose(f);

  for (long i = 0; i < frames; i++) {
    double acc = 0;
    for (int c = 0; c < channels; c++) {
      const uint8_t* p = raw.data() + ((size_t)i * channels + c) * bytes_per;
      double v = 0;
      if (fmt == 3 && bits == 32) {  // IEEE float
        float fv;
        memcpy(&fv, p, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t s16;
        memcpy(&s16, p, 2);
        v = s16 / 32768.0;
      } else if (bits == 32) {
        int32_t s32;
        memcpy(&s32, p, 4);
        v = s32 / 2147483648.0;
      } else if (bits == 8) {
        v = ((int)p[0] - 128) / 128.0;
      }
      acc += v;
    }
    out[i] = (float)(acc / channels);
  }
  return frames;
}

// ---------------------------------------------------------------------------
// Polyphase windowed-sinc resampler
// ---------------------------------------------------------------------------

static long gcd_long(long a, long b) { return b ? gcd_long(b, a % b) : a; }

// → number of output samples written (or required size if out is null)
long vn_resample(const float* in, long n_in, int32_t sr_in, int32_t sr_out,
                 float* out, long max_out) {
  if (sr_in == sr_out) {
    if (!out) return n_in;
    long n = n_in < max_out ? n_in : max_out;
    memcpy(out, in, n * sizeof(float));
    return n;
  }
  long g = gcd_long(sr_in, sr_out);
  long up = sr_out / g, down = sr_in / g;
  long n_out = (n_in * up) / down;
  if (!out) return n_out;
  if (n_out > max_out) n_out = max_out;

  // windowed-sinc low-pass at min(sr_in, sr_out)/2, 16 zero crossings
  const int ZC = 16;
  double cutoff = 0.5 * (up < down ? (double)up / down : 1.0);
  long half_width = (long)(ZC * (up > down ? up : down) / (double)up *
                           (up < down ? (double)down / up : 1.0));
  if (half_width < ZC) half_width = ZC;

  for (long m = 0; m < n_out; m++) {
    // output sample m corresponds to input time t = m * down / up
    long num = m * down;
    long i0 = num / up;            // integer input index
    double frac = (double)(num % up) / up;
    double acc = 0, wsum = 0;
    for (long k = -ZC; k <= ZC; k++) {
      long idx = i0 + k;
      if (idx < 0 || idx >= n_in) continue;
      double x = (double)k - frac;
      double s = (x == 0) ? 1.0
                          : sin(2 * M_PI * cutoff * x) / (2 * M_PI * cutoff * x);
      double w = 0.5 * (1 + cos(M_PI * x / (ZC + 1)));  // Hann window
      double h = 2 * cutoff * s * w;
      acc += in[idx] * h;
      wsum += h;
    }
    out[m] = (float)(wsum > 1e-9 ? acc / wsum * 1.0 : acc);
  }
  return n_out;
}

}  // extern "C"
