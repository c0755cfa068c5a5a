// Minimal RIFF/WAVE reader: PCM16/PCM32/float32 → mono float32.
//
// Host-native replacement for the waveform-loading half of the reference's
// librosa.load call (reference utils.py:320).  Mixing to mono matches
// librosa's channel mean.  Resampling to the target rate happens upstream in
// Python (polyphase, data/audio_io.py); this keeps the C ABI simple.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  FILE* f;
  bool ok = true;
  uint32_t u32() {
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) { ok = false; return 0; }
    return b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t)b[3] << 24;
  }
  uint16_t u16() {
    uint8_t b[2];
    if (fread(b, 1, 2, f) != 2) { ok = false; return 0; }
    return b[0] | (b[1] << 8);
  }
};

}  // namespace

extern "C" {

// Parses header only: writes {sample_rate, n_mono_samples} into out_info[2].
// Returns 0 on success.
int goalnet_wav_info(const char* path, int64_t* out_info);

// Reads the file and writes n_mono_samples float32 samples into out (caller
// allocated, sized from goalnet_wav_info).  Returns samples written, -1 on error.
int64_t goalnet_wav_read(const char* path, float* out, int64_t out_len);

static int parse(const char* path, int64_t* info, float* out, int64_t out_len) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Reader r{f};
  if (r.u32() != 0x46464952u) { fclose(f); return -2; }  // "RIFF"
  r.u32();                                               // riff size
  if (r.u32() != 0x45564157u) { fclose(f); return -3; }  // "WAVE"

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  long data_pos = -1;
  uint32_t data_len = 0;

  while (r.ok) {
    uint32_t id = r.u32();
    uint32_t sz = r.u32();
    if (!r.ok) break;
    if (id == 0x20746d66u) {  // "fmt "
      fmt = r.u16();
      channels = r.u16();
      rate = r.u32();
      r.u32();  // byte rate
      r.u16();  // block align
      bits = r.u16();
      if (sz > 16) fseek(f, sz - 16, SEEK_CUR);
    } else if (id == 0x61746164u) {  // "data"
      data_pos = ftell(f);
      data_len = sz;
      fseek(f, sz + (sz & 1), SEEK_CUR);
    } else {
      fseek(f, sz + (sz & 1), SEEK_CUR);
    }
  }
  if (data_pos < 0 || channels == 0 || bits == 0) { fclose(f); return -4; }
  // 0xFFFE = WAVE_FORMAT_EXTENSIBLE; treat subtype by bit depth like most readers.
  if (fmt != 1 && fmt != 3 && fmt != 0xFFFE) { fclose(f); return -5; }

  const uint32_t bytes_per = bits / 8;
  const int64_t n_frames = (int64_t)data_len / (bytes_per * channels);
  if (info) {
    info[0] = rate;
    info[1] = n_frames;
  }
  if (!out) { fclose(f); return 0; }
  if (out_len < n_frames) { fclose(f); return -6; }

  fseek(f, data_pos, SEEK_SET);
  std::vector<uint8_t> buf((size_t)bytes_per * channels * 4096);
  int64_t written = 0;
  while (written < n_frames) {
    int64_t want = n_frames - written;
    if (want > 4096) want = 4096;
    size_t got = fread(buf.data(), (size_t)bytes_per * channels, (size_t)want, f);
    if (got == 0) break;
    for (size_t i = 0; i < got; ++i) {
      double acc = 0.0;
      for (uint16_t c = 0; c < channels; ++c) {
        const uint8_t* p = buf.data() + (i * channels + c) * bytes_per;
        double v = 0.0;
        if (bits == 16) {
          int16_t s;
          std::memcpy(&s, p, 2);
          v = s / 32768.0;
        } else if (bits == 32 && fmt == 3) {
          float s;
          std::memcpy(&s, p, 4);
          v = s;
        } else if (bits == 32) {
          int32_t s;
          std::memcpy(&s, p, 4);
          v = s / 2147483648.0;
        } else if (bits == 8) {
          v = ((int)p[0] - 128) / 128.0;
        } else if (bits == 24) {
          int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
          v = (s >> 8) / 8388608.0;
        }
        acc += v;
      }
      out[written + (int64_t)i] = (float)(acc / channels);
    }
    written += (int64_t)got;
  }
  fclose(f);
  if (written < n_frames) {
    // truncated data chunk (header promised more bytes than the file has —
    // interrupted download/demux): succeeding here would hand the caller an
    // uninitialized buffer tail as audio; report how far we got instead
    return -7;
  }
  return 0;
}

int goalnet_wav_info(const char* path, int64_t* out_info) {
  return parse(path, out_info, nullptr, 0);
}

int64_t goalnet_wav_read(const char* path, float* out, int64_t out_len) {
  int rc = parse(path, nullptr, out, out_len);
  return rc == 0 ? out_len : rc;
}

}  // extern "C"
