// Native audio IO + batch loader for the TPU audio-coding framework.
//
// Role: the reference's data path decodes audio in Python DataLoader workers
// (pickle/torchaudio, SURVEY.md §3.1); here the host-side hot path — WAV
// decode, peak normalization, fixed-length crop/pad, batch assembly — is a
// small C++ library driven via ctypes, with a std::thread pool filling one
// contiguous float32 batch buffer (one H2D transfer per batch).
//
// Supported WAV encodings: PCM u8/s16/s24/s32 and IEEE float32/64, mono or
// multichannel (channel 0 or averaged).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  uint16_t format = 0;      // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  size_t data_offset = 0;
  size_t data_bytes = 0;
};

bool parse_wav_header(FILE* f, WavInfo* info) {
  char id[4];
  uint32_t sz;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4)) return false;
  if (fread(&sz, 4, 1, f) != 1) return false;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4)) return false;
  while (fread(id, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
    if (!memcmp(id, "fmt ", 4)) {
      uint8_t buf[40];
      size_t n = sz < sizeof(buf) ? sz : sizeof(buf);
      if (fread(buf, 1, n, f) != n) return false;
      if (sz > n) fseek(f, (long)(sz - n), SEEK_CUR);
      info->format = *(uint16_t*)(buf + 0);
      info->channels = *(uint16_t*)(buf + 2);
      info->sample_rate = *(uint32_t*)(buf + 4);
      info->bits = *(uint16_t*)(buf + 14);
      if (info->format == 0xFFFE && sz >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        info->format = *(uint16_t*)(buf + 24);
      }
    } else if (!memcmp(id, "data", 4)) {
      info->data_offset = (size_t)ftell(f);
      info->data_bytes = sz;
      return info->format != 0;
    } else {
      fseek(f, (long)(sz + (sz & 1)), SEEK_CUR);
    }
  }
  return false;
}

// Decode into mono float32 [-1, 1]; returns frames decoded.
int64_t decode_wav(const char* path, float* out, int64_t max_frames,
                   int* sample_rate, int average_channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_wav_header(f, &info)) {
    fclose(f);
    return -2;
  }
  if (sample_rate) *sample_rate = (int)info.sample_rate;
  const int ch = info.channels ? info.channels : 1;
  const int bytes_per = info.bits / 8;
  const int64_t frames_in_file =
      (int64_t)(info.data_bytes / (size_t)(bytes_per * ch));
  int64_t frames = frames_in_file;
  if (max_frames >= 0 && frames > max_frames) frames = max_frames;
  if (!out) {  // size query
    fclose(f);
    return frames_in_file;
  }

  std::vector<uint8_t> raw((size_t)frames * bytes_per * ch);
  fseek(f, (long)info.data_offset, SEEK_SET);
  size_t got = fread(raw.data(), 1, raw.size(), f);
  fclose(f);
  frames = (int64_t)(got / (size_t)(bytes_per * ch));

  auto sample_at = [&](int64_t i, int c) -> float {
    const uint8_t* p = raw.data() + (size_t)(i * ch + c) * bytes_per;
    if (info.format == 3) {  // IEEE float
      if (info.bits == 32) return *(const float*)p;
      if (info.bits == 64) return (float)*(const double*)p;
      return 0.f;
    }
    switch (info.bits) {
      case 8:
        return ((float)(*p) - 128.f) / 128.f;
      case 16:
        return (float)(*(const int16_t*)p) / 32768.f;
      case 24: {
        int32_t v = (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                              ((uint32_t)p[2] << 16));
        if (v & 0x800000) v |= (int32_t)0xFF000000;
        return (float)v / 8388608.f;
      }
      case 32:
        return (float)(*(const int32_t*)p) / 2147483648.f;
      default:
        return 0.f;
    }
  };

  if (ch == 1 || !average_channels) {
    for (int64_t i = 0; i < frames; ++i) out[i] = sample_at(i, 0);
  } else {
    const float inv = 1.f / (float)ch;
    for (int64_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) acc += sample_at(i, c);
      out[i] = acc * inv;
    }
  }
  return frames;
}

}  // namespace

extern "C" {

// Query: returns frame count (mono frames), fills *sample_rate. <0 on error.
int64_t audioio_wav_info(const char* path, int* sample_rate) {
  return decode_wav(path, nullptr, -1, sample_rate, 0);
}

// Decode up to max_frames mono frames into out. Returns frames decoded.
int64_t audioio_wav_read(const char* path, float* out, int64_t max_frames,
                         int* sample_rate, int average_channels) {
  return decode_wav(path, out, max_frames, sample_rate, average_channels);
}

// Threaded batch loader: for each of n paths, decode, take a crop of
// `target_len` samples starting at starts[i] (clamped; zero-padded if the
// file is shorter), optional per-item peak normalization. Output buffer is
// (n, target_len) float32, row-major. Returns number of failed items.
int audioio_load_batch(const char** paths, int64_t n, int64_t target_len,
                       const int64_t* starts, float* out, int normalize,
                       int num_threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int> failures(0);
  if (num_threads <= 0) num_threads = (int)std::thread::hardware_concurrency();
  if (num_threads > n) num_threads = (int)n;
  if (num_threads < 1) num_threads = 1;

  auto worker = [&]() {
    std::vector<float> tmp;
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      float* row = out + i * target_len;
      int sr = 0;
      int64_t total = decode_wav(paths[i], nullptr, -1, &sr, 1);
      if (total < 0) {
        memset(row, 0, sizeof(float) * (size_t)target_len);
        failures.fetch_add(1);
        continue;
      }
      tmp.resize((size_t)total);
      int64_t got = decode_wav(paths[i], tmp.data(), total, &sr, 1);
      if (got < 0) got = 0;
      int64_t start = starts ? starts[i] : 0;
      if (start > got - target_len) start = got - target_len;
      if (start < 0) start = 0;
      int64_t avail = got - start;
      if (avail > target_len) avail = target_len;
      if (avail > 0) memcpy(row, tmp.data() + start, sizeof(float) * (size_t)avail);
      if (avail < target_len)
        memset(row + avail, 0, sizeof(float) * (size_t)(target_len - avail));
      if (normalize) {
        float peak = 1e-9f;
        for (int64_t k = 0; k < target_len; ++k) {
          float a = row[k] < 0 ? -row[k] : row[k];
          if (a > peak) peak = a;
        }
        const float inv = 1.f / peak;
        for (int64_t k = 0; k < target_len; ++k) row[k] *= inv;
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
