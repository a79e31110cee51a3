// Native audio data-path: WAV decode + training-segment packing.
//
// The reference's data loading is librosa decode + Python slicing inside
// DataLoader worker processes (src/data.py:264-300) — the host-side
// bottleneck once the accelerator step is ~10 ms. This library provides the
// hot path in C++: RIFF/WAVE parsing (PCM 8/16/24/32 + IEEE float),
// multi-file batch decode with a thread pool, and the reference's segment
// slicing semantics (full strides + re-anchored tail, src/data.py:287-296)
// writing straight into caller-owned [B, T] buffers (zero copies on the
// Python side; exposed via ctypes in convtasnet_tpu/data/native.py).
//
// Build: make -C native   (produces libwavio.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  uint16_t format = 0;       // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  int64_t data_offset = -1;  // byte offset of payload
  int64_t data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  uint8_t riff[12];
  if (fread(riff, 1, 12, f) != 12) return false;
  if (memcmp(riff, "RIFF", 4) != 0 || memcmp(riff + 8, "WAVE", 4) != 0)
    return false;
  for (;;) {
    uint8_t head[8];
    if (fread(head, 1, 8, f) != 8) break;
    uint32_t size;
    memcpy(&size, head + 4, 4);
    if (memcmp(head, "fmt ", 4) == 0) {
      uint8_t fmt[16];
      if (size < 16 || fread(fmt, 1, 16, f) != 16) return false;
      memcpy(&info->format, fmt + 0, 2);
      memcpy(&info->channels, fmt + 2, 2);
      memcpy(&info->sample_rate, fmt + 4, 4);
      memcpy(&info->bits, fmt + 14, 2);
      int64_t consumed = 16;
      if (info->format == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: real code = first 2 bytes of the SubFormat
        // GUID at payload offset 24 (cbSize 2 + validBits 2 + mask 4).
        uint8_t ext[10];
        if (size < 26 || fread(ext, 1, 10, f) != 10) return false;
        memcpy(&info->format, ext + 8, 2);
        consumed += 10;
        if (info->format != 1 && info->format != 3) return false;
      }
      int64_t skip = (int64_t)size - consumed + (size & 1);
      if (skip > 0 && fseek(f, (long)skip, SEEK_CUR) != 0) return false;
    } else if (memcmp(head, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = size;
      return info->format != 0;  // fmt must precede data
    } else {
      if (fseek(f, (long)(size + (size & 1)), SEEK_CUR) != 0) return false;
    }
  }
  return false;
}

// Decode the payload into float32 mono (channel-averaged), normalized to
// [-1, 1]. Returns frame count, or -1 on error. out must hold max_frames.
int64_t decode_file(const char* path, float* out, int64_t max_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info) || info.channels == 0 || info.bits == 0 ||
      info.bits % 8 != 0) {
    fclose(f);
    return -1;
  }
  const int64_t bytes_per_sample = info.bits / 8;
  const int64_t frame_bytes = bytes_per_sample * info.channels;
  int64_t frames = info.data_bytes / frame_bytes;
  if (frames > max_frames) frames = max_frames;
  std::vector<uint8_t> raw(frames * frame_bytes);
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0 ||
      fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    fclose(f);
    return -1;
  }
  fclose(f);

  const int C = info.channels;
  const float inv_c = 1.0f / C;
  const uint8_t* p = raw.data();
  if (info.format == 3 && info.bits == 32) {
    for (int64_t t = 0; t < frames; ++t) {
      float acc = 0.f;
      for (int c = 0; c < C; ++c) {
        float v;
        memcpy(&v, p + (t * C + c) * 4, 4);
        acc += v;
      }
      out[t] = acc * inv_c;
    }
  } else if (info.format == 1 && info.bits == 16) {
    const float scale = 1.0f / 32768.0f;
    for (int64_t t = 0; t < frames; ++t) {
      float acc = 0.f;
      for (int c = 0; c < C; ++c) {
        int16_t v;
        memcpy(&v, p + (t * C + c) * 2, 2);
        acc += (float)v;
      }
      out[t] = acc * inv_c * scale;
    }
  } else if (info.format == 1 && info.bits == 32) {
    const float scale = 1.0f / 2147483648.0f;
    for (int64_t t = 0; t < frames; ++t) {
      float acc = 0.f;
      for (int c = 0; c < C; ++c) {
        int32_t v;
        memcpy(&v, p + (t * C + c) * 4, 4);
        acc += (float)v * scale;
      }
      out[t] = acc * inv_c;
    }
  } else if (info.format == 1 && info.bits == 24) {
    const float scale = 1.0f / 8388608.0f;
    for (int64_t t = 0; t < frames; ++t) {
      float acc = 0.f;
      for (int c = 0; c < C; ++c) {
        const uint8_t* b = p + (t * C + c) * 3;
        int32_t v = (int32_t)(b[0] | (b[1] << 8) | (b[2] << 16));
        v = (v ^ 0x800000) - 0x800000;  // sign-extend 24 -> 32
        acc += (float)v * scale;
      }
      out[t] = acc * inv_c;
    }
  } else if (info.format == 1 && info.bits == 8) {
    const float scale = 1.0f / 128.0f;
    for (int64_t t = 0; t < frames; ++t) {
      float acc = 0.f;
      for (int c = 0; c < C; ++c)
        acc += ((float)p[t * C + c] - 128.0f) * scale;
      out[t] = acc * inv_c;
    }
  } else {
    return -1;
  }
  return frames;
}

void parallel_for(int64_t n, int num_threads, void (*body)(int64_t, void*),
                  void* ctx) {
  if (num_threads <= 1 || n <= 1) {
    for (int64_t i = 0; i < n; ++i) body(i, ctx);
    return;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      body(i, ctx);
    }
  };
  std::vector<std::thread> threads;
  int nt = std::min<int64_t>(num_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Sample count (after channel-merge) without decoding; -1 on error.
int64_t wav_num_frames(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = parse_header(f, &info);
  fclose(f);
  if (!ok || info.channels == 0 || info.bits == 0) return -1;
  return info.data_bytes / ((int64_t)(info.bits / 8) * info.channels);
}

int wav_sample_rate(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = parse_header(f, &info);
  fclose(f);
  return ok ? (int)info.sample_rate : -1;
}

// Decode one file into out[max_frames]; returns frames decoded or -1.
int64_t wav_decode(const char* path, float* out, int64_t max_frames) {
  return decode_file(path, out, max_frames);
}

struct BatchCtx {
  const char* const* paths;
  float* out;        // [n, max_frames]
  int64_t* lengths;  // [n]
  int64_t max_frames;
};

static void decode_one(int64_t i, void* vctx) {
  auto* ctx = (BatchCtx*)vctx;
  int64_t got = decode_file(ctx->paths[i], ctx->out + i * ctx->max_frames,
                            ctx->max_frames);
  ctx->lengths[i] = got;
  if (got >= 0)  // zero-fill the padding tail
    memset(ctx->out + i * ctx->max_frames + got, 0,
           (ctx->max_frames - got) * sizeof(float));
}

// Decode n files in parallel into a dense [n, max_frames] float32 buffer.
// lengths[i] = decoded frame count (or -1 on per-file error).
void wav_decode_batch(const char* const* paths, int64_t n, float* out,
                      int64_t* lengths, int64_t max_frames, int num_threads) {
  BatchCtx ctx{paths, out, lengths, max_frames};
  parallel_for(n, num_threads, decode_one, &ctx);
}

// Reference segment-slicing semantics (src/data.py:287-296): from a signal of
// `length` samples produce segments of `segment_len` at full strides up to
// max_index = min(length - segment_len + 1, (batch_size-1)*segment_len + 1),
// plus a tail segment re-anchored at [-segment_len:] when length is not a
// multiple and the utterance is shorter than a full batch. Writes segment
// start offsets into starts[max_segments]; returns the count.
int64_t segment_plan(int64_t length, int64_t segment_len, int64_t batch_size,
                     int64_t* starts, int64_t max_segments) {
  if (length < segment_len) return 0;
  int64_t max_index = length - segment_len + 1;
  int64_t cap = (batch_size - 1) * segment_len + 1;
  if (cap < max_index) max_index = cap;
  int64_t n = 0;
  for (int64_t s = 0; s < max_index && n < max_segments; s += segment_len)
    starts[n++] = s;
  if (length % segment_len != 0 && length < batch_size * segment_len &&
      n < max_segments)
    starts[n++] = length - segment_len;
  return n;
}

}  // extern "C"
