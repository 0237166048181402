// Native host runtime for path_tracer_tpu.
//
// The reference implements its host pipeline natively (stb PNG writing and
// tone mapping in /root/reference/src/main.cpp:16-59); this library is the
// TPU build's native equivalent: framebuffer tone mapping (gamma 2.0 via
// sqrt, clamp to [0, 0.999], x256 truncation, vertical flip) and a
// dependency-free PNG encoder (zlib + hand-rolled chunk framing).
//
// Exposed as a plain C ABI consumed through ctypes
// (path_tracer_tpu/native/runtime.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

void put_u32_be(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back(static_cast<uint8_t>(v >> 24));
  out.push_back(static_cast<uint8_t>(v >> 16));
  out.push_back(static_cast<uint8_t>(v >> 8));
  out.push_back(static_cast<uint8_t>(v));
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
  put_u32_be(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, out.data() + start, static_cast<uInt>(4 + len));
  put_u32_be(out, crc);
}

// Encode an RGB8 image (rows top-down) into a PNG byte stream.
bool encode_png(const uint8_t* rgb, int width, int height,
                std::vector<uint8_t>& out) {
  // raw scanlines, each prefixed with filter byte 0
  const size_t stride = static_cast<size_t>(width) * 3;
  std::vector<uint8_t> raw;
  raw.reserve((stride + 1) * height);
  for (int y = 0; y < height; ++y) {
    raw.push_back(0);  // filter: none
    raw.insert(raw.end(), rgb + y * stride, rgb + (y + 1) * stride);
  }

  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> z(bound);
  if (compress2(z.data(), &bound, raw.data(),
                static_cast<uLong>(raw.size()), 6) != Z_OK) {
    return false;
  }
  z.resize(bound);

  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  out.assign(sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = static_cast<uint8_t>(width >> 24);
  ihdr[1] = static_cast<uint8_t>(width >> 16);
  ihdr[2] = static_cast<uint8_t>(width >> 8);
  ihdr[3] = static_cast<uint8_t>(width);
  ihdr[4] = static_cast<uint8_t>(height >> 24);
  ihdr[5] = static_cast<uint8_t>(height >> 16);
  ihdr[6] = static_cast<uint8_t>(height >> 8);
  ihdr[7] = static_cast<uint8_t>(height);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter
  ihdr[12] = 0;  // interlace
  put_chunk(out, "IHDR", ihdr, sizeof(ihdr));
  put_chunk(out, "IDAT", z.data(), z.size());
  put_chunk(out, "IEND", nullptr, 0);
  return true;
}

}  // namespace

extern "C" {

// Write an RGB8 (rows top-down) PNG. Returns 0 on success.
int pt_write_png(const char* path, const uint8_t* rgb, int width,
                 int height) {
  std::vector<uint8_t> png;
  if (!encode_png(rgb, width, height, png)) return 1;
  FILE* f = std::fopen(path, "wb");
  if (!f) return 2;
  size_t n = std::fwrite(png.data(), 1, png.size(), f);
  std::fclose(f);
  return n == png.size() ? 0 : 3;
}

// Tone map a linear float32 framebuffer (H, W, 3), row 0 = image BOTTOM
// (the reference's y-up fb), into RGB8 rows top-down:
// gamma 2.0 (sqrt), clamp [0, 0.999], x256 truncate, vertical flip —
// main.cpp:41-49 semantics.
void pt_tonemap(const float* fb, int width, int height, uint8_t* out_rgb) {
  for (int y = 0; y < height; ++y) {
    const float* src = fb + static_cast<size_t>(height - 1 - y) * width * 3;
    uint8_t* dst = out_rgb + static_cast<size_t>(y) * width * 3;
    for (int i = 0; i < width * 3; ++i) {
      float v = std::sqrt(src[i]);
      if (v < 0.0f) v = 0.0f;
      if (v > 0.999f) v = 0.999f;
      dst[i] = static_cast<uint8_t>(static_cast<int>(256.0f * v));
    }
  }
}

// Tonemap + write in one call. Returns 0 on success.
int pt_save_framebuffer_png(const char* path, const float* fb, int width,
                            int height) {
  std::vector<uint8_t> rgb(static_cast<size_t>(width) * height * 3);
  pt_tonemap(fb, width, height, rgb.data());
  return pt_write_png(path, rgb.data(), width, height);
}

}  // extern "C"
