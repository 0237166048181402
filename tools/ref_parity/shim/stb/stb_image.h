// stb_image shim for the reference-parity build: no JPEG/PNG decoder here —
// tools/ref_parity/run_reference.py pre-decodes every image the reference
// loads (texture.hpp:103-104) into "<path>.raw" files with PIL, format:
//   magic "PTRW" | int32 LE width | int32 LE height | w*h*3 RGB8 bytes
// stbi_load() reads those.  Returning 3-channel RGB8 exactly matches the
// reference's stbi_load(..., bytes_per_pixel=3) call.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

typedef unsigned char stbi_uc;

static const char* stbi__failure = "";

inline const char* stbi_failure_reason() { return stbi__failure; }

inline stbi_uc* stbi_load(const char* filename, int* x, int* y,
                          int* channels_in_file, int desired_channels) {
  std::string raw = std::string(filename) + ".raw";
  FILE* f = std::fopen(raw.c_str(), "rb");
  if (!f) {
    stbi__failure = "pre-decoded .raw file not found (run run_reference.py)";
    return nullptr;
  }
  char magic[4];
  std::int32_t w = 0, h = 0;
  if (std::fread(magic, 1, 4, f) != 4 || std::memcmp(magic, "PTRW", 4) != 0 ||
      std::fread(&w, 4, 1, f) != 1 || std::fread(&h, 4, 1, f) != 1 ||
      w <= 0 || h <= 0) {
    std::fclose(f);
    stbi__failure = "bad .raw header";
    return nullptr;
  }
  std::size_t n = static_cast<std::size_t>(w) * h * 3;
  stbi_uc* data = static_cast<stbi_uc*>(std::malloc(n));
  if (std::fread(data, 1, n, f) != n) {
    std::fclose(f);
    std::free(data);
    stbi__failure = "short .raw payload";
    return nullptr;
  }
  std::fclose(f);
  *x = w;
  *y = h;
  if (channels_in_file) *channels_in_file = 3;
  (void)desired_channels;  // reference always asks for 3
  return data;
}

inline void stbi_image_free(void* p) { std::free(p); }
