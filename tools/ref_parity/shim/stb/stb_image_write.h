// stb_image_write shim: writes the same "PTRW" raw format stb_image.h's
// shim reads (the harness converts it to PNG with PIL).  Signature matches
// the one call site, main.cpp:57.
#pragma once

#include <cstdint>
#include <cstdio>

inline int stbi_write_png(const char* filename, int w, int h, int comp,
                          const void* data, int stride_in_bytes) {
  if (comp != 3) return 0;
  FILE* f = std::fopen(filename, "wb");
  if (!f) return 0;
  std::int32_t wi = w, hi = h;
  std::fwrite("PTRW", 1, 4, f);
  std::fwrite(&wi, 4, 1, f);
  std::fwrite(&hi, 4, 1, f);
  const unsigned char* p = static_cast<const unsigned char*>(data);
  for (int j = 0; j < h; ++j) std::fwrite(p + j * stride_in_bytes, 1, w * 3, f);
  std::fclose(f);
  return 1;
}
