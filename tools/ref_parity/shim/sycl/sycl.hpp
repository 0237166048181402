// Minimal host-only SYCL shim — just enough of the SYCL 2020 API surface to
// compile the UNMODIFIED reference path tracer (/root/reference) on a plain
// C++20 host toolchain, for golden-image parity testing of the TPU build.
//
// The reference's own default backend (triSYCL) is also a host library that
// runs kernels as ordinary CPU code (FindTriSYCL.cmake:165), so executing
// the kernel lambda directly on the host reproduces the reference's default
// semantics: same C++ float math, same std::hash<size_t> (identity in
// libstdc++) per-pixel RNG seeds (render.hpp:130-131).  parallel_for runs
// the item grid with OpenMP when enabled (pixel work items are independent;
// each builds its own RNG from its linear id, so schedule does not matter).
//
// API surface implemented = exactly what the reference uses (see
// SURVEY.md §1 L0): float3, buffer<T,1/2>, handler::parallel_for /
// single_task, item<2>/id<2>, accessor with [][] and get_pointer(),
// global_ptr, queue::submit, and the sycl:: math functions.
#pragma once

#include <array>
#include <cassert>  // texture.hpp:99,127 use assert without <cassert>;
                    // triSYCL's headers pull it in transitively
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <memory>
#include <vector>

namespace sycl {

// ---------------------------------------------------------------------------
// vec<float,3>
// ---------------------------------------------------------------------------
struct float3 {
  float v[3];
  constexpr float3() : v{0, 0, 0} {}
  constexpr float3(float a) : v{a, a, a} {}
  constexpr float3(float x_, float y_, float z_) : v{x_, y_, z_} {}
  float& x() { return v[0]; }
  float& y() { return v[1]; }
  float& z() { return v[2]; }
  const float& x() const { return v[0]; }
  const float& y() const { return v[1]; }
  const float& z() const { return v[2]; }

  friend float3 operator+(const float3& a, const float3& b) {
    return {a.v[0] + b.v[0], a.v[1] + b.v[1], a.v[2] + b.v[2]};
  }
  friend float3 operator-(const float3& a, const float3& b) {
    return {a.v[0] - b.v[0], a.v[1] - b.v[1], a.v[2] - b.v[2]};
  }
  friend float3 operator*(const float3& a, const float3& b) {
    return {a.v[0] * b.v[0], a.v[1] * b.v[1], a.v[2] * b.v[2]};
  }
  friend float3 operator/(const float3& a, const float3& b) {
    return {a.v[0] / b.v[0], a.v[1] / b.v[1], a.v[2] / b.v[2]};
  }
  friend float3 operator*(const float3& a, float s) {
    return {a.v[0] * s, a.v[1] * s, a.v[2] * s};
  }
  friend float3 operator*(float s, const float3& a) { return a * s; }
  friend float3 operator/(const float3& a, float s) {
    return {a.v[0] / s, a.v[1] / s, a.v[2] / s};
  }
  float3& operator+=(const float3& b) {
    v[0] += b.v[0]; v[1] += b.v[1]; v[2] += b.v[2];
    return *this;
  }
  float3& operator-=(const float3& b) {
    v[0] -= b.v[0]; v[1] -= b.v[1]; v[2] -= b.v[2];
    return *this;
  }
  float3& operator*=(const float3& b) {
    v[0] *= b.v[0]; v[1] *= b.v[1]; v[2] *= b.v[2];
    return *this;
  }
  float3& operator/=(float s) {
    v[0] /= s; v[1] /= s; v[2] /= s;
    return *this;
  }
};

// ---- math builtins (scalar + float3 overloads used by the reference) ------
inline float dot(const float3& a, const float3& b) {
  // SYCL dot = x*x + y*y + z*z evaluated as fma chain on most hosts; plain
  // left-to-right float sum matches triSYCL's host implementation.
  return a.v[0] * b.v[0] + a.v[1] * b.v[1] + a.v[2] * b.v[2];
}
inline float3 cross(const float3& a, const float3& b) {
  return {a.v[1] * b.v[2] - a.v[2] * b.v[1],
          a.v[2] * b.v[0] - a.v[0] * b.v[2],
          a.v[0] * b.v[1] - a.v[1] * b.v[0]};
}
inline float length(const float3& a) { return std::sqrt(dot(a, a)); }

inline float sqrt(float x) { return std::sqrt(x); }
inline float sin(float x) { return std::sin(x); }
inline float cos(float x) { return std::cos(x); }
inline float tan(float x) { return std::tan(x); }
inline float fabs(float x) { return std::fabs(x); }
inline float fmod(float x, float y) { return std::fmod(x, y); }
inline float fmin(float x, float y) { return std::fmin(x, y); }
inline float fma(float a, float b, float c) { return std::fma(a, b, c); }
inline float pow(float x, float y) { return std::pow(x, y); }
inline float log(float x) { return std::log(x); }
inline float atan(float x) { return std::atan(x); }
inline float atan2(float y, float x) { return std::atan2(y, x); }
inline float asin(float x) { return std::asin(x); }

// ---------------------------------------------------------------------------
// ranges / items
// ---------------------------------------------------------------------------
template <int Dims> struct range;
template <> struct range<1> {
  std::size_t d0;
  range(std::size_t a) : d0(a) {}
  std::size_t size() const { return d0; }
};
template <> struct range<2> {
  std::size_t d0, d1;
  range(std::size_t a, std::size_t b) : d0(a), d1(b) {}
  std::size_t size() const { return d0 * d1; }
};

template <int Dims> struct id;
template <> struct id<2> {
  std::size_t i[2];
  std::size_t operator[](int k) const { return i[k]; }
};

template <int Dims> struct item;
template <> struct item<2> {
  id<2> gid;
  range<2> rng;
  id<2> get_id() const { return gid; }
  std::size_t get_linear_id() const { return gid.i[0] * rng.d1 + gid.i[1]; }
};

// ---------------------------------------------------------------------------
// global_ptr: host pointer
// ---------------------------------------------------------------------------
template <typename T> struct global_ptr {
  T* p = nullptr;
  global_ptr() = default;
  global_ptr(T* q) : p(q) {}
  T& operator[](std::size_t k) const { return p[k]; }
  T& operator*() const { return *p; }
};

// ---------------------------------------------------------------------------
// access modes / accessor / buffer
// ---------------------------------------------------------------------------
namespace access {
enum class mode { read, write, read_write, discard_write };
}

class handler;

template <typename T, int Dims> class buffer;

// accessor holds a raw view into the buffer's storage (host execution: no
// copies needed; triSYCL equally aliases host memory for host buffers).
template <typename T, int Dims> struct accessor;

template <typename T> struct accessor<T, 1> {
  T* data;
  std::size_t n;
  T& operator[](std::size_t k) const { return data[k]; }
  std::size_t get_count() const { return n; }
  std::size_t size() const { return n; }
  global_ptr<T> get_pointer() const { return {data}; }
};

template <typename T> struct accessor<T, 2> {
  T* data;
  std::size_t rows, cols;
  struct row_ref {
    T* r;
    T& operator[](std::size_t j) const { return r[j]; }
  };
  row_ref operator[](std::size_t i) const { return {data + i * cols}; }
  T& operator[](id<2> g) const { return data[g.i[0] * cols + g.i[1]]; }
  global_ptr<T> get_pointer() const { return {data}; }
};

template <typename T> class buffer<T, 1> {
 public:
  buffer(T* host, range<1> r) : ptr_(host), n_(r.d0) {}
  explicit buffer(range<1> r) : own_(r.d0), ptr_(own_.data()), n_(r.d0) {}
  template <access::mode M> accessor<T, 1> get_access(handler&) {
    return {ptr_, n_};
  }
  template <access::mode M> accessor<T, 1> get_access() { return {ptr_, n_}; }

 private:
  std::vector<T> own_;
  T* ptr_;
  std::size_t n_;
};

template <typename T> class buffer<T, 2> {
 public:
  buffer(T* host, range<2> r) : ptr_(host), rows_(r.d0), cols_(r.d1) {}
  explicit buffer(range<2> r)
      : own_(r.d0 * r.d1), ptr_(own_.data()), rows_(r.d0), cols_(r.d1) {}
  template <access::mode M> accessor<T, 2> get_access(handler&) {
    return {ptr_, rows_, cols_};
  }
  template <access::mode M> accessor<T, 2> get_access() {
    return {ptr_, rows_, cols_};
  }

 private:
  std::vector<T> own_;
  T* ptr_;
  std::size_t rows_, cols_;
};

// ---------------------------------------------------------------------------
// handler / queue: immediate host execution
// ---------------------------------------------------------------------------
class handler {
 public:
  template <typename KernelName, typename F>
  void parallel_for(range<2> global, F&& f) {
    const long H = static_cast<long>(global.d0);
    const long W = static_cast<long>(global.d1);
#pragma omp parallel for collapse(2) schedule(dynamic, 8)
    for (long r = 0; r < H; ++r)
      for (long c = 0; c < W; ++c) {
        item<2> it{{{static_cast<std::size_t>(r),
                     static_cast<std::size_t>(c)}},
                   global};
        f(it);
      }
  }
  template <typename KernelName, typename F> void single_task(F&& f) { f(); }
};

class queue {
 public:
  template <typename F> void submit(F&& cgf) {
    handler cgh;
    cgf(cgh);
  }
};

}  // namespace sycl
