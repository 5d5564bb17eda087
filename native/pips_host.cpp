// Host data-plane kernels for pips-tpu.
//
// The training input pipeline's host-CPU hot loops (FlyingThings++ sample
// assembly: PFM mask decode, occluder compositing, per-frame bilinear
// resizing — see pips_tpu/data/flyingthings.py) implemented natively and
// exposed through a C ABI for ctypes. The TPU compute path stays in
// JAX/XLA/Pallas; this keeps the host feed from stalling the device.
//
// Build: native/build.sh  (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <algorithm>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// PFM decode: parse header + big/little endian float payload, flip rows.
// Returns 0 on success; fills width/height/channels. `out` must hold
// height*width*channels floats (call once with out=nullptr to query dims).
// ---------------------------------------------------------------------------
int pips_decode_pfm(const uint8_t* buf, int64_t len, float* out,
                    int32_t* width, int32_t* height, int32_t* channels) {
  if (len < 8) return -1;
  int64_t pos = 0;
  auto read_line = [&](char* dst, int maxlen) -> bool {
    int i = 0;
    while (pos < len && i < maxlen - 1) {
      char c = static_cast<char>(buf[pos++]);
      if (c == '\n') break;
      dst[i++] = c;
    }
    dst[i] = 0;
    return i > 0;
  };

  char line[128];
  if (!read_line(line, sizeof line)) return -2;
  int ch;
  if (strcmp(line, "PF") == 0) ch = 3;
  else if (strcmp(line, "Pf") == 0) ch = 1;
  else return -3;

  if (!read_line(line, sizeof line)) return -4;
  int w, h;
  if (sscanf(line, "%d %d", &w, &h) != 2) return -5;

  if (!read_line(line, sizeof line)) return -6;
  double scale = atof(line);
  bool little_endian = scale < 0;

  *width = w;
  *height = h;
  *channels = ch;
  if (out == nullptr) return 0;

  int64_t n = static_cast<int64_t>(w) * h * ch;
  if (len - pos < n * 4) return -7;
  const uint8_t* data = buf + pos;

  // rows are stored bottom-up
  for (int y = 0; y < h; y++) {
    const uint8_t* src_row = data + static_cast<int64_t>(h - 1 - y) * w * ch * 4;
    float* dst_row = out + static_cast<int64_t>(y) * w * ch;
    if (little_endian) {
      memcpy(dst_row, src_row, static_cast<size_t>(w) * ch * 4);
    } else {
      for (int i = 0; i < w * ch; i++) {
        uint32_t v;
        memcpy(&v, src_row + i * 4, 4);
        v = __builtin_bswap32(v);
        memcpy(dst_row + i, &v, 4);
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Occluder compositing over a whole clip:
//   rgb[s] = rgb[s] * (1 - mask[s]) + alt[s] * mask[s]
// rgb/alt: (S, H, W, 3) float32; mask: (S, H, W) float32 in [0, 1].
// ---------------------------------------------------------------------------
void pips_composite(float* rgb, const float* alt, const float* mask,
                    int32_t S, int32_t H, int32_t W) {
  const int64_t hw = static_cast<int64_t>(H) * W;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < static_cast<int64_t>(S) * hw; i++) {
    float m = mask[i];
    if (m == 0.0f) continue;
    float inv = 1.0f - m;
    rgb[i * 3 + 0] = rgb[i * 3 + 0] * inv + alt[i * 3 + 0] * m;
    rgb[i * 3 + 1] = rgb[i * 3 + 1] * inv + alt[i * 3 + 1] * m;
    rgb[i * 3 + 2] = rgb[i * 3 + 2] * inv + alt[i * 3 + 2] * m;
  }
}

// ---------------------------------------------------------------------------
// Bilinear resize (half-pixel centers, cv2.INTER_LINEAR semantics).
// src: (H, W, C) float32 -> dst: (H2, W2, C).
// ---------------------------------------------------------------------------
void pips_resize_bilinear(const float* src, int32_t H, int32_t W, int32_t C,
                          float* dst, int32_t H2, int32_t W2) {
  const float sy = static_cast<float>(H) / H2;
  const float sx = static_cast<float>(W) / W2;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int y = 0; y < H2; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(floorf(fy));
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), H - 1);
    int y1c = std::min(std::max(y0 + 1, 0), H - 1);
    for (int x = 0; x < W2; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(floorf(fx));
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), W - 1);
      int x1c = std::min(std::max(x0 + 1, 0), W - 1);
      const float* p00 = src + (static_cast<int64_t>(y0c) * W + x0c) * C;
      const float* p01 = src + (static_cast<int64_t>(y0c) * W + x1c) * C;
      const float* p10 = src + (static_cast<int64_t>(y1c) * W + x0c) * C;
      const float* p11 = src + (static_cast<int64_t>(y1c) * W + x1c) * C;
      float* d = dst + (static_cast<int64_t>(y) * W2 + x) * C;
      for (int c = 0; c < C; c++) {
        float top = p00[c] * (1 - wx) + p01[c] * wx;
        float bot = p10[c] * (1 - wx) + p11[c] * wx;
        d[c] = top * (1 - wy) + bot * wy;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Forward-flow trajectory chaining for dataset generation
// (pips_tpu/datagen/trajs.py hot loop): one step for all points.
// flow: (H, W, 2); coords: (N, 2) updated in place (sampled at rounded,
// border-replicated positions — reference make_trajs.py semantics).
// ---------------------------------------------------------------------------
void pips_chain_step(const float* flow, int32_t H, int32_t W,
                     float* coords, int64_t N) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t n = 0; n < N; n++) {
    float x = roundf(coords[n * 2 + 0]);
    float y = roundf(coords[n * 2 + 1]);
    // border-replicating bilinear at integer coords == clamped pixel lookup
    int xi = std::min(std::max(static_cast<int>(x), 0), W - 1);
    int yi = std::min(std::max(static_cast<int>(y), 0), H - 1);
    const float* f = flow + (static_cast<int64_t>(yi) * W + xi) * 2;
    coords[n * 2 + 0] += f[0];
    coords[n * 2 + 1] += f[1];
  }
}

// ---------------------------------------------------------------------------
// Deferred occluder coverage, one frame (pips_tpu/data/flyingthings.py
// _mark_covered_by_later_layers): zero vis[n] where the topmost pasted
// layer at the point's rounded in-bounds pixel is newer than the point's
// own birth layer. nearbyintf under the default rounding mode matches
// np.round (round-half-to-even).
// painter: (H, W) uint8; trajs: (N, 2) float32; birth: (N) int32;
// vis: (N) float32, zeroed in place.
// ---------------------------------------------------------------------------
void pips_mark_covered_frame(const uint8_t* painter, const float* trajs,
                             const int32_t* birth, float* vis,
                             int32_t H, int32_t W, int64_t N) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t n = 0; n < N; n++) {
    int ix = static_cast<int>(nearbyintf(trajs[n * 2 + 0]));
    int iy = static_cast<int>(nearbyintf(trajs[n * 2 + 1]));
    if (ix < 0 || ix > W - 1 || iy < 0 || iy > H - 1) continue;
    if (static_cast<int32_t>(painter[static_cast<int64_t>(iy) * W + ix])
        > birth[n]) {
      vis[n] = 0.0f;
    }
  }
}

// ---------------------------------------------------------------------------
// Post-aug visibility bookkeeping, one frame (pips_tpu/data/flyingthings.py
// visibility_filter): a point on an occ==255 padding pixel (rounded coords,
// in-bounds) or out of bounds (unrounded coords) becomes invisible; also
// emits the float-coords in-bounds mask the trajectory filters consume.
// occ: (H, W) float32; trajs: (N, 2) float32; vis: (N) float32 in/out;
// inb_f: (N) uint8 out (0/1).
// ---------------------------------------------------------------------------
void pips_visibility_frame(const float* trajs, const float* occ,
                           float* vis, uint8_t* inb_f,
                           int32_t H, int32_t W, int64_t N) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t n = 0; n < N; n++) {
    float x = trajs[n * 2 + 0];
    float y = trajs[n * 2 + 1];
    int rx = static_cast<int>(nearbyintf(x));
    int ry = static_cast<int>(nearbyintf(y));
    bool inb_r = rx >= 0 && rx <= W - 1 && ry >= 0 && ry <= H - 1;
    int xcl = std::min(std::max(rx, 0), W - 1);
    int ycl = std::min(std::max(ry, 0), H - 1);
    bool on_pad = occ[static_cast<int64_t>(ycl) * W + xcl] == 255.0f;
    bool inf = x >= 0.0f && x <= static_cast<float>(W - 1)
            && y >= 0.0f && y <= static_cast<float>(H - 1);
    if ((on_pad && inb_r) || !inf) vis[n] = 0.0f;
    inb_f[n] = inf ? 1 : 0;
  }
}

// ---------------------------------------------------------------------------
// Eraser/replace-aug coverage (pips_tpu/data/augs.py _mark_in_rects):
// zero vis[n] where the float point lies in any half-open integer rect.
// rects: (R, 4) int32 rows (x0, x1, y0, y1). Definitional semantics —
// (x >= x0) & (x < x1) & (y >= y0) & (y < y1) — with early exit; most
// points fail the first compare, so this is ~2 compares/point.
// ---------------------------------------------------------------------------
void pips_mark_in_rects(const float* trajs, const int32_t* rects, int32_t R,
                        float* vis, int64_t N) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t n = 0; n < N; n++) {
    float x = trajs[n * 2 + 0];
    float y = trajs[n * 2 + 1];
    for (int32_t r = 0; r < R; r++) {
      const int32_t* rc = rects + r * 4;
      if (x >= static_cast<float>(rc[0]) && x < static_cast<float>(rc[1])
          && y >= static_cast<float>(rc[2]) && y < static_cast<float>(rc[3])) {
        vis[n] = 0.0f;
        break;
      }
    }
  }
}

int pips_native_version() { return 3; }

}  // extern "C"
