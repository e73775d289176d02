// flowviz — native host-side visualization kernels for the streaming video
// pipeline (C ABI, loaded via ctypes; see flowviz.py).
//
// The 30+ fps overlay target (BASELINE.md, streaming config) is bottlenecked
// on host work per frame once the TPU produces flow asynchronously.  The
// numpy implementation of the Middlebury flow→color conversion
// (viz/colorwheel.py, itself a clone of the reference's
// pwc_extract_flow.py:58-123) makes ~10 full-frame passes; this single-pass
// C++ version is the production path, with numpy as fallback and the
// correctness oracle (tests/test_flowviz_native.py).
//
// Exposed functions:
//   ofv_flow_to_color : (H,W,2) f32 flow -> (H,W,3) u8 RGB, Middlebury wheel
//   ofv_flow_max_rad  : max |flow| (for cross-frame normalization)
//   ofv_resize_flow_bilinear : half-pixel bilinear flow resize + vector
//                              rescale (the per-frame quarter->full step)
//   ofv_draw_segments : batch 8-connected thickness-1 segments, bit-exact
//                       vs cv2.line incl. rect clipping (arrow overlays)

#include <cmath>
#include <cstdint>
#include <algorithm>

namespace {

constexpr int kSeg[6] = {15, 6, 4, 11, 13, 6};  // RY YG GC CB BM MR
constexpr int kNCols = 55;

struct Wheel {
  uint8_t rgb[kNCols][3];
  Wheel() {
    int col = 0;
    auto ramp = [](int i, int n) {
      return static_cast<uint8_t>(std::floor(255.0 * i / n));
    };
    for (int i = 0; i < kSeg[0]; ++i, ++col) {  // RY: R=255, G up
      rgb[col][0] = 255; rgb[col][1] = ramp(i, kSeg[0]); rgb[col][2] = 0;
    }
    for (int i = 0; i < kSeg[1]; ++i, ++col) {  // YG: R down, G=255
      rgb[col][0] = 255 - ramp(i, kSeg[1]); rgb[col][1] = 255; rgb[col][2] = 0;
    }
    for (int i = 0; i < kSeg[2]; ++i, ++col) {  // GC: G=255, B up
      rgb[col][0] = 0; rgb[col][1] = 255; rgb[col][2] = ramp(i, kSeg[2]);
    }
    for (int i = 0; i < kSeg[3]; ++i, ++col) {  // CB: G down, B=255
      rgb[col][0] = 0; rgb[col][1] = 255 - ramp(i, kSeg[3]); rgb[col][2] = 255;
    }
    for (int i = 0; i < kSeg[4]; ++i, ++col) {  // BM: B=255, R up
      rgb[col][0] = ramp(i, kSeg[4]); rgb[col][1] = 0; rgb[col][2] = 255;
    }
    for (int i = 0; i < kSeg[5]; ++i, ++col) {  // MR: B down, R=255
      rgb[col][0] = 255; rgb[col][1] = 0; rgb[col][2] = 255 - ramp(i, kSeg[5]);
    }
  }
};
const Wheel kWheel;

}  // namespace

extern "C" {

double ofv_flow_max_rad(const float* flow, int64_t n_px) {
  double m = 0.0;
  for (int64_t i = 0; i < n_px; ++i) {
    const double u = flow[2 * i], v = flow[2 * i + 1];
    const double r = u * u + v * v;
    if (r > m) m = r;
  }
  return std::sqrt(m);
}

// max_rad <= 0 means: normalize by this frame's own max (reference behavior).
void ofv_flow_to_color(const float* flow, int64_t h, int64_t w,
                       double max_rad, uint8_t* out) {
  const int64_t n = h * w;
  if (max_rad <= 0.0) max_rad = ofv_flow_max_rad(flow, n);
  const double inv_max = 1.0 / (max_rad + 1e-5);
  for (int64_t i = 0; i < n; ++i) {
    const double u = flow[2 * i], v = flow[2 * i + 1];
    const double rad = std::sqrt(u * u + v * v);
    // fk in [1, 55]; lerp between wheel[(k0-1)%55] and wheel[k0%55]
    const double ang = std::atan2(-v, -u) / M_PI;            // [-1, 1]
    const double fk = (ang + 1.0) * 0.5 * (kNCols - 1) + 1.0;
    const int k0 = static_cast<int>(std::floor(fk));
    const double f = fk - k0;
    const int i0 = ((k0 - 1) % kNCols + kNCols) % kNCols;
    const int i1 = (k0 % kNCols + kNCols) % kNCols;
    const double rn = std::min(std::max(rad * inv_max, 0.0), 1.0);
    for (int ch = 0; ch < 3; ++ch) {
      const double c0 = kWheel.rgb[i0][ch] / 255.0;
      const double c1 = kWheel.rgb[i1][ch] / 255.0;
      const double col = 1.0 - rn * (1.0 - ((1.0 - f) * c0 + f * c1));
      out[3 * i + ch] = static_cast<uint8_t>(
          std::min(std::max(col, 0.0), 1.0) * 255.0);
    }
  }
}

// Half-pixel bilinear resize of an (h,w,2) flow field to (oh,ow), scaling
// u by ow/w and v by oh/h (the create_quiver_frame resize,
// pwc_extract_flow_video.py:100-107).
void ofv_resize_flow_bilinear(const float* flow, int64_t h, int64_t w,
                              int64_t oh, int64_t ow, float* out) {
  const double sx = static_cast<double>(w) / ow;
  const double sy = static_cast<double>(h) / oh;
  const float vsx = static_cast<float>(ow) / w;
  const float vsy = static_cast<float>(oh) / h;
  for (int64_t y = 0; y < oh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    fy = std::min(std::max(fy, 0.0), static_cast<double>(h - 1));
    const int64_t y0 = std::min(static_cast<int64_t>(fy), h - 2 >= 0 ? h - 2 : 0);
    const double wy = fy - y0;
    for (int64_t x = 0; x < ow; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      fx = std::min(std::max(fx, 0.0), static_cast<double>(w - 1));
      const int64_t x0 = std::min(static_cast<int64_t>(fx),
                                  w - 2 >= 0 ? w - 2 : 0);
      const double wx = fx - x0;
      const int64_t y1 = std::min(y0 + 1, h - 1), x1 = std::min(x0 + 1, w - 1);
      for (int ch = 0; ch < 2; ++ch) {
        const double a = flow[(y0 * w + x0) * 2 + ch];
        const double b = flow[(y0 * w + x1) * 2 + ch];
        const double c = flow[(y1 * w + x0) * 2 + ch];
        const double d = flow[(y1 * w + x1) * 2 + ch];
        const double top = a + (b - a) * wx;
        const double bot = c + (d - c) * wx;
        const double val = top + (bot - top) * wy;
        out[(y * ow + x) * 2 + ch] =
            static_cast<float>(val) * (ch == 0 ? vsx : vsy);
      }
    }
  }
}

}  // extern "C"

namespace {

// Iterative outcode clip of a segment to [0, w-1] x [0, h-1], with the same
// integer intersection arithmetic OpenCV's clipLine uses (truncating int64
// division, y-sides first, endpoint-at-a-time recode).  Matching the clip
// exactly matters: the rasterizer below accumulates Bresenham error from the
// (clipped) start point, so a clip that lands one pixel off produces a
// visibly different line.  Verified bit-exact vs cv2 in
// tests/test_flowviz_native.py.
bool ClipSegment(int64_t w, int64_t h, int64_t& x1, int64_t& y1,
                 int64_t& x2, int64_t& y2) {
  const int64_t right = w - 1, bottom = h - 1;
  if (w <= 0 || h <= 0) return false;
  auto code = [&](int64_t x, int64_t y) {
    return (x < 0 ? 1 : 0) + (x > right ? 2 : 0) +
           (y < 0 ? 4 : 0) + (y > bottom ? 8 : 0);
  };
  int c1 = code(x1, y1), c2 = code(x2, y2);
  if ((c1 & c2) == 0 && (c1 | c2) != 0) {
    int64_t a;
    if (c1 & 12) {
      a = c1 < 8 ? 0 : bottom;
      x1 += (a - y1) * (x2 - x1) / (y2 - y1);
      y1 = a;
      c1 = (x1 < 0 ? 1 : 0) + (x1 > right ? 2 : 0);
    }
    if (c2 & 12) {
      a = c2 < 8 ? 0 : bottom;
      x2 += (a - y2) * (x2 - x1) / (y2 - y1);
      y2 = a;
      c2 = (x2 < 0 ? 1 : 0) + (x2 > right ? 2 : 0);
    }
    if ((c1 & c2) == 0 && (c1 | c2) != 0) {
      if (c1) {
        a = c1 == 1 ? 0 : right;
        y1 += (a - x1) * (y2 - y1) / (x2 - x1);
        x1 = a;
        c1 = 0;
      }
      if (c2) {
        a = c2 == 1 ? 0 : right;
        y2 += (a - x2) * (y2 - y1) / (x2 - x1);
        x2 = a;
        c2 = 0;
      }
    }
  }
  return (c1 | c2) == 0;
}

}  // namespace

extern "C" {

// Draw n 8-connected thickness-1 segments into an (h, w, 3) u8 image,
// in place.  segs is (n, 4) int32 [x1, y1, x2, y2]; out-of-bounds endpoints
// are rect-clipped first.  Bit-exact vs a loop of cv2.line(..., thickness=1)
// — i.e. vs the reference's per-arrow cv2.line calls
// (pwc_extract_flow_video.py:94-142) — via the same left-to-right endpoint
// normalization and half-error tie-breaking.  ~8x faster than one batched
// cv2.polylines call (PERF.md round-3), because OpenCV re-enters its
// generic LineIterator machinery per segment.
void ofv_draw_segments(uint8_t* img, int64_t h, int64_t w,
                       const int32_t* segs, int64_t n,
                       uint8_t b, uint8_t g, uint8_t r) {
  for (int64_t s = 0; s < n; ++s) {
    int64_t x1 = segs[4 * s], y1 = segs[4 * s + 1];
    int64_t x2 = segs[4 * s + 2], y2 = segs[4 * s + 3];
    if (!ClipSegment(w, h, x1, y1, x2, y2)) continue;
    int64_t dx = x2 - x1, dy = y2 - y1;
    int64_t delta_x = 1, delta_y = 1;
    if (dx < 0) {  // draw left-to-right, like cv2's LineIterator
      dx = -dx; dy = -dy;
      x1 = x2; y1 = y2;
    }
    if (dy < 0) { dy = -dy; delta_y = -1; }
    const bool vert = dy > dx;
    if (vert) { std::swap(dx, dy); std::swap(delta_x, delta_y); }
    int64_t err = dx - (dy + dy);
    const int64_t plus_delta = dx + dx;
    const int64_t minus_delta = -(dy + dy);
    const int64_t count = dx + 1;
    const int64_t step_major = (vert ? w * 3 : 3) * delta_x;
    const int64_t step_minor = (vert ? 3 : w * 3) * delta_y;
    uint8_t* p = img + (y1 * w + x1) * 3;
    for (int64_t i = 0; i < count; ++i) {
      p[0] = b; p[1] = g; p[2] = r;
      const int64_t mask = err < 0 ? -1 : 0;
      err += minus_delta + (plus_delta & mask);
      p += step_major + (step_minor & mask);
    }
  }
}

}  // extern "C"
