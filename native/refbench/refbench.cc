// Reference-style CPU hot-loop benchmark.
//
// The upstream YA_VO binary cannot be built here (it needs Sophus, g2o and
// Pangolin, which this image lacks; see /root/reference/CMakeLists.txt), so
// this program re-implements the reference's PER-FRAME HOT LOOPS faithfully
// IN ALGORITHM AND IMPLEMENTATION STYLE — per-pixel scalar loops, per-pixel
// Bresenham circle re-derivation through an ordered set, naive O(H*W*9)
// convolutions, per-bit Hamming popcount — and times them on a real KITTI
// frame (the reference's own tests/epilines.png render, 1241x376). It is an
// independent implementation written from the structural survey of the
// reference (SURVEY.md §2.1, §3.2); no reference code is copied.
//
// What is timed, mapped to the reference call stack (src/LoopHandler.cc):
//   fast_ms   ~ FastDetector::getFastFeatures   (FastDetector.cc:277-369)
//   brief_ms  ~ Brief::computeBrief             (BriefDescriptor.cc:86-124)
//   match_ms  ~ Brief::matchFeatures            (BriefDescriptor.cc:163-183)
//   lk_ms     ~ cv::calcOpticalFlowPyrLK        (LoopHandler.cc:372-375,
//               the EXACT library call the reference makes: 11x11, 3 levels,
//               30 iters / eps 0.01)
// The only hot component NOT timed is g2o pose-only BA (library absent);
// per SURVEY §3.2 the front end dominates by an order of magnitude.
//
// Output: one JSON line with per-stage ms and the implied reference-style
// frames/s for the steady-state loop (fast + brief + lk).

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/video/tracking.hpp>

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <random>
#include <set>
#include <vector>

using Clock = std::chrono::steady_clock;

static double ms_since(Clock::time_point t0) {
  return std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
}

// ---------------------------------------------------------------------------
// FAST-12, reference style: the 16-point radius-3 Bresenham circle is
// re-derived for EVERY pixel via the midpoint algorithm with std::set
// ordering (the reference builds two sets per pixel in
// getBresenhamCirclePoints, FastDetector.cc:50-112).
// ---------------------------------------------------------------------------
struct Feat {
  int r, c;
  double score;
};

static std::vector<std::pair<int, int>> bresenham_circle_at(int r, int c) {
  // midpoint circle, radius 3, collected in angular order through a set
  std::set<std::pair<int, int>> pts;
  int radius = 3;
  int x = 0, y = radius, d = 3 - 2 * radius;
  while (x <= y) {
    const int xs[8] = {x, y, y, x, -x, -y, -y, -x};
    const int ys[8] = {-y, -x, x, y, y, x, -x, -y};
    for (int k = 0; k < 8; ++k) pts.insert({xs[k], ys[k]});
    if (d <= 0) {
      d += 4 * x + 6;
    } else {
      d += 4 * (x - y) + 10;
      --y;
    }
    ++x;
  }
  std::vector<std::pair<int, int>> out;
  out.reserve(pts.size());
  for (auto &p : pts) out.push_back({r + p.second, c + p.first});
  return out;
}

static bool contiguous12(const std::vector<uint8_t> &ring, uint8_t center,
                         int thr) {
  // 12 contiguous ring pixels all brighter or all darker (reference
  // checkContiguousPixels, FastDetector.cc:135-153 — linear scan)
  const int n = (int)ring.size();
  for (int dir = 0; dir < 2; ++dir) {
    for (int s = 0; s < n; ++s) {
      int run = 0;
      for (int k = 0; k < 12; ++k) {
        const uint8_t v = ring[(s + k) % n];
        const bool ok = dir == 0 ? (v > center + thr) : (v < center - thr);
        if (!ok) break;
        ++run;
      }
      if (run >= 12) return true;
    }
  }
  return false;
}

// naive O(H*W*9) full-image convolution (reference convolve2d,
// FastDetector.cc:164-200) used twice for Sobel
static void convolve3x3(const cv::Mat &src, const double k[9], cv::Mat &dst) {
  dst.create(src.rows, src.cols, CV_64F);
  dst.setTo(0);
  for (int r = 1; r + 1 < src.rows; ++r)
    for (int c = 1; c + 1 < src.cols; ++c) {
      double acc = 0;
      for (int dr = -1; dr <= 1; ++dr)
        for (int dc = -1; dc <= 1; ++dc)
          acc += k[(dr + 1) * 3 + (dc + 1)] *
                 src.at<uint8_t>(r + dr, c + dc);
      dst.at<double>(r, c) = acc;
    }
}

static std::vector<Feat> fast_features(const cv::Mat &img, int thr,
                                       int top_k) {
  // Harris precompute: two naive Sobel convolutions over the whole image
  const double kx[9] = {-1, 0, 1, -2, 0, 2, -1, 0, 1};
  const double ky[9] = {-1, -2, -1, 0, 0, 0, 1, 2, 1};
  cv::Mat gx, gy;
  convolve3x3(img, kx, gx);
  convolve3x3(img, ky, gy);

  std::vector<Feat> feats;
  for (int r = 4; r + 4 < img.rows; ++r) {
    for (int c = 4; c + 4 < img.cols; ++c) {
      const uint8_t center = img.at<uint8_t>(r, c);
      // per-pixel circle re-derivation (the reference's dominant cost)
      auto circle = bresenham_circle_at(r, c);
      // cardinal early reject: >= 3 of 4 must clear the band
      int cardinal = 0;
      for (int idx : {0, 4, 8, 12}) {
        const uint8_t v = img.at<uint8_t>(circle[idx].first,
                                          circle[idx].second);
        if (v > center + thr || v < center - thr) ++cardinal;
      }
      if (cardinal < 3) continue;
      std::vector<uint8_t> ring(circle.size());
      for (size_t i = 0; i < circle.size(); ++i)
        ring[i] = img.at<uint8_t>(circle[i].first, circle[i].second);
      if (!contiguous12(ring, center, thr)) continue;
      // Harris response over a 3x3 window (reference
      // getHarrisCornerResponse, FastDetector.cc:244-273, k = 0.04)
      double sxx = 0, syy = 0, sxy = 0;
      for (int dr = -1; dr <= 1; ++dr)
        for (int dc = -1; dc <= 1; ++dc) {
          const double a = gx.at<double>(r + dr, c + dc);
          const double b = gy.at<double>(r + dr, c + dc);
          sxx += a * a;
          syy += b * b;
          sxy += a * b;
        }
      const double det = sxx * syy - sxy * sxy;
      const double tr = sxx + syy;
      feats.push_back({r, c, det - 0.04 * tr * tr});
    }
  }
  std::sort(feats.begin(), feats.end(),
            [](const Feat &a, const Feat &b) { return a.score > b.score; });
  if ((int)feats.size() > top_k) feats.resize(top_k);
  return feats;
}

// ---------------------------------------------------------------------------
// BRIEF-256 (reference Brief::computeBrief, BriefDescriptor.cc:86-124):
// 9x9 sigma-2.5 Gaussian pre-blur via OpenCV (the reference's exact call),
// then 256 pixel-pair comparisons packed into 32 bytes per keypoint.
// ---------------------------------------------------------------------------
struct Desc {
  uint8_t v[32];
};

static std::vector<Desc> brief_describe(
    const cv::Mat &img, const std::vector<Feat> &feats,
    const std::vector<std::array<int, 4>> &offsets) {
  cv::Mat blurred;
  cv::GaussianBlur(img, blurred, cv::Size(9, 9), 2.5);
  std::vector<Desc> out;
  out.reserve(feats.size());
  for (const auto &f : feats) {
    if (f.r < 9 || f.c < 9 || f.r >= img.rows - 9 || f.c >= img.cols - 9)
      continue;
    Desc d{};
    for (int b = 0; b < 256; ++b) {
      const auto &o = offsets[b];
      const uint8_t p = blurred.at<uint8_t>(f.r + o[0], f.c + o[1]);
      const uint8_t q = blurred.at<uint8_t>(f.r + o[2], f.c + o[3]);
      if (p < q) d.v[b >> 3] |= (uint8_t)(1u << (b & 7));
    }
    out.push_back(d);
  }
  return out;
}

// ---------------------------------------------------------------------------
// Brute-force one-directional matching with per-bit popcount loop
// (reference matchFeatures + hammingDistance + popCount,
// BriefDescriptor.cc:139-183)
// ---------------------------------------------------------------------------
static int hamming(const Desc &a, const Desc &b) {
  int d = 0;
  for (int i = 0; i < 32; ++i) {
    uint8_t x = (uint8_t)(a.v[i] ^ b.v[i]);
    while (x) {            // bit loop, not __builtin_popcount: the
      d += x & 1;          // reference counts bits one at a time
      x >>= 1;
    }
  }
  return d;
}

static int match_count(const std::vector<Desc> &a,
                       const std::vector<Desc> &b) {
  int kept = 0;
  int min_dist = 256;
  std::vector<int> best(a.size());
  for (size_t i = 0; i < a.size(); ++i) {
    int bd = 1 << 30, bj = -1;
    for (size_t j = 0; j < b.size(); ++j) {
      const int d = hamming(a[i], b[j]);
      if (d < bd) {
        bd = d;
        bj = (int)j;
      }
    }
    best[i] = bd;
    if (bd < min_dist) min_dist = bd;
    (void)bj;
  }
  const int gate = std::max(2 * min_dist, 20);
  for (int d : best)
    if (d < gate) ++kept;
  return kept;
}

int main(int argc, char **argv) {
  const char *path = argc > 1 ? argv[1] : "/root/reference/tests/epilines.png";
  const int reps = argc > 2 ? atoi(argv[2]) : 5;
  cv::Mat img = cv::imread(path, cv::IMREAD_GRAYSCALE);
  if (img.empty()) {
    fprintf(stderr, "cannot read %s\n", path);
    return 1;
  }
  // second frame for LK/matching: subpixel-shifted copy (real texture)
  cv::Mat shift = (cv::Mat_<double>(2, 3) << 1, 0, 3.37, 0, 1, -2.61);
  cv::Mat img2;
  cv::warpAffine(img, img2, shift, img.size());

  std::mt19937 rng(42);
  std::uniform_int_distribution<int> uni(-8, 8);
  std::vector<std::array<int, 4>> offsets(256);
  for (auto &o : offsets) o = {uni(rng), uni(rng), uni(rng), uni(rng)};

  double fast_ms = 0, brief_ms = 0, match_ms = 0, lk_ms = 0;
  std::vector<Feat> feats;
  std::vector<Desc> d1, d2;
  int n_match = 0, n_lk = 0;

  for (int it = 0; it < reps; ++it) {
    auto t0 = Clock::now();
    feats = fast_features(img, 40, 2000);
    fast_ms += ms_since(t0);

    t0 = Clock::now();
    d1 = brief_describe(img, feats, offsets);
    brief_ms += ms_since(t0);

    auto feats2 = fast_features(img2, 40, 2000);
    d2 = brief_describe(img2, feats2, offsets);

    t0 = Clock::now();
    n_match = match_count(d1, d2);
    match_ms += ms_since(t0);

    // LK exactly as the reference calls it (LoopHandler.cc:372-375)
    std::vector<cv::Point2f> p1, p2;
    for (const auto &f : feats) p1.push_back({(float)f.c, (float)f.r});
    p2 = p1;
    std::vector<uint8_t> status;
    std::vector<float> err;
    t0 = Clock::now();
    cv::calcOpticalFlowPyrLK(
        img, img2, p1, p2, status, err, cv::Size(11, 11), 3,
        cv::TermCriteria(cv::TermCriteria::COUNT + cv::TermCriteria::EPS, 30,
                         0.01),
        cv::OPTFLOW_USE_INITIAL_FLOW);
    lk_ms += ms_since(t0);
    n_lk = 0;
    for (uint8_t s : status) n_lk += s;
  }
  fast_ms /= reps;
  brief_ms /= reps;
  match_ms /= reps;
  lk_ms /= reps;
  const double frame_ms = fast_ms + brief_ms + lk_ms;  // steady-state loop
  printf(
      "{\"image\": \"%s\", \"n_features\": %zu, \"n_matches\": %d, "
      "\"n_lk\": %d, \"fast_ms\": %.1f, \"brief_ms\": %.1f, "
      "\"match_ms\": %.1f, \"lk_ms\": %.1f, \"frame_ms\": %.1f, "
      "\"ref_style_fps\": %.3f}\n",
      path, feats.size(), n_match, n_lk, fast_ms, brief_ms, match_ms, lk_ms,
      frame_ms, 1000.0 / frame_ms);
  return 0;
}
