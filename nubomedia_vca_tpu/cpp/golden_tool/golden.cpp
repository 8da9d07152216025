// vca_golden — OpenCV 4.6 golden-reference dumper for parity tests.
//
// The Python test-suite uses this tool as the ground truth for the exact
// numeric semantics the TPU engine must reproduce:
//   * cv::CascadeClassifier::detectMultiScale  (the reference repo's hot loop:
//     kmsfacedetect.cpp:809-811 and friends call exactly this)
//   * cv::groupRectangles                      (minNeighbors grouping)
//   * cv::motempl::{updateMotionHistory, calcMotionGradient, segmentMotion}
//     (the reference tracker pipeline, gstnubotracker.cpp:356-377)
//   * cv::resize / cv::equalizeHist / cv::integral primitives
//
// I/O is deliberately codec-free: images cross the boundary as raw blobs
//   header:  int32 h, int32 w, int32 c, int32 dtype(0=u8,1=f32)   (little endian)
//   payload: h*w*c elements
// read from files; results are printed as JSON on stdout.
//
// Build: make -C nubomedia_vca_tpu/cpp/golden_tool  (links system OpenCV 4.6)

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/objdetect.hpp>
#include <opencv2/optflow/motempl.hpp>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

static cv::Mat read_blob(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(2); }
  int32_t h, w, c, dt;
  f.read(reinterpret_cast<char*>(&h), 4);
  f.read(reinterpret_cast<char*>(&w), 4);
  f.read(reinterpret_cast<char*>(&c), 4);
  f.read(reinterpret_cast<char*>(&dt), 4);
  int type = dt == 0 ? CV_8UC(c) : CV_32FC(c);
  cv::Mat m(h, w, type);
  f.read(reinterpret_cast<char*>(m.data), m.total() * m.elemSize());
  return m;
}

static void write_blob(const std::string& path, const cv::Mat& m) {
  std::ofstream f(path, std::ios::binary);
  int32_t h = m.rows, w = m.cols, c = m.channels();
  int32_t dt;
  switch (m.depth()) {
    case CV_8U: dt = 0; break;
    case CV_32F: dt = 1; break;
    case CV_32S: dt = 2; break;
    case CV_64F: dt = 3; break;
    default: fprintf(stderr, "bad depth\n"); exit(2);
  }
  f.write(reinterpret_cast<char*>(&h), 4);
  f.write(reinterpret_cast<char*>(&w), 4);
  f.write(reinterpret_cast<char*>(&c), 4);
  f.write(reinterpret_cast<char*>(&dt), 4);
  f.write(reinterpret_cast<const char*>(m.data), m.total() * m.elemSize());
}

static void print_rects(const std::vector<cv::Rect>& rs) {
  printf("[");
  for (size_t i = 0; i < rs.size(); i++) {
    printf("%s[%d,%d,%d,%d]", i ? "," : "", rs[i].x, rs[i].y, rs[i].width,
           rs[i].height);
  }
  printf("]\n");
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: vca_golden <cmd> ...\n"); return 1; }
  std::string cmd = argv[1];

  if (cmd == "detect") {
    // detect <cascade.xml> <gray.blob> <scaleFactor> <minNeighbors>
    //        [minW minH maxW maxH]
    cv::CascadeClassifier cc(argv[2]);
    if (cc.empty()) { fprintf(stderr, "bad cascade\n"); return 2; }
    cv::Mat img = read_blob(argv[3]);
    double sf = atof(argv[4]);
    int mn = atoi(argv[5]);
    cv::Size minsz, maxsz;
    if (argc >= 10) {
      minsz = cv::Size(atoi(argv[6]), atoi(argv[7]));
      maxsz = cv::Size(atoi(argv[8]), atoi(argv[9]));
    }
    std::vector<cv::Rect> out;
    cc.detectMultiScale(img, out, sf, mn, 0, minsz, maxsz);
    print_rects(out);
    return 0;
  }

  if (cmd == "detect_levels") {
    // Like detect but dumps reject levels + level weights (window evidence).
    cv::CascadeClassifier cc(argv[2]);
    cv::Mat img = read_blob(argv[3]);
    double sf = atof(argv[4]);
    int mn = atoi(argv[5]);
    std::vector<cv::Rect> out;
    std::vector<int> levels;
    std::vector<double> weights;
    cc.detectMultiScale(img, out, levels, weights, sf, mn, 0, cv::Size(),
                        cv::Size(), true);
    printf("[");
    for (size_t i = 0; i < out.size(); i++) {
      printf("%s[%d,%d,%d,%d,%d,%.17g]", i ? "," : "", out[i].x, out[i].y,
             out[i].width, out[i].height, levels[i], weights[i]);
    }
    printf("]\n");
    return 0;
  }

  if (cmd == "group") {
    // group <rects.txt: lines "x y w h"> <groupThreshold> <eps>
    std::ifstream f(argv[2]);
    std::vector<cv::Rect> rs;
    int x, y, w, h;
    while (f >> x >> y >> w >> h) rs.emplace_back(x, y, w, h);
    std::vector<int> weights;
    cv::groupRectangles(rs, weights, atoi(argv[3]), atof(argv[4]));
    print_rects(rs);
    return 0;
  }

  if (cmd == "resize") {
    // resize <in.blob> <out.blob> <W> <H> <interp>   (interp: cv2 enum value)
    cv::Mat img = read_blob(argv[2]);
    cv::Mat out;
    cv::resize(img, out, cv::Size(atoi(argv[4]), atoi(argv[5])), 0, 0,
               atoi(argv[6]));
    write_blob(argv[3], out);
    return 0;
  }

  if (cmd == "equalize") {
    cv::Mat img = read_blob(argv[2]);
    cv::Mat out;
    cv::equalizeHist(img, out);
    write_blob(argv[3], out);
    return 0;
  }

  if (cmd == "integral") {
    // integral <in.blob> <sum.blob> <sqsum.blob> <tilted.blob>
    cv::Mat img = read_blob(argv[2]), s, sq, t;
    cv::integral(img, s, sq, t);
    cv::Mat sqf; sq.convertTo(sqf, CV_64F);
    write_blob(argv[3], s);       // CV_32S
    write_blob(argv[4], sqf);     // CV_64F
    write_blob(argv[5], t);       // CV_32S
    return 0;
  }

  if (cmd == "motempl") {
    // motempl <nframes> <frame0.blob> ... <mhi_out.blob> <mask_out.blob>
    //         <orient_out.blob> <diff_thresh> <mhi_duration>
    //         <delta1> <delta2> <aperture> <seg_thresh>
    // Replays the reference tracker pipeline (gstnubotracker.cpp:356-377) on a
    // frame sequence with timestamps 0,1/30,2/30,... and prints segmentMotion
    // bounding rects of the FINAL frame plus writes final MHI.
    int n = atoi(argv[2]);
    double diff_thresh = atof(argv[3 + n + 3]);
    double mhi_dur = atof(argv[4 + n + 3]);
    double d1 = atof(argv[5 + n + 3]), d2 = atof(argv[6 + n + 3]);
    int aperture = atoi(argv[7 + n + 3]);
    double seg_thresh = atof(argv[8 + n + 3]);
    cv::Mat prev, mhi, mask, orient, segmask;
    std::vector<cv::Rect> rects;
    for (int i = 0; i < n; i++) {
      cv::Mat g = read_blob(argv[3 + i]);
      double ts = static_cast<double>(i) / 30.0;
      if (prev.empty()) {
        mhi = cv::Mat::zeros(g.size(), CV_32F);
        prev = g.clone();
        continue;
      }
      cv::Mat silh;
      cv::absdiff(g, prev, silh);
      cv::threshold(silh, silh, diff_thresh, 255, cv::THRESH_BINARY);
      cv::motempl::updateMotionHistory(silh, mhi, ts, mhi_dur);
      cv::motempl::calcMotionGradient(mhi, mask, orient, d1, d2, aperture);
      rects.clear();
      cv::motempl::segmentMotion(mhi, segmask, rects, ts, seg_thresh);
      prev = g.clone();
    }
    write_blob(argv[3 + n], mhi);
    write_blob(argv[3 + n + 1], mask);
    write_blob(argv[3 + n + 2], orient);
    print_rects(rects);
    return 0;
  }

  fprintf(stderr, "unknown cmd %s\n", cmd.c_str());
  return 1;
}
