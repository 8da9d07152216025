// vca_ingest — native multi-stream frame ingest / batching feeder.
//
// The reference's ingest is GStreamer: one streaming thread per filter maps
// each GstBuffer and processes it in place (kmsfacedetect.cpp:282-306). The
// TPU-native equivalent must instead keep a device fed with *batches* of
// frames from many streams (SURVEY.md §7 "host↔device streaming"). This
// library is that feeder's native core:
//
//   * producers (one per stream, any thread) push BGR/BGRA/I420 frames;
//     colorspace→gray happens at push time in native code (bit-exact Q15
//     BGR→gray, matching ops/color.py);
//   * a consumer drains ready frames into one contiguous [B,H,W] uint8
//     slab (plus pts + stream ids) sized for direct device transfer.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: make -C nubomedia_vca_tpu/cpp/ingest

// Live sources: vca_ingest_listen() opens a TCP port accepting raw-video
// byte streams (one connection per stream) — the wire format produced by
//   gst-launch-1.0 v4l2src ! videoconvert !
//     video/x-raw,format=GRAY8,width=W,height=H ! tcpclientsink ...
// or  ffmpeg -i src -f rawvideo -pix_fmt gray tcp://host:port
// replacing the reference's in-process GStreamer element attachment
// (run_plugin.sh pipelines) with a wire boundary any media stack can feed.

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

namespace {

struct Slot {
  std::vector<uint8_t> gray;
  int64_t pts;
  int32_t stream;
};

struct Ingest {
  int width, height, capacity;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Slot> ready;
  std::vector<Slot> pool;
  int64_t dropped = 0;
  // live TCP listener state
  int listen_fd = -1;
  int listen_channels = 1;
  std::atomic<bool> stop{false};
  std::atomic<int32_t> next_stream{0};
  std::thread accept_thread;
  std::mutex conn_mu;
  std::vector<std::thread> conn_threads;
};

inline uint8_t bgr2gray(uint8_t b, uint8_t g, uint8_t r) {
  // bit-exact OpenCV Q15: (9798 R + 19235 G + 3735 B + 2^14) >> 15
  return static_cast<uint8_t>(
      (9798 * r + 19235 * g + 3735 * b + (1 << 14)) >> 15);
}

}  // namespace

extern "C" {

void* vca_ingest_create(int width, int height, int capacity) {
  auto* h = new Ingest;
  h->width = width;
  h->height = height;
  h->capacity = capacity;
  return h;
}

void vca_ingest_stop_listen(void* p) {
  auto* h = static_cast<Ingest*>(p);
  h->stop = true;
  if (h->listen_fd >= 0) {
    ::shutdown(h->listen_fd, SHUT_RDWR);
    ::close(h->listen_fd);
    h->listen_fd = -1;
  }
  if (h->accept_thread.joinable()) h->accept_thread.join();
  std::vector<std::thread> conns;
  {
    std::lock_guard<std::mutex> lk(h->conn_mu);
    conns.swap(h->conn_threads);
  }
  for (auto& t : conns)
    if (t.joinable()) t.join();
}

void vca_ingest_destroy(void* p) {
  vca_ingest_stop_listen(p);
  delete static_cast<Ingest*>(p);
}

int64_t vca_ingest_dropped(void* p) {
  auto* h = static_cast<Ingest*>(p);
  std::lock_guard<std::mutex> lk(h->mu);
  return h->dropped;
}

// channels: 1 = already gray / I420 luma plane, 3 = BGR, 4 = BGRA
int vca_ingest_push(void* p, int stream, const uint8_t* data, int stride,
                    int channels, int64_t pts) {
  auto* h = static_cast<Ingest*>(p);
  Slot s;
  s.gray.resize(static_cast<size_t>(h->width) * h->height);
  s.pts = pts;
  s.stream = stream;
  const int w = h->width, ht = h->height;
  for (int y = 0; y < ht; y++) {
    const uint8_t* row = data + static_cast<size_t>(y) * stride;
    uint8_t* out = s.gray.data() + static_cast<size_t>(y) * w;
    if (channels == 1) {
      std::memcpy(out, row, w);
    } else if (channels == 3) {
      for (int x = 0; x < w; x++)
        out[x] = bgr2gray(row[3 * x], row[3 * x + 1], row[3 * x + 2]);
    } else if (channels == 4) {
      for (int x = 0; x < w; x++)
        out[x] = bgr2gray(row[4 * x], row[4 * x + 1], row[4 * x + 2]);
    } else {
      return -1;
    }
  }
  {
    std::lock_guard<std::mutex> lk(h->mu);
    if (static_cast<int>(h->ready.size()) >= h->capacity) {
      h->ready.pop_front();  // drop-oldest backpressure policy
      h->dropped++;
    }
    h->ready.push_back(std::move(s));
  }
  h->cv.notify_one();
  return 0;
}

// Drain up to max_frames into out[B,H,W]; returns the number collected.
// wait_ms < 0: block until at least min_frames are available.
int vca_ingest_collect(void* p, uint8_t* out, int64_t* pts_out,
                       int32_t* stream_out, int max_frames, int min_frames,
                       int wait_ms) {
  auto* h = static_cast<Ingest*>(p);
  std::unique_lock<std::mutex> lk(h->mu);
  auto have = [&] {
    return static_cast<int>(h->ready.size()) >= min_frames;
  };
  if (wait_ms < 0) {
    h->cv.wait(lk, have);
  } else if (wait_ms > 0 && !have()) {
    h->cv.wait_for(lk, std::chrono::milliseconds(wait_ms), have);
  }
  const size_t frame_sz = static_cast<size_t>(h->width) * h->height;
  int n = 0;
  while (n < max_frames && !h->ready.empty()) {
    Slot& s = h->ready.front();
    std::memcpy(out + n * frame_sz, s.gray.data(), frame_sz);
    pts_out[n] = s.pts;
    stream_out[n] = s.stream;
    h->ready.pop_front();
    n++;
  }
  return n;
}

int vca_ingest_pending(void* p) {
  auto* h = static_cast<Ingest*>(p);
  std::lock_guard<std::mutex> lk(h->mu);
  return static_cast<int>(h->ready.size());
}

// Accept raw-video TCP connections on `port` (0 = ephemeral); each
// connection becomes one stream whose fixed-size frames (W*H*channels
// bytes, tightly packed) are pushed with pts = per-stream frame index.
// Returns the bound port, or -1 on error.
int vca_ingest_listen(void* p, int port, int channels) {
  auto* h = static_cast<Ingest*>(p);
  if (h->listen_fd >= 0) return -1;  // already listening
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  int one = 1;
  ::setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (::bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0 ||
      ::listen(fd, 16) < 0) {
    ::close(fd);
    return -1;
  }
  socklen_t alen = sizeof(addr);
  ::getsockname(fd, reinterpret_cast<sockaddr*>(&addr), &alen);
  h->listen_fd = fd;
  h->listen_channels = channels;
  h->stop = false;

  h->accept_thread = std::thread([h] {
    while (!h->stop) {
      int cfd = ::accept(h->listen_fd, nullptr, nullptr);
      if (cfd < 0) break;
      int32_t stream = h->next_stream++;
      std::lock_guard<std::mutex> lk(h->conn_mu);
      h->conn_threads.emplace_back([h, cfd, stream] {
        const size_t frame_bytes = static_cast<size_t>(h->width) * h->height *
                                   h->listen_channels;
        std::vector<uint8_t> buf(frame_bytes);
        int64_t pts = 0;
        while (!h->stop) {
          size_t got = 0;
          while (got < frame_bytes) {
            ssize_t n = ::recv(cfd, buf.data() + got, frame_bytes - got, 0);
            if (n <= 0) goto done;
            got += static_cast<size_t>(n);
          }
          vca_ingest_push(h, stream, buf.data(),
                          h->width * h->listen_channels, h->listen_channels,
                          pts++);
        }
      done:
        ::close(cfd);
      });
    }
  });
  return ntohs(addr.sin_port);
}

}  // extern "C"
