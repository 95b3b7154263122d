// wavecap_tpu native ingest shim.
//
// Host-side C++ equivalent of the reference's SDRplay shared-memory ring
// transport (reference devices/sdrplay_proxy.py:58-210: header-word ring
// with write_idx / sample_count / overflow_count) plus the SoapySDR reader
// role (reference devices/soapy.py).  The writer side runs on a dedicated
// thread at device pace; the Python side drains blocks through a small C
// API via ctypes — no Python in the per-sample path.
//
// Sources:
//   * synthetic oscillator bank (hardware-free operation / tests)
//   * SoapySDR via dlopen when libSoapySDR is present (optional, no
//     build-time dependency)
//
// Build: g++ -O2 -shared -fPIC -o libwavecap_ingest.so ingest.cpp -lpthread -ldl

#include <atomic>
#include <chrono>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <dlfcn.h>
#include <thread>
#include <vector>

namespace {

struct Station {
  double offset_hz;
  double tone_hz;
  double deviation_hz;
  double amplitude;
  int kind; // 0=tone 1=nbfm 2=am
};

// Single-producer single-consumer ring of complex64 samples.
struct Ring {
  std::vector<std::complex<float>> buf;
  std::atomic<uint64_t> write_idx{0};
  std::atomic<uint64_t> read_idx{0};
  std::atomic<uint64_t> overflow_count{0};
  uint64_t overflow_seen = 0; // reader-side: last count reported
  std::atomic<bool> running{false};

  double sample_rate = 0.0;
  uint64_t t = 0; // absolute sample index for phase-continuous synthesis
  std::vector<Station> stations;
  double noise = 0.0;
  uint32_t rng_state = 0x12345678;
  bool realtime = true;
  std::thread writer;

  explicit Ring(size_t capacity) : buf(capacity) {}

  size_t capacity() const { return buf.size(); }

  size_t available() const {
    return static_cast<size_t>(write_idx.load(std::memory_order_acquire) -
                               read_idx.load(std::memory_order_acquire));
  }

  float frand() { // xorshift noise, +/-1
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 17;
    rng_state ^= rng_state << 5;
    return (static_cast<int32_t>(rng_state) / 2147483648.0f);
  }

  void push(const std::complex<float> *data, size_t n) {
    while (n > 0) {
      uint64_t w = write_idx.load(std::memory_order_relaxed);
      uint64_t r = read_idx.load(std::memory_order_acquire);
      size_t k = n;
      if (!realtime) {
        // Non-realtime (replay/bench) mode paces to the consumer: write
        // whatever fits, then wait for space — incremental writes mean a
        // chunk of ANY size (even one larger than the ring) drains
        // without deadlock against a reader holding residual samples.
        size_t space = capacity() - static_cast<size_t>(w - r);
        if (space == 0) {
          if (!running.load(std::memory_order_relaxed))
            return;
          std::this_thread::sleep_for(std::chrono::microseconds(200));
          continue;
        }
        k = std::min(n, space);
      } else {
        k = std::min(n, capacity());
        if (w + k - r > capacity()) {
          // Reader too slow: overwrite the oldest samples and signal via
          // the cumulative count only.  read_idx stays reader-owned (the
          // reference ring does the same, devices/sdrplay_proxy.py:58-210)
          // — a writer-side reset raced the reader's load/store RMW and
          // could leave read_idx pointing at torn samples; instead the
          // reader clamps itself forward when it observes the gap
          // (wavecap_ring_read).
          overflow_count.fetch_add(1, std::memory_order_relaxed);
        }
      }
      for (size_t i = 0; i < k; ++i) {
        buf[(w + i) % capacity()] = data[i];
      }
      write_idx.store(w + k, std::memory_order_release);
      data += k;
      n -= k;
    }
  }

  void synth_chunk(std::vector<std::complex<float>> &out, size_t n) {
    out.resize(n);
    const double fs = sample_rate;
    for (size_t i = 0; i < n; ++i) {
      double ti = static_cast<double>(t + i) / fs;
      std::complex<double> acc(0.0, 0.0);
      for (const auto &s : stations) {
        double ph;
        switch (s.kind) {
        case 1: // nbfm: integral of sine tone -> -cos
          ph = 2.0 * M_PI *
               (s.offset_hz * ti -
                s.deviation_hz * std::cos(2.0 * M_PI * s.tone_hz * ti) /
                    (2.0 * M_PI * s.tone_hz));
          acc += s.amplitude * std::complex<double>(std::cos(ph), std::sin(ph));
          break;
        case 2: { // am
          double mod = 1.0 + 0.6 * std::sin(2.0 * M_PI * s.tone_hz * ti);
          ph = 2.0 * M_PI * s.offset_hz * ti;
          acc += s.amplitude * mod *
                 std::complex<double>(std::cos(ph), std::sin(ph));
          break;
        }
        default: // tone
          ph = 2.0 * M_PI * s.offset_hz * ti;
          acc += s.amplitude * std::complex<double>(std::cos(ph), std::sin(ph));
        }
      }
      out[i] = std::complex<float>(static_cast<float>(acc.real()) + noise * frand(),
                                   static_cast<float>(acc.imag()) + noise * frand());
    }
    t += n;
  }

  void run_synthetic() {
    std::vector<std::complex<float>> chunk;
    const size_t n = static_cast<size_t>(sample_rate / 100); // 10 ms
    auto next = std::chrono::steady_clock::now();
    while (running.load(std::memory_order_relaxed)) {
      synth_chunk(chunk, n);
      push(chunk.data(), n);
      if (realtime) {
        next += std::chrono::microseconds(10000);
        std::this_thread::sleep_until(next);
      }
    }
  }
};

} // namespace

extern "C" {

void *wavecap_ring_create(double sample_rate, size_t capacity, int realtime) {
  auto *r = new Ring(capacity);
  r->sample_rate = sample_rate;
  r->realtime = realtime != 0;
  return r;
}

void wavecap_ring_add_station(void *h, double offset_hz, double tone_hz,
                              double deviation_hz, double amplitude, int kind) {
  static_cast<Ring *>(h)->stations.push_back(
      {offset_hz, tone_hz, deviation_hz, amplitude, kind});
}

void wavecap_ring_set_noise(void *h, double noise) {
  static_cast<Ring *>(h)->noise = noise;
}

void wavecap_ring_start(void *h) {
  auto *r = static_cast<Ring *>(h);
  if (r->running.exchange(true))
    return;
  r->writer = std::thread([r] { r->run_synthetic(); });
}

// Blocking read of exactly n samples into out (interleaved float32 I/Q).
// Returns 1 if an overflow occurred since the previous read, 0 otherwise,
// -1 if the ring is stopped.
int wavecap_ring_read(void *h, float *out, size_t n, double timeout_s) {
  auto *r = static_cast<Ring *>(h);
  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::duration<double>(timeout_s);
  for (;;) {
    // Overflow recovery is reader-side: if the writer has lapped us the
    // slots under [rd, w-capacity) hold overwritten data — clamp forward
    // to the current write head and wait for fresh samples (downstream
    // resets carried DSP state on the overflow flag anyway).
    uint64_t w = r->write_idx.load(std::memory_order_acquire);
    uint64_t rd = r->read_idx.load(std::memory_order_relaxed);
    if (w - rd > r->capacity())
      r->read_idx.store(w, std::memory_order_release);
    else if (w - rd >= n)
      break;
    if (!r->running.load(std::memory_order_relaxed))
      return -1;
    if (std::chrono::steady_clock::now() > deadline)
      return -1;
    std::this_thread::sleep_for(std::chrono::microseconds(200));
  }
  uint64_t rd = r->read_idx.load(std::memory_order_relaxed);
  for (size_t i = 0; i < n; ++i) {
    const auto &c = r->buf[(rd + i) % r->capacity()];
    out[2 * i] = c.real();
    out[2 * i + 1] = c.imag();
  }
  r->read_idx.store(rd + n, std::memory_order_release);
  // A concurrent lap during the copy above means some copied samples were
  // torn — detect and report it as overflow; the next read clamps forward.
  uint64_t w_after = r->write_idx.load(std::memory_order_acquire);
  if (w_after - rd > r->capacity())
    r->overflow_count.fetch_add(1, std::memory_order_relaxed);
  uint64_t ov = r->overflow_count.load(std::memory_order_relaxed);
  int flag = ov != r->overflow_seen ? 1 : 0;
  r->overflow_seen = ov;
  return flag;
}

uint64_t wavecap_ring_overflows(void *h) {
  return static_cast<Ring *>(h)->overflow_count.load();
}

size_t wavecap_ring_available(void *h) {
  return static_cast<Ring *>(h)->available();
}

void wavecap_ring_stop(void *h) {
  auto *r = static_cast<Ring *>(h);
  if (r->running.exchange(false) && r->writer.joinable())
    r->writer.join();
}

void wavecap_ring_destroy(void *h) {
  auto *r = static_cast<Ring *>(h);
  wavecap_ring_stop(h);
  delete r;
}

// SoapySDR availability probe (dlopen, optional dependency).
int wavecap_soapy_available() {
  void *lib = dlopen("libSoapySDR.so", RTLD_LAZY);
  if (!lib)
    lib = dlopen("libSoapySDR.so.0.8", RTLD_LAZY);
  if (lib) {
    dlclose(lib);
    return 1;
  }
  return 0;
}

} // extern "C"
