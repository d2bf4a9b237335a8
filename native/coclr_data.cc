// coclr native data plane: LMDB read-only access + fused JPEG
// decode/crop/resize, exported with a C ABI for ctypes.
//
// Role parity (SURVEY.md §2.9): replaces the reference's liblmdb + msgpack-C
// + libjpeg/PIL stack on the hot path (dataset/lmdb_dataset.py:139-160, the
// reference's throughput ceiling). One call decodes a whole clip's JPEG
// frames, crops the sampled rect and resizes to the training resolution with
// bicubic (a=-0.75, OpenCV INTER_CUBIC convention) — no Python/GIL per frame.
//
// LMDB format facts mirror coclr_tpu/data/lmdb_format.py (page header, meta
// at pages 0/1, branch/leaf nodes, F_BIGDATA overflow chains).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <csetjmp>
#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------------------
// LMDB reader
// ---------------------------------------------------------------------------

static const uint32_t kMagic = 0xBEEFC0DE;
static const uint16_t kPBranch = 0x01, kPLeaf = 0x02, kPLeaf2 = 0x20;
static const uint16_t kFBigData = 0x01, kFSubData = 0x02, kFDupData = 0x04;
static const size_t kPageHdr = 16;
static const uint64_t kPInvalid = ~0ULL;

struct CdpEnv {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t size = 0;
  uint64_t psize = 0;
  uint64_t root = kPInvalid;
  uint64_t entries = 0;
};

static uint16_t rd16(const uint8_t* p) { uint16_t v; memcpy(&v, p, 2); return v; }
static uint32_t rd32(const uint8_t* p) { uint32_t v; memcpy(&v, p, 4); return v; }
static uint64_t rd64(const uint8_t* p) { uint64_t v; memcpy(&v, p, 8); return v; }

struct MetaView {
  uint64_t psize, root, entries, txnid;
  bool ok;
};

static MetaView read_meta(const uint8_t* base, uint64_t off) {
  MetaView m{0, 0, 0, 0, false};
  const uint8_t* p = base + off + kPageHdr;
  if (rd32(p) != kMagic || rd32(p + 4) != 1) return m;
  m.psize = rd32(p + 24);  // dbs[0].md_pad carries the page size
  // dbs layout: pad(4) flags(2) depth(2) branch(8) leaf(8) ovf(8) entries(8)
  // root(8) => 48 bytes each; main db at +24+48
  const uint8_t* main_db = p + 24 + 48;
  m.entries = rd64(main_db + 32);
  m.root = rd64(main_db + 40);
  m.txnid = rd64(p + 24 + 96 + 8);  // after dbs[2] and last_pg
  m.ok = true;
  return m;
}

CdpEnv* cdp_open(const char* path) {
  struct stat st;
  std::string p(path);
  if (stat(p.c_str(), &st) != 0) return nullptr;
  if (S_ISDIR(st.st_mode)) {
    p += "/data.mdb";
    if (stat(p.c_str(), &st) != 0) return nullptr;
  }
  int fd = open(p.c_str(), O_RDONLY);
  if (fd < 0) return nullptr;
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) { close(fd); return nullptr; }

  auto* env = new CdpEnv();
  env->fd = fd;
  env->map = static_cast<const uint8_t*>(map);
  env->size = st.st_size;
  MetaView m0 = read_meta(env->map, 0);
  if (!m0.ok) { delete env; return nullptr; }
  MetaView m1 = read_meta(env->map, m0.psize);
  MetaView best = (m1.ok && m1.txnid > m0.txnid) ? m1 : m0;
  env->psize = best.psize;
  env->root = best.root;
  env->entries = best.entries;
  return env;
}

void cdp_close(CdpEnv* env) {
  if (!env) return;
  munmap(const_cast<uint8_t*>(env->map), env->size);
  close(env->fd);
  delete env;
}

uint64_t cdp_entries(CdpEnv* env) { return env ? env->entries : 0; }

// returns 1 on hit, 0 on miss, -1 on an unsupported DUPSORT/LEAF2 layout
// (the reference's datasets are plain put-only databases,
// convert_video_to_lmdb.py:50-57 — misparsing those layouts silently
// would be worse than failing); *out/*out_len point into the mmap
int cdp_get(CdpEnv* env, const uint8_t* key, uint32_t key_len,
            const uint8_t** out, uint64_t* out_len) {
  if (!env || env->root == kPInvalid) return 0;
  uint64_t pgno = env->root;
  for (;;) {
    const uint8_t* page = env->map + pgno * env->psize;
    uint16_t flags = rd16(page + 10);
    int n = (rd16(page + 12) - kPageHdr) >> 1;
    if (flags & kPBranch) {
      int lo = 1, hi = n - 1, pick = 0;
      while (lo <= hi) {
        int mid = (lo + hi) / 2;
        const uint8_t* node = page + rd16(page + kPageHdr + 2 * mid);
        uint16_t ks = rd16(node + 6);
        int c = memcmp(node + 8, key, std::min<uint32_t>(ks, key_len));
        if (c == 0) c = (ks > key_len) - (ks < key_len);
        if (c <= 0) { pick = mid; lo = mid + 1; } else { hi = mid - 1; }
      }
      const uint8_t* node = page + rd16(page + kPageHdr + 2 * pick);
      pgno = (uint64_t)rd16(node) | ((uint64_t)rd16(node + 2) << 16) |
             ((uint64_t)rd16(node + 4) << 32);
    } else if (flags & kPLeaf) {
      if (flags & kPLeaf2) return -1;
      int lo = 0, hi = n - 1;
      while (lo <= hi) {
        int mid = (lo + hi) / 2;
        const uint8_t* node = page + rd16(page + kPageHdr + 2 * mid);
        uint16_t ks = rd16(node + 6);
        int c = memcmp(node + 8, key, std::min<uint32_t>(ks, key_len));
        if (c == 0) c = (ks > key_len) - (ks < key_len);
        if (c == 0) {
          if (rd16(node + 4) & (kFSubData | kFDupData)) return -1;
          uint64_t dsize = (uint64_t)rd16(node) | ((uint64_t)rd16(node + 2) << 16);
          if (rd16(node + 4) & kFBigData) {
            uint64_t ov = rd64(node + 8 + ks);
            *out = env->map + ov * env->psize + kPageHdr;
          } else {
            *out = node + 8 + ks;
          }
          *out_len = dsize;
          return 1;
        }
        if (c < 0) lo = mid + 1; else hi = mid - 1;
      }
      return 0;
    } else {
      return 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Minimal msgpack parser for the reference schema: an array of raw/bin
// strings (the per-video JPEG list, convert_video_to_lmdb.py:41).
// Returns the number of elements; fills ptrs/lens up to max_items.
// ---------------------------------------------------------------------------

int64_t cdp_msgpack_raw_list(const uint8_t* buf, uint64_t len,
                             const uint8_t** ptrs, uint64_t* lens,
                             int64_t max_items) {
  if (len < 1) return -1;
  const uint8_t* p = buf;
  const uint8_t* end = buf + len;
  uint64_t count;
  uint8_t t = *p++;
  if ((t & 0xF0) == 0x90) { count = t & 0x0F; }
  else if (t == 0xDC) { if (p + 2 > end) return -1;
    count = ((uint64_t)p[0] << 8) | p[1]; p += 2; }
  else if (t == 0xDD) { if (p + 4 > end) return -1;
    count = ((uint64_t)p[0] << 24) | ((uint64_t)p[1] << 16) |
            ((uint64_t)p[2] << 8) | p[3]; p += 4; }
  else return -1;

  for (uint64_t i = 0; i < count; ++i) {
    if (p >= end) return -1;
    uint8_t h = *p++;
    uint64_t n;
    if ((h & 0xE0) == 0xA0) { n = h & 0x1F; }                     // fixstr
    else if (h == 0xD9 || h == 0xC4) { n = *p; p += 1; }          // str8/bin8
    else if (h == 0xDA || h == 0xC5) {                            // str16/bin16
      n = ((uint64_t)p[0] << 8) | p[1]; p += 2; }
    else if (h == 0xDB || h == 0xC6) {                            // str32/bin32
      n = ((uint64_t)p[0] << 24) | ((uint64_t)p[1] << 16) |
          ((uint64_t)p[2] << 8) | p[3]; p += 4; }
    else return -1;
    if (p + n > end) return -1;
    if ((int64_t)i < max_items) { ptrs[i] = p; lens[i] = n; }
    p += n;
  }
  return (int64_t)count;
}

// ---------------------------------------------------------------------------
// JPEG decode + crop + bicubic resize
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

int cdp_jpeg_dims(const uint8_t* buf, uint64_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return 0; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 1;
}

// decode full RGB frame into caller buffer sized w*h*3; returns 1 on success
static int decode_rgb(const uint8_t* buf, uint64_t len, uint8_t* out,
                      int* w_out, int* h_out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return 0; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  *w_out = w;
  *h_out = h;
  // hand libjpeg as many row pointers as it will take per call (rec_outbuf
  // height is typically 2-4): fewer API calls than one-scanline-at-a-time
  std::vector<uint8_t*> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + (size_t)y * w * 3;
  while ((int)cinfo.output_scanline < h) {
    int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, rows.data() + y, h - y);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 1;
}

// OpenCV INTER_CUBIC kernel (a = -0.75)
static inline float cubic_w(float x) {
  const float a = -0.75f;
  x = std::fabs(x);
  if (x < 1.f) return ((a + 2.f) * x - (a + 3.f)) * x * x + 1.f;
  if (x < 2.f) return (((x - 5.f) * x + 8.f) * x - 4.f) * a;
  return 0.f;
}

// crop rect (x,y,w,h) of src [sh, sw, 3], bicubic-resize to [out, out, 3]
//
// Layout chosen for auto-vectorization (the scalar form ran ~10x behind
// OpenCV's SIMD resize and dominated per-frame cost):
//  - horizontal pass: clamp-free interior fast path (taps read 12
//    contiguous bytes), clamped loop only at the <=3 border columns;
//  - vertical pass: a 4-row SAXPY over the contiguous out*3 floats of the
//    intermediate -- one fused vectorizable loop per output row.
static void crop_resize_cubic(const uint8_t* src, int sw, int sh,
                              int cx, int cy, int cw, int ch,
                              int out, uint8_t* dst) {
  // separable: horizontal into tmp [ch, out, 3] float, then vertical
  std::vector<float> tmp((size_t)ch * out * 3);
  float sx = (float)cw / out, sy = (float)ch / out;
  std::vector<int> xi0(out);
  std::vector<float> xw(out * 4);
  int interior_lo = out, interior_hi = -1;  // range where no x-clamp needed
  for (int ox = 0; ox < out; ++ox) {
    float fx = (ox + 0.5f) * sx - 0.5f;
    int ix = (int)std::floor(fx);
    float frac = fx - ix;
    xi0[ox] = ix - 1;
    for (int k = 0; k < 4; ++k) xw[ox * 4 + k] = cubic_w(frac + 1 - k);
    if (xi0[ox] >= 0 && xi0[ox] + 3 < cw) {
      if (ox < interior_lo) interior_lo = ox;
      if (ox > interior_hi) interior_hi = ox;
    }
  }
  for (int y = 0; y < ch; ++y) {
    const uint8_t* row = src + ((size_t)(cy + y) * sw + cx) * 3;
    float* trow = &tmp[(size_t)y * out * 3];
    auto border = [&](int ox) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < 4; ++k) {
        int x = std::min(std::max(xi0[ox] + k, 0), cw - 1);
        float w = xw[ox * 4 + k];
        acc[0] += w * row[x * 3 + 0];
        acc[1] += w * row[x * 3 + 1];
        acc[2] += w * row[x * 3 + 2];
      }
      trow[ox * 3 + 0] = acc[0];
      trow[ox * 3 + 1] = acc[1];
      trow[ox * 3 + 2] = acc[2];
    };
    for (int ox = 0; ox < interior_lo; ++ox) border(ox);
    for (int ox = interior_lo; ox <= interior_hi; ++ox) {
      const uint8_t* p = row + (size_t)xi0[ox] * 3;  // 12 contiguous bytes
      const float* w = &xw[ox * 4];
      trow[ox * 3 + 0] = w[0] * p[0] + w[1] * p[3] + w[2] * p[6] + w[3] * p[9];
      trow[ox * 3 + 1] = w[0] * p[1] + w[1] * p[4] + w[2] * p[7] + w[3] * p[10];
      trow[ox * 3 + 2] = w[0] * p[2] + w[1] * p[5] + w[2] * p[8] + w[3] * p[11];
    }
    for (int ox = std::max(interior_hi + 1, interior_lo); ox < out; ++ox)
      border(ox);
  }
  const int row_f = out * 3;
  for (int oy = 0; oy < out; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int iy = (int)std::floor(fy);
    float frac = fy - iy;
    float wy[4];
    const float* rows[4];
    for (int k = 0; k < 4; ++k) {
      wy[k] = cubic_w(frac + 1 - k);
      int y = std::min(std::max(iy - 1 + k, 0), ch - 1);
      rows[k] = &tmp[(size_t)y * row_f];
    }
    uint8_t* drow = dst + (size_t)oy * row_f;
    const float *r0 = rows[0], *r1 = rows[1], *r2 = rows[2], *r3 = rows[3];
    float w0 = wy[0], w1 = wy[1], w2 = wy[2], w3 = wy[3];
    for (int j = 0; j < row_f; ++j) {  // contiguous: auto-vectorizes
      float acc = w0 * r0[j] + w1 * r1[j] + w2 * r2[j] + w3 * r3[j];
      int v = (int)std::lround(acc);
      drow[j] = (uint8_t)std::min(std::max(v, 0), 255);
    }
  }
}

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { run(); });
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> f) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      q_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  void run() {
    for (;;) {
      std::function<void()> f;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        f = std::move(q_.front());
        q_.pop();
      }
      f();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

static Pool* g_pool = nullptr;
static int g_pool_size = 0;
static std::mutex g_pool_mu;

// After fork(), the pool's threads do not exist in the child; abandon the
// inherited object (joining would hang) so the next decode rebuilds a live
// pool. Called by worker-process init in coclr_tpu/data/loader.py.
int cdp_fork_reset() {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  g_pool = nullptr;  // deliberate leak of the dead-threaded inherited pool
  g_pool_size = 0;
  return 0;
}

static Pool* pool(int n) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (!g_pool || g_pool_size != n) {
    delete g_pool;
    g_pool = new Pool(n);
    g_pool_size = n;
  }
  return g_pool;
}

// Decode `n` JPEGs, crop (x,y,w,h) from each, resize to out*out, write into
// dst[n, out, out, 3]. Frames may have any size >= crop rect; rect is clamped
// per frame. Parallel across frames. Returns number of failures.
int cdp_decode_crop_clip(const uint8_t** jpegs, const uint64_t* lens, int n,
                         int cx, int cy, int cw, int ch, int out,
                         uint8_t* dst, int threads) {
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  Pool* p = pool(threads > 0 ? threads : 8);

  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      int w = 0, h = 0;
      if (!cdp_jpeg_dims(jpegs[i], lens[i], &w, &h)) {
        failures++;
      } else {
        std::vector<uint8_t> frame((size_t)w * h * 3);
        if (!decode_rgb(jpegs[i], lens[i], frame.data(), &w, &h)) {
          failures++;
        } else {
          int x = std::min(cx, std::max(0, w - cw));
          int y = std::min(cy, std::max(0, h - ch));
          int ww = std::min(cw, w);
          int hh = std::min(ch, h);
          crop_resize_cubic(frame.data(), w, h, std::max(0, x),
                            std::max(0, y), ww, hh, out,
                            dst + (size_t)i * out * out * 3);
        }
      }
      if (++done == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

// Full-frame decode (no crop) into dst[n, H, W, 3]; frames must all be (W,H).
int cdp_decode_frames(const uint8_t** jpegs, const uint64_t* lens, int n,
                      int W, int H, uint8_t* dst, int threads) {
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  Pool* p = pool(threads > 0 ? threads : 8);
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      int w = 0, h = 0;
      std::vector<uint8_t> frame((size_t)W * H * 3 * 4);  // headroom
      if (!decode_rgb(jpegs[i], lens[i], frame.data(), &w, &h) ||
          w != W || h != H) {
        failures++;
      } else {
        memcpy(dst + (size_t)i * W * H * 3, frame.data(), (size_t)W * H * 3);
      }
      if (++done == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

}  // extern "C"
