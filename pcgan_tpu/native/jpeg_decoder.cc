// Native host-runtime JPEG batch decoder (pcgan_tpu).
//
// Replaces the reference's decode path (PIL inside torch DataLoader worker
// *processes*, SURVEY.md SS4.1) with an in-process C++ thread pool writing
// straight into one caller-owned batch buffer: no Python-object per image,
// no GIL (the ctypes call releases it), no per-worker IPC/pickling, and the
// decoded batch is already contiguous for the host->device transfer.
//
// Semantics: full-scale libjpeg decode to RGB8 — bit-identical to
// PIL.Image.open().convert("RGB") for baseline/progressive JPEGs (Pillow
// wraps the same libjpeg-turbo ISLOW IDCT). Anything the fast path cannot
// serve bit-exactly (CMYK, size mismatch vs the expected canvas, corrupt
// stream, non-JPEG) is reported per-image via `status` and the Python
// caller falls back to PIL for that image only.
//
// Build: g++ -O2 -shared -fPIC jpeg_decoder.cc -ljpeg -lpthread
// (done lazily by pcgan_tpu/native/__init__.py).

#include <cstddef>  // jpeglib.h uses size_t/FILE but includes neither —
#include <cstdio>   // they must come first
#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

// libjpeg's default error_exit calls exit(); route it to longjmp instead.
struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jump, 1);
}

void silent_output(j_common_ptr) {}  // no stderr spam from recoverable warns

enum Status {
  PCGAN_OK = 0,
  PCGAN_E_OPEN = 1,    // file missing/unreadable
  PCGAN_E_DECODE = 2,  // corrupt / not a JPEG
  PCGAN_E_DIMS = 3,    // decoded dims != expected canvas (caller resizes)
  PCGAN_E_COLOR = 4,   // CMYK/YCCK source (caller converts)
};

int decode_one(const char* path, uint8_t* out, int oh, int ow,
               int scale_num) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return PCGAN_E_OPEN;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  jerr.pub.output_message = silent_output;
  if (setjmp(jerr.jump)) {  // any libjpeg fatal error lands here
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return PCGAN_E_DECODE;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    // libjpeg cannot color-convert CMYK->RGB; PIL fallback handles it
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return PCGAN_E_COLOR;
  }
  cinfo.out_color_space = JCS_RGB;  // gray->RGB expansion is supported
  if (scale_num > 0 && scale_num != 8) {
    // DCT-domain downscale (libjpeg-turbo: M/8, M=1..16): IDCT cost scales
    // with the OUTPUT size — the host fast path for core-starved machines
    cinfo.scale_num = static_cast<unsigned>(scale_num);
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) != ow ||
      static_cast<int>(cinfo.output_height) != oh ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return PCGAN_E_DIMS;
  }
  const size_t stride = static_cast<size_t>(ow) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rows[1] = {out + stride * cinfo.output_scanline};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return PCGAN_OK;
}

}  // namespace

extern "C" {

// Decode one JPEG file into `out` (h*w*3 RGB8) at scale_num/8 (8 = full;
// pass 0 for full as well). Returns a Status code.
int pcgan_decode_file(const char* path, uint8_t* out, int h, int w,
                      int scale_num) {
  return decode_one(path, out, h, w, scale_num);
}

// Decode `n` files into `out` (n*h*w*3, image i at offset i*h*w*3) using
// `nthreads` worker threads (work-stealing via an atomic cursor — images
// vary in cost, so static partitioning would straggle). Per-image Status
// lands in `status[i]`; the slot for a failed image is untouched. Returns
// the number of failures (0 == whole batch served natively).
int pcgan_decode_batch(const char** paths, int n, uint8_t* out, int h, int w,
                       int nthreads, int* status, int scale_num) {
  const size_t img = static_cast<size_t>(h) * w * 3;
  std::atomic<int> next(0), failures(0);
  int t = nthreads < 1 ? 1 : nthreads;
  if (t > n) t = n;
  std::vector<std::thread> workers;
  workers.reserve(t);
  for (int k = 0; k < t; ++k) {
    workers.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
        const int s = decode_one(paths[i], out + img * i, h, w, scale_num);
        status[i] = s;
        if (s != PCGAN_OK) failures.fetch_add(1, std::memory_order_relaxed);
      }
    });
  }
  for (auto& w_ : workers) w_.join();
  return failures.load();
}

// Linked libjpeg ABI version (62/70/80), for diagnostics.
int pcgan_jpeg_abi(void) { return JPEG_LIB_VERSION; }

}  // extern "C"
