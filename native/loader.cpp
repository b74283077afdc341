// ccvs_tpu native data loader: threaded JPEG decode + bilinear resize and
// MJPEG-AVI demuxing.
//
// TPU-native counterpart of the reference's native input path (torch
// DataLoader C++ workers + torchvision video decode): the training job's
// host-side bottleneck is image decode, so it runs here in C++ threads
// (no Python GIL) and lands directly in a caller-provided uint8 buffer.
//
// Exposed C ABI (used via ctypes from ccvs_tpu/data/native.py):
//   ccvs_decode_jpeg_file(path, tgt_h, tgt_w, out)      -> 0 on success
//   ccvs_decode_jpeg_batch(paths, n, tgt_h, tgt_w, out, n_threads)
//   ccvs_avi_frame_count(path)
//   ccvs_avi_decode_frames(path, idxs, n, tgt_h, tgt_w, out, n_threads)
//
// Build: make -C native   (links against system libjpeg)

#include <cstdio>  // jpeglib.h needs FILE declared first

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // RGB, row-major
  int w = 0, h = 0;
};

bool decode_jpeg_mem(const uint8_t* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = [](j_common_ptr c) { longjmp(*(jmp_buf*)c->client_data, 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  if (setjmp(env)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize((size_t)out->w * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t got = fread(out->data(), 1, n, f);
  fclose(f);
  return got == (size_t)n;
}

// Bilinear resize RGB -> (th, tw) into caller buffer (uint8, NHWC layout).
void resize_bilinear(const Image& img, int th, int tw, uint8_t* out) {
  if (img.w == tw && img.h == th) {
    memcpy(out, img.data.data(), (size_t)th * tw * 3);
    return;
  }
  const float sx = (float)img.w / tw;
  const float sy = (float)img.h / th;
  for (int y = 0; y < th; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (y0 < 0) y0 = 0;
    int y1 = y0 + 1 < img.h ? y0 + 1 : img.h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < tw; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (x0 < 0) x0 = 0;
      int x1 = x0 + 1 < img.w ? x0 + 1 : img.w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; c++) {
        float v00 = img.data[((size_t)y0 * img.w + x0) * 3 + c];
        float v01 = img.data[((size_t)y0 * img.w + x1) * 3 + c];
        float v10 = img.data[((size_t)y1 * img.w + x0) * 3 + c];
        float v11 = img.data[((size_t)y1 * img.w + x1) * 3 + c];
        float top = v00 * (1 - wx) + v01 * wx;
        float bot = v10 * (1 - wx) + v11 * wx;
        out[((size_t)y * tw + x) * 3 + c] = (uint8_t)(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

// Find '00dc' chunks holding JPEG payloads in an MJPEG AVI.
std::vector<std::pair<size_t, size_t>> avi_jpeg_chunks(const std::vector<uint8_t>& data) {
  std::vector<std::pair<size_t, size_t>> chunks;
  size_t pos = 0;
  while (pos + 8 < data.size()) {
    if (memcmp(data.data() + pos, "00dc", 4) == 0) {
      uint32_t size;
      memcpy(&size, data.data() + pos + 4, 4);
      size_t payload = pos + 8;
      if (payload + size <= data.size() && size > 2 &&
          data[payload] == 0xFF && data[payload + 1] == 0xD8) {
        chunks.emplace_back(payload, size);
        pos = payload + size;
        continue;
      }
    }
    pos++;
  }
  return chunks;
}

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; i++) fn(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> threads;
  int workers = std::min(n_threads, n);
  for (int t = 0; t < workers; t++) {
    threads.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

int ccvs_decode_jpeg_file(const char* path, int th, int tw, uint8_t* out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  Image img;
  if (!decode_jpeg_mem(buf.data(), buf.size(), &img)) return -2;
  resize_bilinear(img, th, tw, out);
  return 0;
}

int ccvs_decode_jpeg_batch(const char** paths, int n, int th, int tw,
                           uint8_t* out, int n_threads) {
  std::atomic<int> err{0};
  parallel_for(n, n_threads, [&](int i) {
    int r = ccvs_decode_jpeg_file(paths[i], th, tw, out + (size_t)i * th * tw * 3);
    if (r != 0) err.store(r);
  });
  return err.load();
}

int ccvs_avi_frame_count(const char* path) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  return (int)avi_jpeg_chunks(buf).size();
}

int ccvs_avi_decode_frames(const char* path, const int* idxs, int n, int th,
                           int tw, uint8_t* out, int n_threads) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  auto chunks = avi_jpeg_chunks(buf);
  std::atomic<int> err{0};
  parallel_for(n, n_threads, [&](int i) {
    int idx = idxs[i];
    if (idx < 0 || idx >= (int)chunks.size()) {
      err.store(-3);
      return;
    }
    Image img;
    if (!decode_jpeg_mem(buf.data() + chunks[idx].first, chunks[idx].second, &img)) {
      err.store(-2);
      return;
    }
    resize_bilinear(img, th, tw, out + (size_t)i * th * tw * 3);
  });
  return err.load();
}

}  // extern "C"
