// gagan_loader: native dataset-zip reader with parallel PNG decode.
//
// TPU-native counterpart of the reference's data path (torch DataLoader
// worker processes over `training/dataset.py` zips): one process, a zip
// central-directory index, and a pthread fan-out that decodes a batch of
// PNGs (libpng) into a caller-provided NCHW uint8 buffer without holding
// the Python GIL (ctypes releases it for the duration of the call).
//
// Supports the dataset_tool output format (ZIP, stored or deflated entries,
// 8-bit RGB/grayscale PNG) — see gagan_tpu/data/dataset_tool.py.
//
// Build: make -C native   (g++ -O3 -shared -fPIC ... -lpng -lz -pthread)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>
#include <algorithm>
#include <atomic>

#include <png.h>
#include <zlib.h>

namespace {

struct ZipEntry {
  std::string name;
  uint64_t header_offset;
  uint64_t comp_size;
  uint64_t uncomp_size;
  uint16_t method;  // 0 = stored, 8 = deflate
};

struct Loader {
  FILE* file = nullptr;
  std::mutex io_mutex;
  std::vector<ZipEntry> images;           // sorted by name
  int channels = 0, height = 0, width = 0;
  std::string error;
};

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}

bool has_image_ext(const std::string& name) {
  auto dot = name.rfind('.');
  if (dot == std::string::npos) return false;
  std::string ext = name.substr(dot);
  for (auto& c : ext) c = tolower(c);
  return ext == ".png";
}

// Parse the end-of-central-directory record + central directory.
bool parse_zip(Loader* L) {
  FILE* f = L->file;
  fseek(f, 0, SEEK_END);
  long file_size = ftell(f);
  long scan = std::min(file_size, (long)(65536 + 22));
  std::vector<uint8_t> tail(scan);
  fseek(f, file_size - scan, SEEK_SET);
  if (fread(tail.data(), 1, scan, f) != (size_t)scan) {
    L->error = "failed to read zip tail";
    return false;
  }
  long eocd = -1;
  for (long i = scan - 22; i >= 0; i--) {
    if (rd32(&tail[i]) == 0x06054b50) { eocd = i; break; }
  }
  if (eocd < 0) { L->error = "no end-of-central-directory"; return false; }
  uint16_t num_entries = rd16(&tail[eocd + 10]);
  uint32_t cd_size = rd32(&tail[eocd + 12]);
  uint32_t cd_offset = rd32(&tail[eocd + 16]);

  std::vector<uint8_t> cd(cd_size);
  fseek(f, cd_offset, SEEK_SET);
  if (fread(cd.data(), 1, cd_size, f) != cd_size) {
    L->error = "failed to read central directory";
    return false;
  }
  size_t p = 0;
  for (int i = 0; i < num_entries; i++) {
    if (p + 46 > cd.size() || rd32(&cd[p]) != 0x02014b50) {
      L->error = "bad central directory entry";
      return false;
    }
    ZipEntry e;
    e.method = rd16(&cd[p + 10]);
    e.comp_size = rd32(&cd[p + 20]);
    e.uncomp_size = rd32(&cd[p + 24]);
    uint16_t name_len = rd16(&cd[p + 28]);
    uint16_t extra_len = rd16(&cd[p + 30]);
    uint16_t comment_len = rd16(&cd[p + 32]);
    e.header_offset = rd32(&cd[p + 42]);
    e.name.assign((const char*)&cd[p + 46], name_len);
    p += 46 + name_len + extra_len + comment_len;
    if (has_image_ext(e.name)) L->images.push_back(std::move(e));
  }
  std::sort(L->images.begin(), L->images.end(),
            [](const ZipEntry& a, const ZipEntry& b) { return a.name < b.name; });
  return true;
}

// Read an entry's (decompressed) bytes; thread-safe via the io mutex for the
// file read, decompression outside the lock.
bool read_entry(Loader* L, const ZipEntry& e, std::vector<uint8_t>* out,
                std::string* err) {
  std::vector<uint8_t> raw(e.comp_size);
  {
    std::lock_guard<std::mutex> lock(L->io_mutex);
    // Local file header: 30 bytes + name + extra (must re-read lengths).
    uint8_t lfh[30];
    fseek(L->file, e.header_offset, SEEK_SET);
    if (fread(lfh, 1, 30, L->file) != 30 || rd32(lfh) != 0x04034b50) {
      *err = "bad local file header";
      return false;
    }
    uint16_t name_len = rd16(&lfh[26]);
    uint16_t extra_len = rd16(&lfh[28]);
    fseek(L->file, e.header_offset + 30 + name_len + extra_len, SEEK_SET);
    if (fread(raw.data(), 1, raw.size(), L->file) != raw.size()) {
      *err = "short entry read";
      return false;
    }
  }
  if (e.method == 0) {
    *out = std::move(raw);
    return true;
  }
  if (e.method == 8) {
    out->resize(e.uncomp_size);
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    inflateInit2(&zs, -15);  // raw deflate
    zs.next_in = raw.data();
    zs.avail_in = raw.size();
    zs.next_out = out->data();
    zs.avail_out = out->size();
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (rc != Z_STREAM_END) {
      *err = "inflate failed";
      return false;
    }
    return true;
  }
  *err = "unsupported compression method";
  return false;
}

struct PngMem {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void png_read_cb(png_structp png, png_bytep out, png_size_t n) {
  PngMem* m = (PngMem*)png_get_io_ptr(png);
  if (m->pos + n > m->size) png_error(png, "png: short read");
  memcpy(out, m->data + m->pos, n);
  m->pos += n;
}

// Decode a PNG from memory into HWC uint8 (forcing 8-bit, stripping alpha).
bool decode_png(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
                int* channels, int* height, int* width, std::string* err) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    *err = "png decode error";
    return false;
  }
  PngMem mem{data, size, 0};
  png_set_read_fn(png, &mem, png_read_cb);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_packing(png);
  png_set_strip_alpha(png);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY &&
      png_get_bit_depth(png, info) < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);

  *width = png_get_image_width(png, info);
  *height = png_get_image_height(png, info);
  *channels = png_get_channels(png, info);

  out->resize((size_t)(*height) * (*width) * (*channels));
  std::vector<png_bytep> rows(*height);
  size_t stride = (size_t)(*width) * (*channels);
  for (int y = 0; y < *height; y++) rows[y] = out->data() + y * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

}  // namespace

extern "C" {

void* gl_open(const char* zip_path) {
  Loader* L = new Loader();
  L->file = fopen(zip_path, "rb");
  if (!L->file) {
    L->error = "cannot open file";
    return L;
  }
  if (!parse_zip(L) || L->images.empty()) {
    if (L->error.empty()) L->error = "no images in zip";
    return L;
  }
  // Probe the first image for the dataset shape.
  std::vector<uint8_t> bytes, pixels;
  std::string err;
  if (read_entry(L, L->images[0], &bytes, &err) &&
      decode_png(bytes.data(), bytes.size(), &pixels, &L->channels,
                 &L->height, &L->width, &err)) {
    return L;
  }
  L->error = err.empty() ? "probe failed" : err;
  return L;
}

const char* gl_error(void* handle) {
  Loader* L = (Loader*)handle;
  return L->error.empty() ? nullptr : L->error.c_str();
}

long long gl_num_images(void* handle) {
  return (long long)((Loader*)handle)->images.size();
}

void gl_shape(void* handle, int* c, int* h, int* w) {
  Loader* L = (Loader*)handle;
  *c = L->channels;
  *h = L->height;
  *w = L->width;
}

// Decode `n` images (raw dataset indices) into out[n, C, H, W] uint8,
// x-flipping entry i when xflip[i] != 0.  Returns 0 on success.
int gl_read_batch(void* handle, const long long* indices,
                  const unsigned char* xflip, int n, unsigned char* out) {
  Loader* L = (Loader*)handle;
  const int C = L->channels, H = L->height, W = L->width;
  const size_t img_elems = (size_t)C * H * W;
  std::atomic<int> failed{0};

  int n_threads = std::min((int)std::thread::hardware_concurrency(),
                           std::max(n, 1));
  n_threads = std::max(1, std::min(n_threads, 16));

  auto worker = [&](int tid) {
    std::vector<uint8_t> bytes, pixels;
    std::string err;
    for (int i = tid; i < n; i += n_threads) {
      long long idx = indices[i];
      if (idx < 0 || idx >= (long long)L->images.size()) { failed = 1; continue; }
      int c, h, w;
      if (!read_entry(L, L->images[idx], &bytes, &err) ||
          !decode_png(bytes.data(), bytes.size(), &pixels, &c, &h, &w,
                      &err) || c != C || h != H || w != W) {
        failed = 1;
        continue;
      }
      // HWC -> CHW with optional horizontal flip.
      unsigned char* dst = out + (size_t)i * img_elems;
      bool flip = xflip && xflip[i];
      for (int ch = 0; ch < C; ch++) {
        for (int y = 0; y < H; y++) {
          const uint8_t* src_row = pixels.data() + ((size_t)y * W) * C + ch;
          unsigned char* dst_row = dst + ((size_t)ch * H + y) * W;
          if (!flip) {
            for (int x = 0; x < W; x++) dst_row[x] = src_row[(size_t)x * C];
          } else {
            for (int x = 0; x < W; x++)
              dst_row[x] = src_row[(size_t)(W - 1 - x) * C];
          }
        }
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) threads.emplace_back(worker, t);
  for (auto& t : threads) t.join();
  return failed.load();
}

void gl_close(void* handle) {
  Loader* L = (Loader*)handle;
  if (L->file) fclose(L->file);
  delete L;
}

}  // extern "C"
