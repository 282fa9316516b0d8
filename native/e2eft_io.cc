// e2eft_io: native data-loading substrate for the TPU framework.
//
// The reference delegates its host-side decode path to PIL/cv2 inside torch
// DataLoader workers; here the hot host ops are C++ behind a C ABI consumed via
// ctypes (no pybind11 in the image):
//   * PNG decode (8/16-bit gray, RGB, RGBA)  - libpng
//   * JPEG decode (RGB)                      - libjpeg
//   * fused 16-bit-PNG -> float32 depth with a scale divisor (the NYU/ScanNet/
//     KITTI mm/cm decode path) so no intermediate uint16 buffer crosses the FFI
//   * POSIX tar index + member reads for the tar-backed eval datasets
//
// Every entry point returns 0 on success and a negative errno-style code
// otherwise; buffers are caller-owned numpy arrays.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

struct PngMemSrc {
  const uint8_t* data;
  size_t size;
  size_t offset;
};

static void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  PngMemSrc* src = static_cast<PngMemSrc*>(png_get_io_ptr(png));
  if (src->offset + n > src->size) {
    png_error(png, "png: read past end of buffer");
  }
  memcpy(out, src->data + src->offset, n);
  src->offset += n;
}

// Probe a PNG header: fills height/width/channels/bit_depth.
int png_probe(const uint8_t* buf, size_t len, int32_t* h, int32_t* w,
              int32_t* channels, int32_t* bit_depth) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return -1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return -2; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;
  }
  PngMemSrc src{buf, len, 0};
  png_set_read_fn(png, &src, png_mem_read);
  png_read_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  *bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  int ch = 1;
  switch (color) {
    case PNG_COLOR_TYPE_GRAY: ch = 1; break;
    case PNG_COLOR_TYPE_GRAY_ALPHA: ch = 2; break;
    case PNG_COLOR_TYPE_RGB: ch = 3; break;
    case PNG_COLOR_TYPE_RGB_ALPHA: ch = 4; break;
    case PNG_COLOR_TYPE_PALETTE: ch = 3; break;  // expanded on decode
  }
  *channels = ch;
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Decode into caller buffer (h*w*channels elements, uint8 or uint16 by bit_depth).
// 16-bit output is host-endian.
int png_decode(const uint8_t* buf, size_t len, uint8_t* out, size_t out_len) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return -2; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;
  }
  PngMemSrc src{buf, len, 0};
  png_set_read_fn(png, &src, png_mem_read);
  png_read_info(png, info);

  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (depth == 16) png_set_swap(png);  // PNG is big-endian; host is little
  png_read_update_info(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  size_t h = png_get_image_height(png, info);
  if (rowbytes * h > out_len) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -4;
  }
  std::vector<png_bytep> rows(h);
  for (size_t y = 0; y < h; ++y) rows[y] = out + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Fused: decode a 16-bit grayscale PNG and divide by `scale` into float32 metric
// depth (the mm/cm -> meters path), no intermediate uint16 copy for the caller.
int png16_to_depth_f32(const uint8_t* buf, size_t len, float scale,
                       float* out, size_t out_elems) {
  int32_t h, w, ch, depth;
  int rc = png_probe(buf, len, &h, &w, &ch, &depth);
  if (rc != 0) return rc;
  if (ch != 1 || depth != 16) return -5;
  if (static_cast<size_t>(h) * w > out_elems) return -4;
  std::vector<uint16_t> tmp(static_cast<size_t>(h) * w);
  rc = png_decode(buf, len, reinterpret_cast<uint8_t*>(tmp.data()),
                  tmp.size() * sizeof(uint16_t));
  if (rc != 0) return rc;
  const float inv = 1.0f / scale;
  const size_t n = tmp.size();
  for (size_t i = 0; i < n; ++i) out[i] = static_cast<float>(tmp[i]) * inv;
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

int jpeg_probe(const uint8_t* buf, size_t len, int32_t* h, int32_t* w,
               int32_t* channels) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return -3; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  *channels = 3;  // decoded as RGB below
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int jpeg_decode_rgb(const uint8_t* buf, size_t len, uint8_t* out, size_t out_len) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return -3; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  size_t rowbytes = static_cast<size_t>(cinfo.output_width) * cinfo.output_components;
  if (rowbytes * cinfo.output_height > out_len) {
    jpeg_destroy_decompress(&cinfo);
    return -4;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + cinfo.output_scanline * rowbytes;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// POSIX tar index + member reads
// ---------------------------------------------------------------------------

struct TarEntry {
  std::string name;
  uint64_t offset;  // of file data
  uint64_t size;
};

struct TarIndex {
  std::vector<TarEntry> entries;
  FILE* fp;
};

static uint64_t tar_octal(const char* field, size_t n) {
  uint64_t v = 0;
  for (size_t i = 0; i < n && field[i]; ++i) {
    if (field[i] < '0' || field[i] > '7') continue;
    v = (v << 3) | static_cast<uint64_t>(field[i] - '0');
  }
  return v;
}

// Build an index of regular-file members. Returns an opaque handle or null.
void* tar_open(const char* path) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return nullptr;
  TarIndex* idx = new TarIndex();
  idx->fp = fp;
  uint8_t hdr[512];
  uint64_t offset = 0;
  std::string pending_longname;
  while (fread(hdr, 1, 512, fp) == 512) {
    offset += 512;
    bool all_zero = true;
    for (int i = 0; i < 512; ++i) if (hdr[i]) { all_zero = false; break; }
    if (all_zero) break;
    char type = static_cast<char>(hdr[156]);
    uint64_t size = tar_octal(reinterpret_cast<char*>(hdr + 124), 12);
    uint64_t data_blocks = (size + 511) / 512;
    if (type == 'L') {  // GNU long name
      std::vector<char> nm(size + 1, 0);
      if (fread(nm.data(), 1, size, fp) != size) break;
      pending_longname.assign(nm.data());
      fseek(fp, static_cast<long>(data_blocks * 512 - size), SEEK_CUR);
      offset += data_blocks * 512;
      continue;
    }
    std::string name;
    if (!pending_longname.empty()) {
      name = pending_longname;
      pending_longname.clear();
    } else {
      char nm[101] = {0};
      memcpy(nm, hdr, 100);
      char prefix[156] = {0};
      memcpy(prefix, hdr + 345, 155);
      name = prefix[0] ? std::string(prefix) + "/" + nm : std::string(nm);
    }
    if (type == '0' || type == 0) {
      idx->entries.push_back({name, offset, size});
    }
    fseek(fp, static_cast<long>(data_blocks * 512), SEEK_CUR);
    offset += data_blocks * 512;
  }
  return idx;
}

int64_t tar_num_entries(void* handle) {
  return static_cast<TarIndex*>(handle)->entries.size();
}

// Name of entry i; returns bytes written (excl. NUL) or -1.
int64_t tar_entry_name(void* handle, int64_t i, char* out, int64_t out_len) {
  TarIndex* idx = static_cast<TarIndex*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(idx->entries.size())) return -1;
  const std::string& n = idx->entries[i].name;
  if (static_cast<int64_t>(n.size()) + 1 > out_len) return -1;
  memcpy(out, n.data(), n.size());
  out[n.size()] = 0;
  return static_cast<int64_t>(n.size());
}

int64_t tar_entry_size(void* handle, int64_t i) {
  TarIndex* idx = static_cast<TarIndex*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(idx->entries.size())) return -1;
  return static_cast<int64_t>(idx->entries[i].size);
}

// Find an entry by name, with or without a leading "./". Returns index or -1.
int64_t tar_find(void* handle, const char* name) {
  TarIndex* idx = static_cast<TarIndex*>(handle);
  std::string want(name);
  std::string want_dot = "./" + want;
  for (size_t i = 0; i < idx->entries.size(); ++i) {
    const std::string& n = idx->entries[i].name;
    if (n == want || n == want_dot) return static_cast<int64_t>(i);
    if (n.size() > 2 && n.compare(0, 2, "./") == 0 && n.compare(2, std::string::npos, want) == 0)
      return static_cast<int64_t>(i);
  }
  return -1;
}

int tar_read(void* handle, int64_t i, uint8_t* out, int64_t out_len) {
  TarIndex* idx = static_cast<TarIndex*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(idx->entries.size())) return -1;
  const TarEntry& e = idx->entries[i];
  if (static_cast<int64_t>(e.size) > out_len) return -4;
  if (fseek(idx->fp, static_cast<long>(e.offset), SEEK_SET) != 0) return -2;
  if (fread(out, 1, e.size, idx->fp) != e.size) return -2;
  return 0;
}

void tar_close(void* handle) {
  TarIndex* idx = static_cast<TarIndex*>(handle);
  fclose(idx->fp);
  delete idx;
}

}  // extern "C"
