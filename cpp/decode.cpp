// Image decode via the system libjpeg/libpng: the host input pipeline's
// native fast path (mapping_tpu/utils/native_decode.py).
//
// The reference fed its GPUs with torch DataLoader worker PROCESSES running
// PIL per item (reference src/loaders.py:176-304, neptune.yaml num_workers).
// Our loader decodes on threads inside one process (data/loader.py
// _decode_many); PIL's Python object layer + mode conversion is pure
// overhead there, so this module exposes direct libjpeg-turbo / libpng
// decodes that release the GIL for the whole call (ctypes foreign calls drop
// it), letting the decode threads scale with host cores.
//
// API contract (all return 0 on success, negative on failure; callers fall
// back to PIL):
//   decode_probe(path, &h, &w)            -- header-only size read
//   decode_image(path, out, cap, channels, &h, &w) -- 3 = RGB HWC, 1 = gray
//   decode_probe_mem / decode_image_mem    -- same, from an in-memory buffer
//     (the serving daemon's request bodies arrive as bytes, never files)

#include <csetjmp>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

enum Format { FMT_UNKNOWN = 0, FMT_JPEG, FMT_PNG };

Format sniff_mem(const unsigned char* magic, long n) {
  if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) return FMT_JPEG;
  if (n >= 8 && !png_sig_cmp(magic, 0, 8)) return FMT_PNG;
  return FMT_UNKNOWN;
}

Format sniff(FILE* f) {
  unsigned char magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  return sniff_mem(magic, (long)n);
}

// src: a FILE* (buf == nullptr) or an in-memory buffer
int jpeg_decode(FILE* f, const unsigned char* buf, unsigned long len,
                unsigned char* out, long cap, int channels,
                int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  if (buf) {
    jpeg_mem_src(&cinfo, buf, len);
  } else {
    jpeg_stdio_src(&cinfo, f);
  }
  jpeg_read_header(&cinfo, TRUE);
  if (h) *h = (int)cinfo.image_height;
  if (w) *w = (int)cinfo.image_width;
  if (!out) {  // probe only
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (channels == 1 && cinfo.jpeg_color_space != JCS_GRAYSCALE) {
    // color->gray luma rounding differs from PIL's convert("L"); let the
    // caller fall back so results stay byte-identical either way
    jpeg_destroy_decompress(&cinfo);
    return -5;
  }
  cinfo.out_color_space = channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  long row_bytes = (long)cinfo.output_width * cinfo.output_components;
  if ((long)cinfo.output_height * row_bytes > cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + (long)cinfo.output_scanline * row_bytes;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// shared post-begin body: `image` has been begin_read from a file or buffer
int png_decode_begun(png_image& image, unsigned char* out, long cap,
                     int channels, int* h, int* w) {
  if (h) *h = (int)image.height;
  if (w) *w = (int)image.width;
  if (!out) {  // probe only
    png_image_free(&image);
    return 0;
  }
  // only conversions that are exact vs PIL: no alpha compositing, no 16-bit
  // narrowing, no color->gray luma (each rounds differently across codecs)
  if ((image.format & PNG_FORMAT_FLAG_ALPHA) ||
      (image.format & PNG_FORMAT_FLAG_LINEAR) ||
      (channels == 1 && (image.format & PNG_FORMAT_FLAG_COLOR))) {
    png_image_free(&image);
    return -5;
  }
  image.format = channels == 1 ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  long need = (long)PNG_IMAGE_SIZE(image);
  if (need > cap) {
    png_image_free(&image);
    return -3;
  }
  if (!png_image_finish_read(&image, nullptr, out, 0, nullptr)) {
    png_image_free(&image);
    return -2;
  }
  return 0;
}

}  // namespace

extern "C" {

// Header-only size probe. Returns 0 and fills h/w, negative on error.
int decode_probe(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Format fmt = sniff(f);
  int rc;
  if (fmt == FMT_JPEG) {
    rc = jpeg_decode(f, nullptr, 0, nullptr, 0, 3, h, w);
  } else if (fmt == FMT_PNG) {
    fclose(f);
    png_image image;
    memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_file(&image, path)) return -2;
    return png_decode_begun(image, nullptr, 0, 3, h, w);
  } else {
    rc = -1;
  }
  fclose(f);
  return rc;
}

// Full decode into caller buffer (row-major HWC, `channels` = 3 or 1).
// oh/ow (optional) report the dimensions ACTUALLY decoded: the caller
// sizes its buffer from a separate decode_probe, and a file replaced
// between probe and decode would otherwise fill that buffer with a
// different geometry silently (partial rows + uninitialized tail).
int decode_image(const char* path, unsigned char* out, long cap,
                 int channels, int* oh, int* ow) {
  if (channels != 1 && channels != 3) return -4;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Format fmt = sniff(f);
  int rc;
  int h = 0, w = 0;
  if (fmt == FMT_JPEG) {
    rc = jpeg_decode(f, nullptr, 0, out, cap, channels, &h, &w);
  } else if (fmt == FMT_PNG) {
    fclose(f);
    png_image image;
    memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_file(&image, path)) return -2;
    rc = png_decode_begun(image, out, cap, channels, &h, &w);
    if (oh) *oh = h;
    if (ow) *ow = w;
    return rc;
  } else {
    rc = -1;
  }
  fclose(f);
  if (oh) *oh = h;
  if (ow) *ow = w;
  return rc;
}

// In-memory variants: the serving daemon's request bodies are bytes (no
// file ever exists), so these give the HTTP handler threads the same
// GIL-free decode as the offline loader's path-based fast path.
int decode_probe_mem(const unsigned char* buf, long len, int* h, int* w) {
  if (!buf || len < 8) return -1;
  Format fmt = sniff_mem(buf, len);
  if (fmt == FMT_JPEG)
    return jpeg_decode(nullptr, buf, (unsigned long)len, nullptr, 0, 3, h, w);
  if (fmt == FMT_PNG) {
    png_image image;
    memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, buf, (size_t)len))
      return -2;
    return png_decode_begun(image, nullptr, 0, 3, h, w);
  }
  return -1;
}

int decode_image_mem(const unsigned char* buf, long len, unsigned char* out,
                     long cap, int channels) {
  if (channels != 1 && channels != 3) return -4;
  if (!buf || len < 8) return -1;
  Format fmt = sniff_mem(buf, len);
  int h = 0, w = 0;
  if (fmt == FMT_JPEG)
    return jpeg_decode(nullptr, buf, (unsigned long)len, out, cap, channels,
                       &h, &w);
  if (fmt == FMT_PNG) {
    png_image image;
    memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, buf, (size_t)len))
      return -2;
    return png_decode_begun(image, out, cap, channels, &h, &w);
  }
  return -1;
}

}  // extern "C"
