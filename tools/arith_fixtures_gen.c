/* Fixture generator for arithmetic-JPEG work: encodes deterministic
 * images with libjpeg's arithmetic coder (sequential), re-reads the
 * quantized coefficients and decoded pixels, dumps all as hex. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void dump(const char *tag, const unsigned char *b, long n) {
  printf("%s %ld ", tag, n);
  for (long i = 0; i < n; i++) printf("%02x", b[i]);
  printf("\n");
}

static void gen_gray(int w, int h, unsigned char *px) {
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++) {
      long v = (x * 7 + y * 13 + ((x * y) % 31)) % 256;
      px[y * w + x] = (unsigned char) v;
    }
}

static void gen_rgb(int w, int h, unsigned char *px) {
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++) {
      px[(y * w + x) * 3 + 0] = (unsigned char)((x * 11 + y * 3) % 256);
      px[(y * w + x) * 3 + 1] = (unsigned char)((x * 5 + y * 17 + 40) % 256);
      px[(y * w + x) * 3 + 2] = (unsigned char)((x * 2 + y * 23 + 90) % 256);
    }
}

static unsigned char *encode(int w, int h, int ncomp, unsigned char *px,
    int quality, unsigned long *outLen, int restart) {
  struct jpeg_compress_struct c;
  struct jpeg_error_mgr err;
  unsigned char *buf = NULL; unsigned long len = 0;
  c.err = jpeg_std_error(&err);
  jpeg_create_compress(&c);
  jpeg_mem_dest(&c, &buf, &len);
  c.image_width = w; c.image_height = h;
  c.input_components = ncomp;
  c.in_color_space = ncomp == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, quality, TRUE);
  c.arith_code = TRUE;
  c.restart_interval = restart;
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    JSAMPROW row = px + c.next_scanline * w * ncomp;
    jpeg_write_scanlines(&c, &row, 1);
  }
  jpeg_finish_compress(&c);
  jpeg_destroy_compress(&c);
  *outLen = len;
  return buf;
}

static void decode_dump(const char *tag, unsigned char *jpg,
    unsigned long n) {
  /* decoded pixels */
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr err;
  d.err = jpeg_std_error(&err);
  jpeg_create_decompress(&d);
  jpeg_mem_src(&d, jpg, n);
  jpeg_read_header(&d, TRUE);
  jpeg_start_decompress(&d);
  int w = d.output_width, h = d.output_height, nc = d.output_components;
  unsigned char *px = malloc((size_t) w * h * nc);
  while (d.output_scanline < (unsigned) h) {
    JSAMPROW row = px + (size_t) d.output_scanline * w * nc;
    jpeg_read_scanlines(&d, &row, 1);
  }
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  printf("%s_dims %d %d %d\n", tag, w, h, nc);
  dump("px", px, (long) w * h * nc);
  free(px);

  /* quantized coefficients (entropy-layer ground truth) */
  struct jpeg_decompress_struct d2;
  d2.err = jpeg_std_error(&err);
  jpeg_create_decompress(&d2);
  jpeg_mem_src(&d2, jpg, n);
  jpeg_read_header(&d2, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&d2);
  for (int ci = 0; ci < d2.num_components; ci++) {
    jpeg_component_info *comp = d2.comp_info + ci;
    printf("coef %s c%d %d %d\n", tag, ci,
      (int) comp->width_in_blocks, (int) comp->height_in_blocks);
    for (JDIMENSION by = 0; by < comp->height_in_blocks; by++) {
      JBLOCKARRAY rows = (*d2.mem->access_virt_barray)
        ((j_common_ptr) &d2, coefs[ci], by, 1, FALSE);
      for (JDIMENSION bx = 0; bx < comp->width_in_blocks; bx++) {
        printf("blk %d %u %u", ci, (unsigned) bx, (unsigned) by);
        for (int k = 0; k < 64; k++) printf(" %d", rows[0][bx][k]);
        printf("\n");
      }
    }
  }
  jpeg_finish_decompress(&d2);
  jpeg_destroy_decompress(&d2);
}

int main(void) {
  unsigned long n;
  /* fixture A: 16x16 grayscale, q75, no restart */
  unsigned char ga[16 * 16]; gen_gray(16, 16, ga);
  unsigned char *ja = encode(16, 16, 1, ga, 75, &n, 0);
  dump("jpg_a", ja, (long) n);
  decode_dump("a", ja, n);
  /* fixture B: 32x16 color 4:2:0, q60, restart every 2 MCUs */
  unsigned char gb[32 * 16 * 3]; gen_rgb(32, 16, gb);
  unsigned char *jb = encode(32, 16, 3, gb, 60, &n, 2);
  dump("jpg_b", jb, (long) n);
  decode_dump("b", jb, n);
  /* fixture C: 24x8 grayscale q90 (different table, 3 MCUs) */
  unsigned char gc[24 * 8]; gen_gray(24, 8, gc);
  unsigned char *jc = encode(24, 8, 1, gc, 90, &n, 0);
  dump("jpg_c", jc, (long) n);
  decode_dump("c", jc, n);
  return 0;
}
