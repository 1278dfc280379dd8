#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
static void dump(const char *tag, const unsigned char *b, long n) {
  printf("%s %ld ", tag, n);
  for (long i = 0; i < n; i++) printf("%02x", b[i]);
  printf("\n");
}
static unsigned char *enc(int w, int h, int ncomp, unsigned char *px,
    int quality, unsigned long *outLen, int restart, int force111) {
  struct jpeg_compress_struct c; struct jpeg_error_mgr err;
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
  if (force111) for (int i = 0; i < c.num_components; i++) {
    c.comp_info[i].h_samp_factor = 1; c.comp_info[i].v_samp_factor = 1;
  }
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    JSAMPROW row = px + c.next_scanline * w * ncomp;
    jpeg_write_scanlines(&c, &row, 1);
  }
  jpeg_finish_compress(&c); jpeg_destroy_compress(&c);
  *outLen = len; return buf;
}
static void dec(const char *tag, unsigned char *jpg, unsigned long n) {
  struct jpeg_decompress_struct d; struct jpeg_error_mgr err;
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
  jpeg_finish_decompress(&d); jpeg_destroy_decompress(&d);
  printf("%s_dims %d %d %d\n", tag, w, h, nc);
  dump("px", px, (long) w * h * nc);
  free(px);
}
int main(void) {
  unsigned long n;
  /* D: 32x8 GRAYSCALE, restart every 1 MCU (heaviest restart churn) */
  unsigned char gd[32 * 8];
  for (int y = 0; y < 8; y++) for (int x = 0; x < 32; x++)
    gd[y * 32 + x] = (unsigned char)((x * 7 + y * 13 + ((x * y) % 31)) % 256);
  unsigned char *jd = enc(32, 8, 1, gd, 75, &n, 1, 0);
  dump("jpg_d", jd, (long) n); dec("d", jd, n);
  /* E: 16x16 color 4:4:4, restart 2 */
  unsigned char ge[16 * 16 * 3];
  for (int y = 0; y < 16; y++) for (int x = 0; x < 16; x++) {
    ge[(y * 16 + x) * 3 + 0] = (unsigned char)((x * 11 + y * 3) % 256);
    ge[(y * 16 + x) * 3 + 1] = (unsigned char)((x * 5 + y * 17 + 40) % 256);
    ge[(y * 16 + x) * 3 + 2] = (unsigned char)((x * 2 + y * 23 + 90) % 256);
  }
  unsigned char *je = enc(16, 16, 3, ge, 60, &n, 2, 1);
  dump("jpg_e", je, (long) n); dec("e", je, n);
  /* F: 32x16 color 4:2:0 NO restart (isolates subsampled walk) */
  unsigned char gf[32 * 16 * 3];
  for (int y = 0; y < 16; y++) for (int x = 0; x < 32; x++) {
    gf[(y * 32 + x) * 3 + 0] = (unsigned char)((x * 11 + y * 3) % 256);
    gf[(y * 32 + x) * 3 + 1] = (unsigned char)((x * 5 + y * 17 + 40) % 256);
    gf[(y * 32 + x) * 3 + 2] = (unsigned char)((x * 2 + y * 23 + 90) % 256);
  }
  unsigned char *jf = enc(32, 16, 3, gf, 60, &n, 0, 0);
  dump("jpg_f", jf, (long) n); dec("f", jf, n);
  return 0;
}
