/* devtools helper: drive the system libjpeg(-turbo) as the live
 * oracle for arithmetic-coded JPEG (the libwebp/libtiff pattern).
 *
 *   enc  <raw.ppm|raw.pgm> <out.jpg> <quality> <restart> [progressive]
 *        encode with cinfo.arith_code = TRUE (SOF9/SOF10)
 *   dec  <in.jpg> <out.ppm|out.pgm>
 *        decode any JPEG to PPM/PGM (ground-truth pixels)
 *   coef <in.jpg>
 *        print quantized coefficient blocks (debug ground truth)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(1); }

static unsigned char *read_pnm(const char *path, int *w, int *h, int *nc)
{
  FILE *f = fopen(path, "rb");
  char magic[3] = {0};
  int maxv;
  unsigned char *buf;
  size_t n;
  if (!f) die("open pnm");
  if (fscanf(f, "%2s %d %d %d", magic, w, h, &maxv) != 4) die("pnm hdr");
  fgetc(f);
  *nc = strcmp(magic, "P6") == 0 ? 3 : 1;
  n = (size_t)(*w) * (*h) * (*nc);
  buf = malloc(n);
  if (fread(buf, 1, n, f) != n) die("pnm data");
  fclose(f);
  return buf;
}

static void enc(const char *in, const char *out, int quality,
                int restart, int progressive)
{
  int w, h, nc;
  unsigned char *img = read_pnm(in, &w, &h, &nc);
  struct jpeg_compress_struct c;
  struct jpeg_error_mgr jerr;
  FILE *f = fopen(out, "wb");
  JSAMPROW row;
  if (!f) die("open out");
  c.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&c);
  jpeg_stdio_dest(&c, f);
  c.image_width = w;
  c.image_height = h;
  c.input_components = nc;
  c.in_color_space = nc == 3 ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, quality, TRUE);
  c.arith_code = TRUE;          /* the whole point */
  if (progressive)
    jpeg_simple_progression(&c);
  if (restart > 0)
    c.restart_interval = restart;
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    row = img + (size_t)c.next_scanline * w * nc;
    jpeg_write_scanlines(&c, &row, 1);
  }
  jpeg_finish_compress(&c);
  jpeg_destroy_compress(&c);
  fclose(f);
  free(img);
}

static void dec(const char *in, const char *out)
{
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr jerr;
  FILE *fi = fopen(in, "rb"), *fo = fopen(out, "wb");
  unsigned char *row;
  if (!fi || !fo) die("open");
  d.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&d);
  jpeg_stdio_src(&d, fi);
  jpeg_read_header(&d, TRUE);
  jpeg_start_decompress(&d);
  fprintf(fo, "%s\n%d %d\n255\n",
          d.output_components == 3 ? "P6" : "P5",
          d.output_width, d.output_height);
  row = malloc((size_t)d.output_width * d.output_components);
  while (d.output_scanline < d.output_height) {
    jpeg_read_scanlines(&d, &row, 1);
    fwrite(row, 1, (size_t)d.output_width * d.output_components, fo);
  }
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  free(row);
  fclose(fi);
  fclose(fo);
}

static void coef(const char *in)
{
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr jerr;
  FILE *fi = fopen(in, "rb");
  jvirt_barray_ptr *ba;
  int ci;
  if (!fi) die("open");
  d.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&d);
  jpeg_stdio_src(&d, fi);
  jpeg_read_header(&d, TRUE);
  ba = jpeg_read_coefficients(&d);
  for (ci = 0; ci < d.num_components; ci++) {
    jpeg_component_info *comp = d.comp_info + ci;
    JDIMENSION by;
    printf("component %d blocks %ux%u\n", ci,
           comp->width_in_blocks, comp->height_in_blocks);
    for (by = 0; by < comp->height_in_blocks; by++) {
      JBLOCKARRAY rows = (*d.mem->access_virt_barray)
        ((j_common_ptr)&d, ba[ci], by, 1, FALSE);
      JDIMENSION bx;
      for (bx = 0; bx < comp->width_in_blocks; bx++) {
        int k;
        printf("blk %d %u %u:", ci, by, bx);
        for (k = 0; k < 64; k++)
          printf(" %d", rows[0][bx][k]);
        printf("\n");
      }
    }
  }
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
  fclose(fi);
}

int main(int argc, char **argv)
{
  if (argc >= 2 && strcmp(argv[1], "enc") == 0 && argc >= 6)
    enc(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]),
        argc > 6 && strcmp(argv[6], "progressive") == 0);
  else if (argc >= 2 && strcmp(argv[1], "dec") == 0 && argc == 4)
    dec(argv[2], argv[3]);
  else if (argc >= 2 && strcmp(argv[1], "coef") == 0 && argc == 3)
    coef(argv[2]);
  else
    die("usage: enc in.pnm out.jpg q restart [progressive] | "
        "dec in.jpg out.pnm | coef in.jpg");
  return 0;
}
