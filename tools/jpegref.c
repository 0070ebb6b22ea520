/* jpegref — tiny libjpeg harness used ONLY by the test suite as an
 * independent conformance reference for the pure-Python JPEG codec in
 * hquery_php_spark/operators/jpeg.py (arithmetic-coding legs in
 * particular).  Built on demand by tests via gcc; production code never
 * calls it.
 *
 *   jpegref encode QUALITY ARITH PROG SUBSAMP DRI  < raw > jpg
 *   jpegref decode                                 < jpg > raw
 *
 * raw format: 12-byte header (3 LE uint32: w, h, ncomp) + row-major
 * interleaved 8-bit samples.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>
#include <setjmp.h>

struct err_mgr { struct jpeg_error_mgr pub; jmp_buf env; };

static void err_exit(j_common_ptr cinfo) {
    struct err_mgr *e = (struct err_mgr *) cinfo->err;
    (*cinfo->err->output_message)(cinfo);
    longjmp(e->env, 1);
}

static unsigned char *read_all(FILE *f, size_t *n) {
    size_t cap = 1 << 20, len = 0;
    unsigned char *buf = malloc(cap);
    for (;;) {
        if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
        size_t r = fread(buf + len, 1, cap - len, f);
        if (r == 0) break;
        len += r;
    }
    *n = len;
    return buf;
}

static unsigned le32(const unsigned char *p) {
    return p[0] | (p[1] << 8) | ((unsigned) p[2] << 16) | ((unsigned) p[3] << 24);
}

static int do_decode(void) {
    size_t n;
    unsigned char *jpg = read_all(stdin, &n);
    struct jpeg_decompress_struct cinfo;
    struct err_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = err_exit;
    if (setjmp(jerr.env)) { jpeg_destroy_decompress(&cinfo); return 2; }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, jpg, n);
    jpeg_read_header(&cinfo, TRUE);
    /* Pixel-exact reproducibility: float IDCT, no fancy upsampling */
    cinfo.dct_method = JDCT_FLOAT;
    cinfo.do_fancy_upsampling = FALSE;
    jpeg_start_decompress(&cinfo);
    unsigned w = cinfo.output_width, h = cinfo.output_height,
             nc = cinfo.output_components;
    unsigned char hdr[12] = {
        w & 255, (w >> 8) & 255, (w >> 16) & 255, (w >> 24) & 255,
        h & 255, (h >> 8) & 255, (h >> 16) & 255, (h >> 24) & 255,
        nc & 255, (nc >> 8) & 255, (nc >> 16) & 255, (nc >> 24) & 255,
    };
    fwrite(hdr, 1, 12, stdout);
    JSAMPROW row = malloc((size_t) w * nc);
    while (cinfo.output_scanline < h) {
        jpeg_read_scanlines(&cinfo, &row, 1);
        fwrite(row, 1, (size_t) w * nc, stdout);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

static int do_encode(int argc, char **argv) {
    if (argc < 7) return 2;
    int quality = atoi(argv[2]), arith = atoi(argv[3]), prog = atoi(argv[4]),
        sub = atoi(argv[5]), dri = atoi(argv[6]);
    size_t n;
    unsigned char *raw = read_all(stdin, &n);
    if (n < 12) return 2;
    unsigned w = le32(raw), h = le32(raw + 4), nc = le32(raw + 8);
    if (n < 12 + (size_t) w * h * nc) return 2;
    struct jpeg_compress_struct cinfo;
    struct err_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = err_exit;
    if (setjmp(jerr.env)) { jpeg_destroy_compress(&cinfo); return 2; }
    jpeg_create_compress(&cinfo);
    unsigned char *out = NULL;
    unsigned long outlen = 0;
    jpeg_mem_dest(&cinfo, &out, &outlen);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = nc;
    cinfo.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = arith ? TRUE : FALSE;
    if (nc == 3) {
        cinfo.comp_info[0].h_samp_factor = sub;
        cinfo.comp_info[0].v_samp_factor = sub;
        cinfo.comp_info[1].h_samp_factor = 1;
        cinfo.comp_info[1].v_samp_factor = 1;
        cinfo.comp_info[2].h_samp_factor = 1;
        cinfo.comp_info[2].v_samp_factor = 1;
    }
    if (prog) jpeg_simple_progression(&cinfo);
    if (dri > 0) cinfo.restart_interval = dri;
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < h) {
        JSAMPROW row = raw + 12 + (size_t) cinfo.next_scanline * w * nc;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    fwrite(out, 1, outlen, stdout);
    jpeg_destroy_compress(&cinfo);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 2 && strcmp(argv[1], "decode") == 0) return do_decode();
    if (argc >= 2 && strcmp(argv[1], "encode") == 0) return do_encode(argc, argv);
    fprintf(stderr, "usage: jpegref encode|decode ...\n");
    return 2;
}
