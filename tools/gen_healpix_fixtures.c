/* Golden-fixture generator: links the reference's (GPL Healpix_cxx derived)
 * healpix_utils.c and dumps index-conversion / geometry / interpolation test
 * vectors as plain binary, so the numpy/JAX reimplementation in
 * calclens_tpu/healpix can be validated bit-for-bit against the reference
 * behavior without copying its code.
 *
 * Build (from repo root):
 *   gcc -O2 -I tools/stubinc -I /root/reference tools/gen_healpix_fixtures.c \
 *       /root/reference/healpix_utils.c -lm -o tools/gen_healpix_fixtures
 * Run: tools/gen_healpix_fixtures tests/fixtures
 */
#include <stdio.h>
#include <stdlib.h>
#include <math.h>
#include <string.h>
#include "healpix_utils.h"

static unsigned long long rngstate = 88172645463325252ULL;
static double frand(void) { /* xorshift64 */
  rngstate ^= rngstate << 13; rngstate ^= rngstate >> 7; rngstate ^= rngstate << 17;
  return (double)(rngstate >> 11) / 9007199254740992.0;
}

int main(int argc, char **argv) {
  const char *dir = argc > 1 ? argv[1] : "tests/fixtures";
  char path[1024];
  long orders[3] = {2, 5, 9};
  int no, i;
  const int N = 4096;

  for (no = 0; no < 3; ++no) {
    long order = orders[no];
    long npix = order2npix(order);
    FILE *fp;
    snprintf(path, sizeof path, "%s/healpix_golden_order%ld.bin", dir, order);
    fp = fopen(path, "wb");
    if (!fp) { perror("fopen"); return 1; }

    /* header: order, N */
    long hdr[2] = {order, N};
    fwrite(hdr, sizeof(long), 2, fp);

    /* random pixel sample (and the first/last few) */
    long *pix = malloc(sizeof(long) * N);
    for (i = 0; i < N; ++i) {
      if (i < 32) pix[i] = i % npix;
      else if (i < 64) pix[i] = npix - 1 - (i - 32) % npix;
      else pix[i] = (long)(frand() * npix);
      if (pix[i] >= npix) pix[i] = npix - 1;
    }
    fwrite(pix, sizeof(long), N, fp);

    /* nest2ring, ring2nest, nest2peano, peano2nest */
    for (i = 0; i < N; ++i) { long v = nest2ring(pix[i], order); fwrite(&v, sizeof(long), 1, fp); }
    for (i = 0; i < N; ++i) { long v = ring2nest(pix[i], order); fwrite(&v, sizeof(long), 1, fp); }
    for (i = 0; i < N; ++i) { long v = nest2peano(pix[i], order); fwrite(&v, sizeof(long), 1, fp); }
    for (i = 0; i < N; ++i) { long v = peano2nest(pix[i], order); fwrite(&v, sizeof(long), 1, fp); }

    /* ring2ang */
    for (i = 0; i < N; ++i) {
      double t, p; ring2ang(pix[i], &t, &p, order);
      fwrite(&t, sizeof(double), 1, fp); fwrite(&p, sizeof(double), 1, fp);
    }

    /* random angles: ang2ring, ang2nest, get_interpol */
    double *ang = malloc(sizeof(double) * 2 * N);
    for (i = 0; i < N; ++i) {
      double ct = 2.0 * frand() - 1.0;
      ang[2 * i] = acos(ct);
      ang[2 * i + 1] = 2.0 * M_PI * frand();
    }
    fwrite(ang, sizeof(double), 2 * N, fp);
    for (i = 0; i < N; ++i) { long v = ang2ring(ang[2*i], ang[2*i+1], order); fwrite(&v, sizeof(long), 1, fp); }
    for (i = 0; i < N; ++i) { long v = ang2nest(ang[2*i], ang[2*i+1], order); fwrite(&v, sizeof(long), 1, fp); }
    for (i = 0; i < N; ++i) {
      long p4[4]; double w4[4];
      get_interpol(ang[2*i], ang[2*i+1], p4, w4, order);
      fwrite(p4, sizeof(long), 4, fp);
      fwrite(w4, sizeof(double), 4, fp);
    }

    /* ring info for all rings */
    {
      long nring = 4 * (1L << order) - 1, ring;
      for (ring = 1; ring <= nring; ++ring) {
        long startpix, ringpix, shifted; double costheta, sintheta;
        get_ring_info2(ring, &startpix, &ringpix, &costheta, &sintheta, &shifted, order);
        fwrite(&startpix, sizeof(long), 1, fp);
        fwrite(&ringpix, sizeof(long), 1, fp);
        fwrite(&costheta, sizeof(double), 1, fp);
        fwrite(&sintheta, sizeof(double), 1, fp);
        fwrite(&shifted, sizeof(long), 1, fp);
      }
    }

    free(pix); free(ang);
    fclose(fp);
    fprintf(stderr, "wrote %s\n", path);
  }
  return 0;
}
