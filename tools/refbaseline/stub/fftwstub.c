/* Real single-precision 1-D r2c/c2r FFT for the baseline build.
 *
 * Iterative radix-2 for power-of-two lengths, Bluestein (chirp-z via a
 * power-of-two convolution) otherwise; internals in double.  Unnormalized,
 * matching FFTW semantics.  Ring lengths in the SHT are 4..4*Nside, so
 * Bluestein is the common path; it is within a small constant of FFTW and
 * the ring-FFT share of the reference SHT is minor next to the Legendre
 * sums (O(n log n) vs O(lmax^2) per ring).
 */
#include "fftw3-mpi.h"

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define DIEF(msg)                                                  \
  do {                                                             \
    fprintf(stderr, "fftwstub: %s\n", msg);                        \
    exit(98);                                                      \
  } while (0)

struct fftwf_plan_s {
  int n;
  int dir; /* +1 r2c, -1 c2r */
  float *rbuf;
  fftwf_complex *cbuf;
};
struct fftw_plan_s {
  int dummy;
};

/* ---- complex FFT, double, in-place, n = power of two ---- */
static void fft_pow2(double *re, double *im, int n, int inverse) {
  /* bit reversal */
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      double t = re[i]; re[i] = re[j]; re[j] = t;
      t = im[i]; im[i] = im[j]; im[j] = t;
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    double ang = 2.0 * M_PI / len * (inverse ? 1.0 : -1.0);
    double wr = cos(ang), wi = sin(ang);
    for (int i = 0; i < n; i += len) {
      double cwr = 1.0, cwi = 0.0;
      for (int k = 0; k < len / 2; ++k) {
        int a = i + k, b = i + k + len / 2;
        double ur = re[a], ui = im[a];
        double vr = re[b] * cwr - im[b] * cwi;
        double vi = re[b] * cwi + im[b] * cwr;
        re[a] = ur + vr; im[a] = ui + vi;
        re[b] = ur - vr; im[b] = ui - vi;
        double nwr = cwr * wr - cwi * wi;
        cwi = cwr * wi + cwi * wr;
        cwr = nwr;
      }
    }
  }
}

/* ---- arbitrary-n complex DFT via Bluestein ---- */
static void dft_any(double *re, double *im, int n, int inverse) {
  if ((n & (n - 1)) == 0) {
    fft_pow2(re, im, n, inverse);
    return;
  }
  int m = 1;
  while (m < 2 * n - 1) m <<= 1;
  double *ar = calloc((size_t)m, sizeof(double));
  double *ai = calloc((size_t)m, sizeof(double));
  double *br = calloc((size_t)m, sizeof(double));
  double *bi = calloc((size_t)m, sizeof(double));
  double *cr = malloc((size_t)n * sizeof(double));
  double *ci = malloc((size_t)n * sizeof(double));
  if (!ar || !ai || !br || !bi || !cr || !ci) DIEF("oom");
  double sgn = inverse ? 1.0 : -1.0;
  for (int j = 0; j < n; ++j) {
    /* angle = pi*j^2/n mod 2pi, computed with exact integer reduction */
    long long jj = (long long)j * j % (2LL * n);
    double ang = sgn * M_PI * (double)jj / (double)n;
    cr[j] = cos(ang);
    ci[j] = sin(ang);
    ar[j] = re[j] * cr[j] - im[j] * ci[j];
    ai[j] = re[j] * ci[j] + im[j] * cr[j];
    br[j] = cr[j];
    bi[j] = -ci[j];
    if (j > 0) {
      br[m - j] = cr[j];
      bi[m - j] = -ci[j];
    }
  }
  fft_pow2(ar, ai, m, 0);
  fft_pow2(br, bi, m, 0);
  for (int j = 0; j < m; ++j) {
    double tr = ar[j] * br[j] - ai[j] * bi[j];
    ai[j] = ar[j] * bi[j] + ai[j] * br[j];
    ar[j] = tr;
  }
  fft_pow2(ar, ai, m, 1);
  double invm = 1.0 / (double)m;
  for (int j = 0; j < n; ++j) {
    double tr = ar[j] * invm, ti = ai[j] * invm;
    re[j] = tr * cr[j] - ti * ci[j];
    im[j] = tr * ci[j] + ti * cr[j];
  }
  free(ar); free(ai); free(br); free(bi); free(cr); free(ci);
}

fftwf_plan fftwf_plan_dft_r2c_1d(int n, float *in, fftwf_complex *out,
                                 unsigned flags) {
  (void)flags;
  struct fftwf_plan_s *p = malloc(sizeof(*p));
  if (!p) DIEF("oom plan");
  p->n = n;
  p->dir = +1;
  p->rbuf = in;
  p->cbuf = out;
  return p;
}
fftwf_plan fftwf_plan_dft_c2r_1d(int n, fftwf_complex *in, float *out,
                                 unsigned flags) {
  (void)flags;
  struct fftwf_plan_s *p = malloc(sizeof(*p));
  if (!p) DIEF("oom plan");
  p->n = n;
  p->dir = -1;
  p->rbuf = out;
  p->cbuf = in;
  return p;
}

void fftwf_execute(const fftwf_plan p) {
  int n = p->n;
  double *re = malloc((size_t)n * sizeof(double));
  double *im = malloc((size_t)n * sizeof(double));
  if (!re || !im) DIEF("oom exec");
  if (p->dir > 0) { /* r2c forward */
    for (int j = 0; j < n; ++j) {
      re[j] = p->rbuf[j];
      im[j] = 0.0;
    }
    dft_any(re, im, n, 0);
    for (int k = 0; k <= n / 2; ++k) {
      p->cbuf[k][0] = (float)re[k];
      p->cbuf[k][1] = (float)im[k];
    }
  } else { /* c2r inverse (unnormalized), Hermitian input of n/2+1 */
    for (int k = 0; k <= n / 2; ++k) {
      re[k] = p->cbuf[k][0];
      im[k] = p->cbuf[k][1];
    }
    for (int k = n / 2 + 1; k < n; ++k) {
      re[k] = re[n - k];
      im[k] = -im[n - k];
    }
    dft_any(re, im, n, 1);
    for (int j = 0; j < n; ++j) p->rbuf[j] = (float)re[j];
  }
  free(re);
  free(im);
}

void fftwf_destroy_plan(fftwf_plan p) { free(p); }
void *fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void *p) { free(p); }
float *fftwf_alloc_real(size_t n) { return malloc(n * sizeof(float)); }
void fftwf_cleanup(void) {}

void *fftw_malloc(size_t n) { return malloc(n); }
void fftw_free(void *p) { free(p); }
double *fftw_alloc_real(size_t n) { return malloc(n * sizeof(double)); }
void fftw_destroy_plan(fftw_plan p) { (void)p; }
void fftw_cleanup(void) {}

/* ---- fftw3-mpi: THREEDPOT only, not exercised ---- */
void fftw_mpi_init(void) {}
void fftwf_mpi_init(void) {}
void fftw_mpi_cleanup(void) {}
void fftwf_mpi_cleanup(void) {}
long fftw_mpi_local_size_3d(long n0, long n1, long n2, MPI_Comm comm,
                            long *local_n0, long *local_0_start) {
  (void)comm;
  *local_n0 = n0;
  *local_0_start = 0;
  return n0 * n1 * n2;
}
long fftwf_mpi_local_size_3d(long n0, long n1, long n2, MPI_Comm comm,
                             long *local_n0, long *local_0_start) {
  return fftw_mpi_local_size_3d(n0, n1, n2, comm, local_n0, local_0_start);
}
fftw_plan fftw_mpi_plan_dft_r2c_3d(long n0, long n1, long n2, double *in,
                                   fftw_complex *out, MPI_Comm comm,
                                   unsigned flags) {
  (void)n0; (void)n1; (void)n2; (void)in; (void)out; (void)comm; (void)flags;
  DIEF("3-D MPI FFT not available in baseline stub");
}
fftw_plan fftw_mpi_plan_dft_c2r_3d(long n0, long n1, long n2,
                                   fftw_complex *in, double *out,
                                   MPI_Comm comm, unsigned flags) {
  (void)n0; (void)n1; (void)n2; (void)in; (void)out; (void)comm; (void)flags;
  DIEF("3-D MPI FFT not available in baseline stub");
}
fftwf_plan fftwf_mpi_plan_dft_r2c_3d(long n0, long n1, long n2, float *in,
                                     fftwf_complex *out, MPI_Comm comm,
                                     unsigned flags) {
  (void)n0; (void)n1; (void)n2; (void)in; (void)out; (void)comm; (void)flags;
  DIEF("3-D MPI FFT not available in baseline stub");
}
fftwf_plan fftwf_mpi_plan_dft_c2r_3d(long n0, long n1, long n2,
                                     fftwf_complex *in, float *out,
                                     MPI_Comm comm, unsigned flags) {
  (void)n0; (void)n1; (void)n2; (void)in; (void)out; (void)comm; (void)flags;
  DIEF("3-D MPI FFT not available in baseline stub");
}
void fftw_execute(const fftw_plan p) {
  (void)p;
  DIEF("double-precision execute not available in baseline stub");
}
