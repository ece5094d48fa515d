/* Minimal FFTW3 API stub for the reference-baseline build: real
 * implementations of the single-precision 1-D r2c/c2r transforms the SHT ring
 * stage uses (healpix_shtrans.c:168-205,549-571), abort stubs for the rest.
 * Semantics match FFTW: unnormalized transforms, r2c emits n/2+1 complex.
 */
#ifndef FFTW3_STUB_H
#define FFTW3_STUB_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef float fftwf_complex[2];
typedef double fftw_complex[2];

typedef struct fftwf_plan_s *fftwf_plan;
typedef struct fftw_plan_s *fftw_plan;

#define FFTW_ESTIMATE (1U << 6)
#define FFTW_MEASURE 0U

fftwf_plan fftwf_plan_dft_r2c_1d(int n, float *in, fftwf_complex *out,
                                 unsigned flags);
fftwf_plan fftwf_plan_dft_c2r_1d(int n, fftwf_complex *in, float *out,
                                 unsigned flags);
void fftwf_execute(const fftwf_plan plan);
void fftwf_destroy_plan(fftwf_plan plan);
void *fftwf_malloc(size_t n);
void fftwf_free(void *p);
float *fftwf_alloc_real(size_t n);
void fftwf_cleanup(void);

/* double-precision API: referenced under DOUBLEFFTW only; abort stubs */
void *fftw_malloc(size_t n);
void fftw_free(void *p);
double *fftw_alloc_real(size_t n);
void fftw_destroy_plan(fftw_plan plan);
void fftw_cleanup(void);

#ifdef __cplusplus
}
#endif
#endif
