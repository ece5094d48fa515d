/* fftw3-mpi stub: types/prototypes so fftpoissonsolve.c compiles; the 3-D
 * MPI FFT path (THREEDPOT) is not exercised by the baseline runs, so the
 * implementations abort if called. */
#ifndef FFTW3_MPI_STUB_H
#define FFTW3_MPI_STUB_H

#include <mpi.h>

#include "fftw3.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef long ptrdiff_t_fftw;

void fftw_mpi_init(void);
void fftwf_mpi_init(void);
void fftw_mpi_cleanup(void);
void fftwf_mpi_cleanup(void);

long fftw_mpi_local_size_3d(long n0, long n1, long n2, MPI_Comm comm,
                            long *local_n0, long *local_0_start);
long fftwf_mpi_local_size_3d(long n0, long n1, long n2, MPI_Comm comm,
                             long *local_n0, long *local_0_start);

fftw_plan fftw_mpi_plan_dft_r2c_3d(long n0, long n1, long n2, double *in,
                                   fftw_complex *out, MPI_Comm comm,
                                   unsigned flags);
fftw_plan fftw_mpi_plan_dft_c2r_3d(long n0, long n1, long n2,
                                   fftw_complex *in, double *out,
                                   MPI_Comm comm, unsigned flags);
fftwf_plan fftwf_mpi_plan_dft_r2c_3d(long n0, long n1, long n2, float *in,
                                     fftwf_complex *out, MPI_Comm comm,
                                     unsigned flags);
fftwf_plan fftwf_mpi_plan_dft_c2r_3d(long n0, long n1, long n2,
                                     fftwf_complex *in, float *out,
                                     MPI_Comm comm, unsigned flags);
void fftw_execute(const fftw_plan plan);

#ifdef __cplusplus
}
#endif
#endif
