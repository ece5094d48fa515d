#!/bin/bash
# Build the reference CALCLENS ray tracer (/root/reference, read-only) as a
# single-rank CPU baseline binary, using the stub headers/libs in stub/
# (no MPI/GSL/FFTW/HDF5/CFITSIO dev packages exist in this image).
#
# Flags: the reference Makefile's defaults (Makefile:5-7,26) minus FITS ray
# output (binary rayout instead; rayio.c:828 file_write_rays2bin):
#   SHTONLY USE_FULLSKY_PARTDIST NGPSHTDENS
# Runs use LensPlaneType=pixLC so the HDF5 reader is never invoked.
set -e
cd "$(dirname "$0")"
REF=/root/reference
BUILD=build
mkdir -p $BUILD

OPTS="-DSHTONLY -DUSE_FULLSKY_PARTDIST -DNGPSHTDENS"
CFLAGS="-O3 -march=native -std=gnu99 -include limits.h -I stub -I $REF $OPTS -Wno-unused-variable -Wno-unused-but-set-variable -Wno-format"

SRCS="raytrace raytrace_utils healpix_utils config profile globalvars cosmocalc \
healpix_fastdiscquery read_lensplanes_hdf5 rayio partio rayprop galsio restart \
rot_paratrans nnbrs_healpixtree healpix_plmgen healpix_shtrans shtpoissonsolve \
map_shuffle alm2map_transpose_mpi partsmoothdens gridsearch loadbalance \
alm2allmaps_transpose_mpi map2alm_transpose_mpi mgpoissonsolve \
mgpoissonsolve_utils poissondrivers fftpoissonsolve inthash ioutils lgadgetio \
fftpoissondriver gridcellhash read_lensplanes_pixLC \
propagate_to_cmb_from_restart maputils main"

PIDS=()
for s in $SRCS; do
  gcc $CFLAGS -c $REF/$s.c -o $BUILD/$s.o &
  PIDS+=($!)
done
for s in mpistub fftwstub gslstub iostub; do
  gcc $CFLAGS -c stub/$s.c -o $BUILD/$s.o &
  PIDS+=($!)
done
FAIL=0
for p in "${PIDS[@]}"; do wait "$p" || FAIL=1; done
[ $FAIL -eq 0 ] || { echo "compile failed"; exit 1; }

gcc $CFLAGS -o $BUILD/raytrace $BUILD/*.o -lm
echo "built $BUILD/raytrace"
