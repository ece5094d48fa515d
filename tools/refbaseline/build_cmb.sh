#!/bin/bash
# Build the reference binary's CMB-propagation variant for NUMERICAL parity
# testing at test scale (tests/test_legacy_restart.py).
#
# The reference hard-codes its CMB lens map at order 12
# (propagate_to_cmb_from_restart.c:208) and lower_nest() asserts
# rayOrder > map_order (healpix_utils.c:261), so the real binary's CMB mode
# cannot run on any restart small enough for a 1-core test.  This build
# lowers ONLY that constant (and turns off the cfitsio map write, which the
# stub cfitsio would abort on AFTER the restart_rays_at_cmb.0 we compare
# against is already written) via sed into the build dir; /root/reference
# itself is never touched.  Everything else links the same objects as
# build.sh.
set -e
cd "$(dirname "$0")"
ORDER=${CMB_MAP_ORDER:-3}
REF=/root/reference
BUILD=build
[ -f $BUILD/main.o ] || bash build.sh

sed -e "s/const long map_order    = 12;/const long map_order    = ${ORDER};/" \
    -e "s/write_fits_maps_for_rays_at_cmb     = true/write_fits_maps_for_rays_at_cmb     = false/" \
  $REF/propagate_to_cmb_from_restart.c > $BUILD/propagate_cmb_patched.c
grep -q "map_order    = ${ORDER};" $BUILD/propagate_cmb_patched.c

OPTS="-DSHTONLY -DUSE_FULLSKY_PARTDIST -DNGPSHTDENS"
CFLAGS="-O3 -march=native -std=gnu99 -include limits.h -I stub -I $REF $OPTS -Wno-unused-variable -Wno-unused-but-set-variable -Wno-format"

gcc $CFLAGS -c $BUILD/propagate_cmb_patched.c -o $BUILD/propagate_cmb_patched.o
OBJS=$(ls $BUILD/*.o | grep -v propagate_to_cmb_from_restart.o)
gcc $CFLAGS -o $BUILD/raytrace_cmb $OBJS -lm
echo "built $BUILD/raytrace_cmb (CMB map order ${ORDER})"
