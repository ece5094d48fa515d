/* HDF5 stub for the baseline build: the runs use LensPlaneType=pixLC (plain
 * binary), so read_lensplanes_hdf5.c compiles against these types but its
 * H5 calls are never reached; all abort if called. */
#ifndef HDF5_STUB_H
#define HDF5_STUB_H

#include <stddef.h> /* offsetof for HOFFSET */

#ifdef __cplusplus
extern "C" {
#endif

typedef long long hid_t;
typedef int herr_t;
typedef unsigned long long hsize_t;

#define HOFFSET(S, M) (offsetof(S, M))

#define H5F_ACC_RDONLY 0u
#define H5F_ACC_TRUNC 2u
#define H5P_DEFAULT 0
#define H5T_NATIVE_LONG hdf5_stub_native_long()

hid_t hdf5_stub_native_long(void);
hid_t H5Fopen(const char *filename, unsigned flags, hid_t fapl_id);
herr_t H5Fclose(hid_t file_id);

#ifdef __cplusplus
}
#endif
#endif
