/* HDF5 high-level stub (see hdf5.h). */
#ifndef HDF5_HL_STUB_H
#define HDF5_HL_STUB_H

#include "hdf5.h"

#ifdef __cplusplus
extern "C" {
#endif

herr_t H5LTread_dataset(hid_t loc_id, const char *dset_name, hid_t type_id,
                        void *buffer);
herr_t H5TBread_fields_name(hid_t loc_id, const char *table_name,
                            const char *field_names, hsize_t start,
                            hsize_t nrecords, size_t type_size,
                            const size_t *field_offset,
                            const size_t *field_sizes, void *data);

#ifdef __cplusplus
}
#endif
#endif
