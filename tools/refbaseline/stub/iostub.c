/* Abort-stub implementations of the FITS/HDF5 functions the baseline runs
 * never reach (binary ray output, pixLC planes, no gals, no map planes). */
#include <stdio.h>
#include <stdlib.h>

#include "fitsio.h"
#include "hdf5.h"
#include "hdf5_hl.h"

#define DIEIO(name)                                                      \
  do {                                                                   \
    fprintf(stderr, "iostub: %s called — baseline build has no FITS/"    \
                    "HDF5; use binary rayout + pixLC planes\n", name);   \
    exit(96);                                                            \
  } while (0)

int fits_open_file(fitsfile **fptr, const char *filename, int iomode,
                   int *status) {
  (void)fptr; (void)filename; (void)iomode; (void)status;
  DIEIO("fits_open_file");
}
int fits_create_file(fitsfile **fptr, const char *filename, int *status) {
  (void)fptr; (void)filename; (void)status;
  DIEIO("fits_create_file");
}
int fits_close_file(fitsfile *fptr, int *status) {
  (void)fptr; (void)status;
  DIEIO("fits_close_file");
}
int fits_create_img(fitsfile *fptr, int bitpix, int naxis, long *naxes,
                    int *status) {
  (void)fptr; (void)bitpix; (void)naxis; (void)naxes; (void)status;
  DIEIO("fits_create_img");
}
int fits_create_tbl(fitsfile *fptr, int tbltype, LONGLONG naxis2, int tfields,
                    char **ttype, char **tform, char **tunit,
                    const char *extname, int *status) {
  (void)fptr; (void)tbltype; (void)naxis2; (void)tfields; (void)ttype;
  (void)tform; (void)tunit; (void)extname; (void)status;
  DIEIO("fits_create_tbl");
}
int fits_movabs_hdu(fitsfile *fptr, int hdunum, int *hdutype, int *status) {
  (void)fptr; (void)hdunum; (void)hdutype; (void)status;
  DIEIO("fits_movabs_hdu");
}
int fits_get_colnum(fitsfile *fptr, int casesen, char *templt, int *colnum,
                    int *status) {
  (void)fptr; (void)casesen; (void)templt; (void)colnum; (void)status;
  DIEIO("fits_get_colnum");
}
int fits_get_coltype(fitsfile *fptr, int colnum, int *typecode, long *repeat,
                     long *width, int *status) {
  (void)fptr; (void)colnum; (void)typecode; (void)repeat; (void)width;
  (void)status;
  DIEIO("fits_get_coltype");
}
int fits_get_num_rows(fitsfile *fptr, long *nrows, int *status) {
  (void)fptr; (void)nrows; (void)status;
  DIEIO("fits_get_num_rows");
}
int fits_get_rowsize(fitsfile *fptr, long *nrows, int *status) {
  (void)fptr; (void)nrows; (void)status;
  DIEIO("fits_get_rowsize");
}
int fits_read_col(fitsfile *fptr, int datatype, int colnum, LONGLONG firstrow,
                  LONGLONG firstelem, LONGLONG nelem, void *nulval,
                  void *array, int *anynul, int *status) {
  (void)fptr; (void)datatype; (void)colnum; (void)firstrow; (void)firstelem;
  (void)nelem; (void)nulval; (void)array; (void)anynul; (void)status;
  DIEIO("fits_read_col");
}
int fits_write_col(fitsfile *fptr, int datatype, int colnum, LONGLONG firstrow,
                   LONGLONG firstelem, LONGLONG nelem, void *array,
                   int *status) {
  (void)fptr; (void)datatype; (void)colnum; (void)firstrow; (void)firstelem;
  (void)nelem; (void)array; (void)status;
  DIEIO("fits_write_col");
}
int fits_write_pix(fitsfile *fptr, int datatype, long *firstpix,
                   LONGLONG nelem, void *array, int *status) {
  (void)fptr; (void)datatype; (void)firstpix; (void)nelem; (void)array;
  (void)status;
  DIEIO("fits_write_pix");
}
int fits_write_key(fitsfile *fptr, int datatype, const char *keyname,
                   void *value, const char *comment, int *status) {
  (void)fptr; (void)datatype; (void)keyname; (void)value; (void)comment;
  (void)status;
  DIEIO("fits_write_key");
}
int fits_write_comment(fitsfile *fptr, const char *comment, int *status) {
  (void)fptr; (void)comment; (void)status;
  DIEIO("fits_write_comment");
}
int fits_write_date(fitsfile *fptr, int *status) {
  (void)fptr; (void)status;
  DIEIO("fits_write_date");
}
void fits_report_error(FILE *stream, int status) {
  fprintf(stream, "iostub: fits error, status=%d\n", status);
}

hid_t hdf5_stub_native_long(void) { return 1; }
hid_t H5Fopen(const char *filename, unsigned flags, hid_t fapl_id) {
  (void)filename; (void)flags; (void)fapl_id;
  DIEIO("H5Fopen");
}
herr_t H5Fclose(hid_t file_id) {
  (void)file_id;
  DIEIO("H5Fclose");
}
herr_t H5LTread_dataset(hid_t loc_id, const char *dset_name, hid_t type_id,
                        void *buffer) {
  (void)loc_id; (void)dset_name; (void)type_id; (void)buffer;
  DIEIO("H5LTread_dataset");
}
herr_t H5TBread_fields_name(hid_t loc_id, const char *table_name,
                            const char *field_names, hsize_t start,
                            hsize_t nrecords, size_t type_size,
                            const size_t *field_offset,
                            const size_t *field_sizes, void *data) {
  (void)loc_id; (void)table_name; (void)field_names; (void)start;
  (void)nrecords; (void)type_size; (void)field_offset; (void)field_sizes;
  (void)data;
  DIEIO("H5TBread_fields_name");
}
