/* CFITSIO stub for the baseline build.  The baseline runs use binary ray
 * output (USE_FITS_RAYOUT off), no galaxy catalog, and no map planes, so no
 * fits_* call is ever reached; every function aborts if called.  Prototypes
 * mirror cfitsio's (fits_x are macros onto ff* there; plain functions here).
 */
#ifndef FITSIO_STUB_H
#define FITSIO_STUB_H

#include <stdio.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
  int dummy;
} fitsfile;

typedef long long LONGLONG;

#define TSTRING 16
#define TLONG 41
#define TLONGLONG 81
#define TFLOAT 42
#define TDOUBLE 82
#define TINT 31
#define BINARY_TBL 2
#define IMAGE_HDU 0
#define CASEINSEN 0
#define CASESEN 1
#define SHORT_IMG 16
#define LONG_IMG 32
#define FLOAT_IMG (-32)
#define DOUBLE_IMG (-64)
#define READONLY 0
#define READWRITE 1

int fits_open_file(fitsfile **fptr, const char *filename, int iomode,
                   int *status);
int fits_create_file(fitsfile **fptr, const char *filename, int *status);
int fits_close_file(fitsfile *fptr, int *status);
int fits_create_img(fitsfile *fptr, int bitpix, int naxis, long *naxes,
                    int *status);
int fits_create_tbl(fitsfile *fptr, int tbltype, LONGLONG naxis2, int tfields,
                    char **ttype, char **tform, char **tunit,
                    const char *extname, int *status);
int fits_movabs_hdu(fitsfile *fptr, int hdunum, int *hdutype, int *status);
int fits_get_colnum(fitsfile *fptr, int casesen, char *templt, int *colnum,
                    int *status);
int fits_get_coltype(fitsfile *fptr, int colnum, int *typecode, long *repeat,
                     long *width, int *status);
int fits_get_num_rows(fitsfile *fptr, long *nrows, int *status);
int fits_get_rowsize(fitsfile *fptr, long *nrows, int *status);
int fits_read_col(fitsfile *fptr, int datatype, int colnum, LONGLONG firstrow,
                  LONGLONG firstelem, LONGLONG nelem, void *nulval,
                  void *array, int *anynul, int *status);
int fits_write_col(fitsfile *fptr, int datatype, int colnum, LONGLONG firstrow,
                   LONGLONG firstelem, LONGLONG nelem, void *array,
                   int *status);
int fits_write_pix(fitsfile *fptr, int datatype, long *firstpix,
                   LONGLONG nelem, void *array, int *status);
int fits_write_key(fitsfile *fptr, int datatype, const char *keyname,
                   void *value, const char *comment, int *status);
int fits_write_comment(fitsfile *fptr, const char *comment, int *status);
int fits_write_date(fitsfile *fptr, int *status);
void fits_report_error(FILE *stream, int status);

#ifdef __cplusplus
}
#endif
#endif
