/* GSL stub (baseline harness): long sorts. */
#ifndef GSL_STUB_SORT_LONG_H
#define GSL_STUB_SORT_LONG_H

#include <stddef.h>

void gsl_sort_long(long *data, size_t stride, size_t n);
void gsl_sort_long_index(size_t *p, const long *data, size_t stride,
                         size_t n);

#endif
