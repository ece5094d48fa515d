/* GSL stub (baseline harness): heapsort -> qsort. */
#ifndef GSL_STUB_HEAPSORT_H
#define GSL_STUB_HEAPSORT_H

#include <stddef.h>

int gsl_heapsort(void *array, size_t count, size_t size,
                 int (*compar)(const void *, const void *));

#endif
