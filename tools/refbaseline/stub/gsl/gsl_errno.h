/* GSL stub (baseline harness): error codes. */
#ifndef GSL_STUB_ERRNO_H
#define GSL_STUB_ERRNO_H

#define GSL_SUCCESS 0
#define GSL_FAILURE (-1)

#endif
