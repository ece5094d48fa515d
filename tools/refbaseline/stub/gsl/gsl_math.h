/* GSL stub (baseline harness): math basics. */
#ifndef GSL_STUB_MATH_H
#define GSL_STUB_MATH_H

#include <math.h>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

#define GSL_MAX(a, b) ((a) > (b) ? (a) : (b))
#define GSL_MIN(a, b) ((a) < (b) ? (a) : (b))

typedef struct {
  double (*function)(double x, void *params);
  void *params;
} gsl_function;

int gsl_finite(double x);

#endif
