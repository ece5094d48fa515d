/* GSL stub (baseline harness): natural cubic spline + accel. */
#ifndef GSL_STUB_SPLINE_H
#define GSL_STUB_SPLINE_H

#include <stddef.h>

typedef struct {
  size_t hint;
} gsl_interp_accel;

typedef struct {
  int kind;
} gsl_interp_type;

extern const gsl_interp_type *gsl_interp_cspline;
extern const gsl_interp_type *gsl_interp_linear;

typedef struct {
  size_t n;
  double *x;
  double *y;
  double *c; /* second derivatives */
} gsl_spline;

gsl_interp_accel *gsl_interp_accel_alloc(void);
void gsl_interp_accel_free(gsl_interp_accel *a);
gsl_spline *gsl_spline_alloc(const gsl_interp_type *t, size_t n);
int gsl_spline_init(gsl_spline *s, const double *x, const double *y,
                    size_t n);
double gsl_spline_eval(const gsl_spline *s, double x, gsl_interp_accel *a);
void gsl_spline_free(gsl_spline *s);

#endif
