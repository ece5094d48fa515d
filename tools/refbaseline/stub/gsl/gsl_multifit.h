/* GSL stub (baseline harness): multifit is referenced only by the dead
 * shearinterp_poly path (shtpoissonsolve.c:681 "DO NOT USE THIS"); abort
 * stubs. Matrix type is minimal-real so alloc/set in dead code still link. */
#ifndef GSL_STUB_MULTIFIT_H
#define GSL_STUB_MULTIFIT_H

#include <stddef.h>

#include "gsl_linalg.h"

typedef struct {
  size_t size1, size2;
  double *data;
} gsl_matrix;

gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2);
void gsl_matrix_free(gsl_matrix *m);
void gsl_matrix_set(gsl_matrix *m, size_t i, size_t j, double x);

typedef struct {
  int dummy;
} gsl_multifit_linear_workspace;

gsl_multifit_linear_workspace *gsl_multifit_linear_alloc(size_t n, size_t p);
void gsl_multifit_linear_free(gsl_multifit_linear_workspace *w);
int gsl_multifit_linear(const gsl_matrix *X, const gsl_vector *y,
                        gsl_vector *c, gsl_matrix *cov, double *chisq,
                        gsl_multifit_linear_workspace *work);
int gsl_multifit_linear_est(const gsl_vector *x, const gsl_vector *c,
                            const gsl_matrix *cov, double *y, double *y_err);

#endif
