/* GSL stub (baseline harness): vectors + tridiagonal solve (Thomas). */
#ifndef GSL_STUB_LINALG_H
#define GSL_STUB_LINALG_H

#include <stddef.h>

typedef struct {
  size_t size;
  double *data;
} gsl_vector;

gsl_vector *gsl_vector_alloc(size_t n);
void gsl_vector_free(gsl_vector *v);
double gsl_vector_get(const gsl_vector *v, size_t i);
void gsl_vector_set(gsl_vector *v, size_t i, double x);

/* diag (n), offdiag (n-1), rhs (n) -> x (n); symmetric tridiagonal */
int gsl_linalg_solve_tridiag(const gsl_vector *diag, const gsl_vector *e,
                             const gsl_vector *f, const gsl_vector *b,
                             gsl_vector *x);

#endif
