/* GSL stub implementations for the baseline harness. */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "gsl/gsl_heapsort.h"
#include "gsl/gsl_ieee_utils.h"
#include "gsl/gsl_integration.h"
#include "gsl/gsl_linalg.h"
#include "gsl/gsl_math.h"
#include "gsl/gsl_multifit.h"
#include "gsl/gsl_rng.h"
#include "gsl/gsl_sf_hyperg.h"
#include "gsl/gsl_sf_trig.h"
#include "gsl/gsl_sort_long.h"
#include "gsl/gsl_spline.h"

#define DIEG(msg)                                                  \
  do {                                                             \
    fprintf(stderr, "gslstub: %s\n", msg);                         \
    exit(97);                                                      \
  } while (0)

int gsl_finite(double x) { return isfinite(x); }
void gsl_ieee_env_setup(void) {}
double gsl_sf_sinc(double x) {
  double px = M_PI * x;
  return (fabs(px) < 1e-12) ? 1.0 : sin(px) / px;
}

/* ---- integration: adaptive Simpson ---- */
gsl_integration_workspace *gsl_integration_workspace_alloc(size_t n) {
  gsl_integration_workspace *w = malloc(sizeof(*w));
  w->limit = n;
  return w;
}
void gsl_integration_workspace_free(gsl_integration_workspace *w) { free(w); }

static double simpson(const gsl_function *f, double a, double m, double b,
                      double fa, double fm, double fb, double whole,
                      double eps, int depth) {
  double lm = 0.5 * (a + m), rm = 0.5 * (m + b);
  double flm = f->function(lm, f->params), frm = f->function(rm, f->params);
  double left = (m - a) / 6.0 * (fa + 4.0 * flm + fm);
  double right = (b - m) / 6.0 * (fm + 4.0 * frm + fb);
  double delta = left + right - whole;
  if (depth <= 0 || fabs(delta) <= 15.0 * eps)
    return left + right + delta / 15.0;
  return simpson(f, a, lm, m, fa, flm, fm, left, 0.5 * eps, depth - 1) +
         simpson(f, m, rm, b, fm, frm, fb, right, 0.5 * eps, depth - 1);
}

int gsl_integration_qag(const gsl_function *f, double a, double b,
                        double epsabs, double epsrel, size_t limit, int key,
                        gsl_integration_workspace *workspace, double *result,
                        double *abserr) {
  (void)limit;
  (void)key;
  (void)workspace;
  double fa = f->function(a, f->params);
  double fb = f->function(b, f->params);
  double m = 0.5 * (a + b);
  double fm = f->function(m, f->params);
  double whole = (b - a) / 6.0 * (fa + 4.0 * fm + fb);
  double eps = epsabs > 0 ? epsabs : 1e-12;
  if (epsrel > 0 && fabs(whole) * epsrel > eps) eps = fabs(whole) * epsrel;
  *result = simpson(f, a, m, b, fa, fm, fb, whole, eps, 48);
  *abserr = eps;
  return 0;
}

/* ---- natural cubic spline ---- */
static const gsl_interp_type cspline_type = {0};
static const gsl_interp_type linear_type = {1};
const gsl_interp_type *gsl_interp_cspline = &cspline_type;
const gsl_interp_type *gsl_interp_linear = &linear_type;

gsl_interp_accel *gsl_interp_accel_alloc(void) {
  gsl_interp_accel *a = malloc(sizeof(*a));
  a->hint = 0;
  return a;
}
void gsl_interp_accel_free(gsl_interp_accel *a) { free(a); }

gsl_spline *gsl_spline_alloc(const gsl_interp_type *t, size_t n) {
  (void)t;
  gsl_spline *s = malloc(sizeof(*s));
  s->n = n;
  s->x = malloc(n * sizeof(double));
  s->y = malloc(n * sizeof(double));
  s->c = calloc(n, sizeof(double));
  return s;
}

int gsl_spline_init(gsl_spline *s, const double *x, const double *y,
                    size_t n) {
  if (n != s->n) DIEG("spline size mismatch");
  memcpy(s->x, x, n * sizeof(double));
  memcpy(s->y, y, n * sizeof(double));
  if (n < 3) {
    memset(s->c, 0, n * sizeof(double));
    return 0;
  }
  /* natural cubic: solve for second derivatives c[] (Thomas) */
  double *sub = malloc(n * sizeof(double));
  double *diag = malloc(n * sizeof(double));
  double *sup = malloc(n * sizeof(double));
  double *rhs = malloc(n * sizeof(double));
  diag[0] = 1.0;
  sup[0] = 0.0;
  rhs[0] = 0.0;
  for (size_t i = 1; i + 1 < n; ++i) {
    double h0 = x[i] - x[i - 1], h1 = x[i + 1] - x[i];
    sub[i] = h0;
    diag[i] = 2.0 * (h0 + h1);
    sup[i] = h1;
    rhs[i] = 6.0 * ((y[i + 1] - y[i]) / h1 - (y[i] - y[i - 1]) / h0);
  }
  sub[n - 1] = 0.0;
  diag[n - 1] = 1.0;
  rhs[n - 1] = 0.0;
  for (size_t i = 1; i < n; ++i) {
    double w = sub[i] / diag[i - 1];
    diag[i] -= w * sup[i - 1];
    rhs[i] -= w * rhs[i - 1];
  }
  s->c[n - 1] = rhs[n - 1] / diag[n - 1];
  for (size_t i = n - 1; i-- > 0;)
    s->c[i] = (rhs[i] - sup[i] * s->c[i + 1]) / diag[i];
  free(sub);
  free(diag);
  free(sup);
  free(rhs);
  return 0;
}

double gsl_spline_eval(const gsl_spline *s, double xv, gsl_interp_accel *a) {
  size_t lo = 0, hi = s->n - 1;
  if (a && a->hint + 1 < s->n && s->x[a->hint] <= xv &&
      xv <= s->x[a->hint + 1]) {
    lo = a->hint;
  } else {
    while (hi - lo > 1) {
      size_t mid = (lo + hi) / 2;
      if (s->x[mid] > xv)
        hi = mid;
      else
        lo = mid;
    }
    if (a) a->hint = lo;
  }
  double h = s->x[lo + 1] - s->x[lo];
  double t = (xv - s->x[lo]) / h;
  double c0 = s->c[lo], c1 = s->c[lo + 1];
  return (1.0 - t) * s->y[lo] + t * s->y[lo + 1] +
         h * h / 6.0 *
             ((1.0 - t) * ((1.0 - t) * (1.0 - t) - 1.0) * c0 +
              t * (t * t - 1.0) * c1);
}
void gsl_spline_free(gsl_spline *s) {
  free(s->x);
  free(s->y);
  free(s->c);
  free(s);
}

/* ---- sorts ---- */
static int cmp_long(const void *a, const void *b) {
  long la = *(const long *)a, lb = *(const long *)b;
  return (la > lb) - (la < lb);
}
void gsl_sort_long(long *data, size_t stride, size_t n) {
  if (stride != 1) DIEG("gsl_sort_long stride != 1");
  qsort(data, n, sizeof(long), cmp_long);
}
static const long *g_idx_data;
static int cmp_idx(const void *a, const void *b) {
  long va = g_idx_data[*(const size_t *)a];
  long vb = g_idx_data[*(const size_t *)b];
  return (va > vb) - (va < vb);
}
void gsl_sort_long_index(size_t *p, const long *data, size_t stride,
                         size_t n) {
  if (stride != 1) DIEG("gsl_sort_long_index stride != 1");
  for (size_t i = 0; i < n; ++i) p[i] = i;
  g_idx_data = data;
  qsort(p, n, sizeof(size_t), cmp_idx);
}
int gsl_heapsort(void *array, size_t count, size_t size,
                 int (*compar)(const void *, const void *)) {
  qsort(array, count, size, compar);
  return 0;
}

/* ---- rng (splitmix64) ---- */
static const gsl_rng_type ranlxd2_type = {0};
const gsl_rng_type *gsl_rng_ranlxd2 = &ranlxd2_type;
gsl_rng *gsl_rng_alloc(const gsl_rng_type *t) {
  (void)t;
  gsl_rng *r = malloc(sizeof(*r));
  r->state = 0x9e3779b97f4a7c15ULL;
  return r;
}
void gsl_rng_set(gsl_rng *r, unsigned long seed) {
  r->state = (unsigned long long)seed + 0x9e3779b97f4a7c15ULL;
}
double gsl_rng_uniform(gsl_rng *r) {
  unsigned long long z = (r->state += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  z = z ^ (z >> 31);
  return (double)(z >> 11) * (1.0 / 9007199254740992.0);
}
void gsl_rng_free(gsl_rng *r) { free(r); }

/* ---- 2F1 series (reference usage: a=1/2,b=1,c=7/6, 0<=x<1) ---- */
double gsl_sf_hyperg_2F1(double a, double b, double c, double x) {
  if (x >= 1.0 || x < -1.0) DIEG("2F1 stub: |x| out of series range");
  if (x < 0.0) /* Pfaff: 2F1(a,b;c;x) = (1-x)^-a 2F1(a,c-b;c;x/(x-1)) */
    return pow(1.0 - x, -a) * gsl_sf_hyperg_2F1(a, c - b, c, x / (x - 1.0));
  double term = 1.0, sum = 1.0;
  for (int n = 0; n < 100000; ++n) {
    term *= (a + n) * (b + n) / ((c + n) * (n + 1.0)) * x;
    sum += term;
    if (fabs(term) < 1e-15 * fabs(sum)) break;
  }
  return sum;
}

/* ---- vectors / tridiag ---- */
gsl_vector *gsl_vector_alloc(size_t n) {
  gsl_vector *v = malloc(sizeof(*v));
  v->size = n;
  v->data = calloc(n, sizeof(double));
  return v;
}
void gsl_vector_free(gsl_vector *v) {
  free(v->data);
  free(v);
}
double gsl_vector_get(const gsl_vector *v, size_t i) { return v->data[i]; }
void gsl_vector_set(gsl_vector *v, size_t i, double x) { v->data[i] = x; }

int gsl_linalg_solve_tridiag(const gsl_vector *diag, const gsl_vector *e,
                             const gsl_vector *f, const gsl_vector *b,
                             gsl_vector *x) {
  size_t n = diag->size;
  double *cp = malloc(n * sizeof(double));
  double *dp = malloc(n * sizeof(double));
  cp[0] = (n > 1) ? e->data[0] / diag->data[0] : 0.0;
  dp[0] = b->data[0] / diag->data[0];
  for (size_t i = 1; i < n; ++i) {
    double m = diag->data[i] - f->data[i - 1] * cp[i - 1];
    cp[i] = (i + 1 < n) ? e->data[i] / m : 0.0;
    dp[i] = (b->data[i] - f->data[i - 1] * dp[i - 1]) / m;
  }
  x->data[n - 1] = dp[n - 1];
  for (size_t i = n - 1; i-- > 0;) x->data[i] = dp[i] - cp[i] * x->data[i + 1];
  free(cp);
  free(dp);
  return 0;
}

/* ---- multifit: dead-code path only ---- */
gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2) {
  gsl_matrix *m = malloc(sizeof(*m));
  m->size1 = n1;
  m->size2 = n2;
  m->data = calloc(n1 * n2, sizeof(double));
  return m;
}
void gsl_matrix_free(gsl_matrix *m) {
  free(m->data);
  free(m);
}
void gsl_matrix_set(gsl_matrix *m, size_t i, size_t j, double x) {
  m->data[i * m->size2 + j] = x;
}
gsl_multifit_linear_workspace *gsl_multifit_linear_alloc(size_t n, size_t p) {
  (void)n;
  (void)p;
  DIEG("multifit stub called (dead shearinterp_poly path)");
}
void gsl_multifit_linear_free(gsl_multifit_linear_workspace *w) { (void)w; }
int gsl_multifit_linear(const gsl_matrix *X, const gsl_vector *y,
                        gsl_vector *c, gsl_matrix *cov, double *chisq,
                        gsl_multifit_linear_workspace *work) {
  (void)X; (void)y; (void)c; (void)cov; (void)chisq; (void)work;
  DIEG("multifit stub called");
}
int gsl_multifit_linear_est(const gsl_vector *x, const gsl_vector *c,
                            const gsl_matrix *cov, double *y, double *y_err) {
  (void)x; (void)c; (void)cov; (void)y; (void)y_err;
  DIEG("multifit stub called");
}
