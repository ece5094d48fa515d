/* GSL stub (baseline harness): 2F1 by series (the reference calls it with
 * a=1/2, b=1, c=7/6, 0 <= z < 1 — maputils.c:27-28). */
#ifndef GSL_STUB_SF_HYPERG_H
#define GSL_STUB_SF_HYPERG_H

double gsl_sf_hyperg_2F1(double a, double b, double c, double x);

#endif
