/* GSL stub (baseline harness): sinc. */
#ifndef GSL_STUB_SF_TRIG_H
#define GSL_STUB_SF_TRIG_H

double gsl_sf_sinc(double x); /* sin(pi x)/(pi x) */

#endif
