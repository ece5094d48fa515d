/* GSL stub (baseline harness): IEEE env no-op. */
#ifndef GSL_STUB_IEEE_UTILS_H
#define GSL_STUB_IEEE_UTILS_H

void gsl_ieee_env_setup(void);

#endif
