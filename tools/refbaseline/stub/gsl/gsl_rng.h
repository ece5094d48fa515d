/* GSL stub (baseline harness): rng (splitmix64 core; statistical quality is
 * ample for the KEEP_RAND_FRAC subsampling + test-generator uses). */
#ifndef GSL_STUB_RNG_H
#define GSL_STUB_RNG_H

typedef struct {
  int kind;
} gsl_rng_type;

typedef struct {
  unsigned long long state;
} gsl_rng;

extern const gsl_rng_type *gsl_rng_ranlxd2;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *t);
void gsl_rng_set(gsl_rng *r, unsigned long seed);
double gsl_rng_uniform(gsl_rng *r);
void gsl_rng_free(gsl_rng *r);

#endif
