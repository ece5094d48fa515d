#ifndef STUB_GSL_MATH
#define STUB_GSL_MATH
#include <math.h>
#endif
