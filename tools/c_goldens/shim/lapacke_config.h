/* Minimal lapacke_config.h so the vendored standard lapacke.h (from the
 * tensorflow/Eigen wheel include tree) compiles for C99: int lapack_int and
 * C99 _Complex types, matching SAF's float_complex under C. */
#ifndef _LAPACKE_CONFIG_H_
#define _LAPACKE_CONFIG_H_

#include <stdlib.h>
#include <stdint.h>
#include <complex.h>

#ifndef lapack_int
#define lapack_int int
#endif
#ifndef lapack_logical
#define lapack_logical lapack_int
#endif

#ifndef lapack_complex_float
#define lapack_complex_float float _Complex
#endif
#ifndef lapack_complex_float_real
#define lapack_complex_float_real(z) (crealf(z))
#endif
#ifndef lapack_complex_float_imag
#define lapack_complex_float_imag(z) (cimagf(z))
#endif

#ifndef lapack_complex_double
#define lapack_complex_double double _Complex
#endif
#ifndef lapack_complex_double_real
#define lapack_complex_double_real(z) (creal(z))
#endif
#ifndef lapack_complex_double_imag
#define lapack_complex_double_imag(z) (cimag(z))
#endif

#endif /* _LAPACKE_CONFIG_H_ */
