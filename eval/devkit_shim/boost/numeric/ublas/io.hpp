// Shim: the devkit includes this for operator<< on ublas matrices, which it
// never uses. Intentionally empty.
#ifndef BOOST_UBLAS_IO_SHIM_HPP
#define BOOST_UBLAS_IO_SHIM_HPP
#endif
