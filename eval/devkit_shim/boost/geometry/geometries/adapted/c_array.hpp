// Shim: c-array ring appending is handled directly by append() in
// <boost/geometry.hpp>; the registration macro is a no-op.
#include <boost/geometry.hpp>
#ifndef BOOST_GEOMETRY_REGISTER_C_ARRAY_CS
#define BOOST_GEOMETRY_REGISTER_C_ARRAY_CS(CS)
#endif
