// Shim: contents folded into boost/geometry.hpp
#include <boost/geometry.hpp>
