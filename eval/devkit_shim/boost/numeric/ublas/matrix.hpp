// Shim for the tiny boost::numeric::ublas surface the KITTI devkit uses:
// matrix<double>(rows, cols) with (i,j) access, .data().begin(), and prod().
// Row-major dense storage, no expression templates.
#ifndef BOOST_UBLAS_MATRIX_SHIM_HPP
#define BOOST_UBLAS_MATRIX_SHIM_HPP

#include <cstddef>
#include <vector>

namespace boost {
namespace numeric {
namespace ublas {

template <typename T>
class matrix {
 public:
  matrix(std::size_t rows, std::size_t cols)
      : rows_(rows), cols_(cols), d_(rows * cols, T()) {}

  T& operator()(std::size_t i, std::size_t j) { return d_[i * cols_ + j]; }
  const T& operator()(std::size_t i, std::size_t j) const {
    return d_[i * cols_ + j];
  }

  std::size_t size1() const { return rows_; }
  std::size_t size2() const { return cols_; }
  std::vector<T>& data() { return d_; }
  const std::vector<T>& data() const { return d_; }

 private:
  std::size_t rows_, cols_;
  std::vector<T> d_;
};

template <typename T>
matrix<T> prod(const matrix<T>& a, const matrix<T>& b) {
  matrix<T> c(a.size1(), b.size2());
  for (std::size_t i = 0; i < a.size1(); ++i)
    for (std::size_t k = 0; k < a.size2(); ++k) {
      const T aik = a(i, k);
      for (std::size_t j = 0; j < b.size2(); ++j) c(i, j) += aik * b(k, j);
    }
  return c;
}

}  // namespace ublas
}  // namespace numeric
}  // namespace boost

#endif
