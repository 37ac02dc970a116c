// Shim for the boost::geometry surface used by the KITTI devkit evaluator:
// model::d2::point_xy, model::polygon, append(poly, c-array ring),
// intersection(), union_(), area(). Inputs there are always convex quads
// (possibly degenerate), so convex-only algorithms suffice.
//
// Deliberately implemented with a DIFFERENT algorithm family than this
// repo's eval/kitti_eval.cpp (which uses Sutherland–Hodgman clipping):
// here intersection = candidate points (mutual vertex containment + pairwise
// edge crossings) -> monotone-chain convex hull -> shoelace area, so the
// differential test compares two independently computed geometries.
#ifndef BOOST_GEOMETRY_SHIM_HPP
#define BOOST_GEOMETRY_SHIM_HPP

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <vector>

namespace boost {
namespace geometry {

namespace model {
namespace d2 {
template <typename T>
struct point_xy {
  T x, y;
};
}  // namespace d2

template <typename Point>
struct polygon {
  std::vector<Point> outer;
  // union_() of two overlapping convex polygons is a single region whose
  // area is A + B - I; we carry that scalar instead of tracing the boundary
  // (the devkit only ever takes area(un.front())).
  double area_override = -1.0;
};
}  // namespace model

namespace detail {

using PointD = model::d2::point_xy<double>;

// ring without the duplicated closing vertex
inline std::vector<PointD> openRing(const std::vector<PointD>& ring) {
  std::vector<PointD> r = ring;
  while (r.size() > 1 && r.front().x == r.back().x &&
         r.front().y == r.back().y)
    r.pop_back();
  return r;
}

inline double shoelace(const std::vector<PointD>& r) {
  double a = 0;
  const std::size_t n = r.size();
  for (std::size_t i = 0; i < n; ++i) {
    const PointD& u = r[i];
    const PointD& v = r[(i + 1) % n];
    a += u.x * v.y - v.x * u.y;
  }
  return 0.5 * a;
}

inline double cross(const PointD& o, const PointD& a, const PointD& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// point-in-convex-polygon (boundary counts as inside); works for either
// winding by requiring all edge cross products to share a sign
inline bool insideConvex(const PointD& p, const std::vector<PointD>& poly) {
  bool pos = false, neg = false;
  const std::size_t n = poly.size();
  for (std::size_t i = 0; i < n; ++i) {
    const double c = cross(poly[i], poly[(i + 1) % n], p);
    if (c > 1e-12) pos = true;
    if (c < -1e-12) neg = true;
    if (pos && neg) return false;
  }
  return true;
}

// proper + touching segment intersection points
inline bool segIntersect(const PointD& a, const PointD& b, const PointD& c,
                         const PointD& d, PointD& out) {
  const double rx = b.x - a.x, ry = b.y - a.y;
  const double sx = d.x - c.x, sy = d.y - c.y;
  const double denom = rx * sy - ry * sx;
  if (std::fabs(denom) < 1e-14) return false;  // parallel/collinear: vertex
                                               // containment covers overlap
  const double t = ((c.x - a.x) * sy - (c.y - a.y) * sx) / denom;
  const double u = ((c.x - a.x) * ry - (c.y - a.y) * rx) / denom;
  if (t < -1e-12 || t > 1 + 1e-12 || u < -1e-12 || u > 1 + 1e-12) return false;
  out.x = a.x + t * rx;
  out.y = a.y + t * ry;
  return true;
}

inline std::vector<PointD> convexHull(std::vector<PointD> pts) {
  std::sort(pts.begin(), pts.end(), [](const PointD& a, const PointD& b) {
    return a.x < b.x || (a.x == b.x && a.y < b.y);
  });
  pts.erase(std::unique(pts.begin(), pts.end(),
                        [](const PointD& a, const PointD& b) {
                          return std::fabs(a.x - b.x) < 1e-10 &&
                                 std::fabs(a.y - b.y) < 1e-10;
                        }),
            pts.end());
  const std::size_t n = pts.size();
  if (n < 3) return pts;
  std::vector<PointD> hull(2 * n);
  std::size_t k = 0;
  for (std::size_t i = 0; i < n; ++i) {  // lower
    while (k >= 2 && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
    hull[k++] = pts[i];
  }
  for (std::size_t i = n - 1, t = k + 1; i-- > 0;) {  // upper
    while (k >= t && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
    hull[k++] = pts[i];
  }
  hull.resize(k - 1);
  return hull;
}

inline double convexIntersectionArea(const std::vector<PointD>& a,
                                     const std::vector<PointD>& b) {
  std::vector<PointD> cand;
  for (const PointD& p : a)
    if (insideConvex(p, b)) cand.push_back(p);
  for (const PointD& p : b)
    if (insideConvex(p, a)) cand.push_back(p);
  const std::size_t na = a.size(), nb = b.size();
  PointD x;
  for (std::size_t i = 0; i < na; ++i)
    for (std::size_t j = 0; j < nb; ++j)
      if (segIntersect(a[i], a[(i + 1) % na], b[j], b[(j + 1) % nb], x))
        cand.push_back(x);
  if (cand.size() < 3) return 0.0;
  return std::fabs(shoelace(convexHull(cand)));
}

}  // namespace detail

template <typename Polygon, std::size_t N>
void append(Polygon& poly, const double (&pts)[N][2]) {
  for (std::size_t i = 0; i < N; ++i)
    poly.outer.push_back({pts[i][0], pts[i][1]});
}

template <typename Polygon>
double area(const Polygon& poly) {
  if (poly.area_override >= 0) return poly.area_override;
  return std::fabs(detail::shoelace(detail::openRing(poly.outer)));
}

template <typename Polygon>
void intersection(const Polygon& a, const Polygon& b,
                  std::vector<Polygon>& out) {
  const double ia = detail::convexIntersectionArea(
      detail::openRing(a.outer), detail::openRing(b.outer));
  if (ia > 0) {
    Polygon p;
    p.area_override = ia;
    out.push_back(p);
  }
}

template <typename Polygon>
void union_(const Polygon& a, const Polygon& b, std::vector<Polygon>& out) {
  const std::vector<detail::PointD> ra = detail::openRing(a.outer);
  const std::vector<detail::PointD> rb = detail::openRing(b.outer);
  const double ia = detail::convexIntersectionArea(ra, rb);
  if (ia > 0) {
    Polygon p;
    p.area_override = std::fabs(detail::shoelace(ra)) +
                      std::fabs(detail::shoelace(rb)) - ia;
    out.push_back(p);
  } else {
    // disjoint: two output regions; the devkit only reads front()'s area and
    // divides a zero intersection by it, so order does not affect results
    out.push_back(a);
    out.push_back(b);
  }
}

}  // namespace geometry
}  // namespace boost

#endif
