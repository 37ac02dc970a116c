// kitti_eval — single parameterized KITTI 3D-object-detection evaluator.
//
// Re-implementation of the official KITTI devkit AP protocol (the reference
// repo ships 30 near-identical compiled copies differing only in the
// MIN_OVERLAP table and a ground-truth distance gate; here both are CLI
// flags).  Differences from the official devkit:
//   * no boost: rotated-BEV overlap uses an in-house convex polygon clip
//     (Sutherland–Hodgman) + shoelace area;
//   * one binary: --overlap <car> <ped> <cyc> sets the per-class minimum
//     overlap (applied to image/ground/3D metrics alike, as the reference
//     variants do), --max_dist <m> ignores ground truth farther than m
//     meters (<=0 disables the gate);
//   * number of images discovered from the results dir (glob), as in the
//     reference's updated main evaluator.
//
// Outputs: stats_{car,pedestrian,cyclist}_{detection,orientation,
// detection_ground,detection_3d}.txt in the results dir, each with three
// rows (easy, moderate, hard) of 41 interpolated precision values —
// byte-format-compatible with the reference parser (lib/rpn_util.py:2013).
//
// Usage: kitti_eval <results_dir> <gt_dir> [--overlap c p y] [--max_dist m]
//   <results_dir>/data/*.txt holds KITTI-format detections.

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <string>
#include <sys/stat.h>
#include <vector>

namespace {

enum Difficulty { EASY = 0, MODERATE = 1, HARD = 2 };
enum Metric { IMAGE = 0, GROUND = 1, BOX3D = 2 };

const int MIN_HEIGHT[3] = {40, 25, 25};
const int MAX_OCCLUSION[3] = {0, 1, 2};
const double MAX_TRUNCATION[3] = {0.15, 0.30, 0.50};
const int NUM_CLASS = 3;
const char* CLASS_NAMES[NUM_CLASS] = {"car", "pedestrian", "cyclist"};
const int N_SAMPLE_PTS = 41;

double g_min_overlap[NUM_CLASS] = {0.7, 0.5, 0.5};
double g_max_dist = -1.0;  // <=0: no distance gate

struct Box {
  std::string type;
  double x1 = -1, y1 = -1, x2 = -1, y2 = -1;
  double alpha = -10;
};

struct GroundTruth {
  Box box;
  double truncation = -1;
  int occlusion = -1;
  double ry = 0, t1 = 0, t2 = 0, t3 = 0, h = 0, w = 0, l = 0;
};

struct Detection {
  Box box;
  double thresh = -1000;
  double ry = 0, t1 = 0, t2 = 0, t3 = 0, h = 0, w = 0, l = 0;
};

struct PrData {
  std::vector<double> v;
  double similarity = 0;
  int tp = 0, fp = 0, fn = 0;
};

bool iequals(const char* a, const char* b) { return strcasecmp(a, b) == 0; }

// ---------------------------------------------------------------------------
// geometry: convex polygon clip + area (replaces boost::geometry)
// ---------------------------------------------------------------------------

struct Pt {
  double x, z;
};

double polyArea(const std::vector<Pt>& p) {
  double a = 0;
  const size_t n = p.size();
  for (size_t i = 0; i < n; ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % n];
    a += u.x * v.z - v.x * u.z;
  }
  return std::fabs(a) * 0.5;
}

// clip subject polygon against the half-plane left of edge (a->b) for a CCW
// clip polygon (Sutherland–Hodgman step)
std::vector<Pt> clipEdge(const std::vector<Pt>& poly, Pt a, Pt b) {
  std::vector<Pt> out;
  const size_t n = poly.size();
  auto side = [&](const Pt& p) {
    return (b.x - a.x) * (p.z - a.z) - (b.z - a.z) * (p.x - a.x);
  };
  for (size_t i = 0; i < n; ++i) {
    const Pt& cur = poly[i];
    const Pt& nxt = poly[(i + 1) % n];
    const double sc = side(cur), sn = side(nxt);
    if (sc >= 0) out.push_back(cur);
    if ((sc > 0 && sn < 0) || (sc < 0 && sn > 0)) {
      const double t = sc / (sc - sn);
      out.push_back({cur.x + t * (nxt.x - cur.x), cur.z + t * (nxt.z - cur.z)});
    }
  }
  return out;
}

double convexIntersectArea(const std::vector<Pt>& a, const std::vector<Pt>& b) {
  std::vector<Pt> poly = a;
  const size_t n = b.size();
  for (size_t i = 0; i < n && !poly.empty(); ++i)
    poly = clipEdge(poly, b[i], b[(i + 1) % n]);
  return poly.empty() ? 0.0 : polyArea(poly);
}

// BEV footprint corners (x, z), CCW, of an oriented box (official devkit's
// toPolygon uses R(ry) = [[cos, sin], [-sin, cos]] on (l/2, w/2) offsets)
template <typename T>
std::vector<Pt> bevPolygon(const T& g) {
  const double c = std::cos(g.ry), s = std::sin(g.ry);
  const double lx[4] = {g.l / 2, g.l / 2, -g.l / 2, -g.l / 2};
  const double wz[4] = {g.w / 2, -g.w / 2, -g.w / 2, g.w / 2};
  std::vector<Pt> p(4);
  for (int i = 0; i < 4; ++i) {
    p[i].x = c * lx[i] + s * wz[i] + g.t1;
    p[i].z = -s * lx[i] + c * wz[i] + g.t3;
  }
  // ensure CCW orientation for the clipper (shoelace sign)
  double cross = 0;
  for (int i = 0; i < 4; ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % 4];
    cross += u.x * v.z - v.x * u.z;
  }
  if (cross < 0) std::reverse(p.begin(), p.end());
  return p;
}

// ---------------------------------------------------------------------------
// overlap measures (criterion: -1 union, 0 w.r.t. a, 1 w.r.t. b)
// ---------------------------------------------------------------------------

double imageBoxOverlap(const Box& a, const Box& b, int criterion) {
  const double x1 = std::max(a.x1, b.x1), y1 = std::max(a.y1, b.y1);
  const double x2 = std::min(a.x2, b.x2), y2 = std::min(a.y2, b.y2);
  const double w = x2 - x1, h = y2 - y1;
  if (w <= 0 || h <= 0) return 0;
  const double inter = w * h;
  const double a_area = (a.x2 - a.x1) * (a.y2 - a.y1);
  const double b_area = (b.x2 - b.x1) * (b.y2 - b.y1);
  if (criterion == 0) return inter / a_area;
  if (criterion == 1) return inter / b_area;
  return inter / (a_area + b_area - inter);
}

double imageOverlap(const Detection& d, const GroundTruth& g, int criterion) {
  return imageBoxOverlap(d.box, g.box, criterion);
}

double groundOverlap(const Detection& d, const GroundTruth& g, int criterion) {
  const std::vector<Pt> dp = bevPolygon(d), gp = bevPolygon(g);
  const double inter = convexIntersectArea(dp, gp);
  const double da = polyArea(dp), ga = polyArea(gp);
  if (criterion == 0) return da > 0 ? inter / da : 0;
  if (criterion == 1) return ga > 0 ? inter / ga : 0;
  const double uni = da + ga - inter;
  return uni > 0 ? inter / uni : 0;
}

double box3dOverlap(const Detection& d, const GroundTruth& g, int criterion) {
  const std::vector<Pt> dp = bevPolygon(d), gp = bevPolygon(g);
  const double interArea = convexIntersectArea(dp, gp);
  const double ymax = std::min(d.t2, g.t2);
  const double ymin = std::max(d.t2 - d.h, g.t2 - g.h);
  const double interVol = interArea * std::max(0.0, ymax - ymin);
  const double dVol = d.h * d.l * d.w, gVol = g.h * g.l * g.w;
  if (criterion == 0) return dVol > 0 ? interVol / dVol : 0;
  if (criterion == 1) return gVol > 0 ? interVol / gVol : 0;
  const double uni = dVol + gVol - interVol;
  return uni > 0 ? interVol / uni : 0;
}

typedef double (*OverlapFn)(const Detection&, const GroundTruth&, int);

// ---------------------------------------------------------------------------
// IO
// ---------------------------------------------------------------------------

std::vector<Detection> loadDetections(const std::string& path,
                                      bool& compute_aos,
                                      std::vector<bool>& eval_image,
                                      std::vector<bool>& eval_ground,
                                      std::vector<bool>& eval_3d,
                                      bool& success) {
  std::vector<Detection> dets;
  FILE* fp = fopen(path.c_str(), "r");
  if (!fp) {
    success = false;
    return dets;
  }
  char str[255];
  while (!feof(fp)) {
    Detection d;
    double trash;
    if (fscanf(fp, "%254s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf",
               str, &trash, &trash, &d.box.alpha, &d.box.x1, &d.box.y1,
               &d.box.x2, &d.box.y2, &d.h, &d.w, &d.l, &d.t1, &d.t2, &d.t3,
               &d.ry, &d.thresh) == 16) {
      d.box.type = str;
      dets.push_back(d);
      if (d.box.alpha == -10) compute_aos = false;
      for (int c = 0; c < NUM_CLASS; ++c) {
        if (iequals(d.box.type.c_str(), CLASS_NAMES[c])) {
          if (!eval_image[c] && d.box.x1 >= 0) eval_image[c] = true;
          if (!eval_ground[c] && d.t1 != -1000 && d.t3 != -1000 && d.w > 0 &&
              d.l > 0)
            eval_ground[c] = true;
          if (!eval_3d[c] && d.t1 != -1000 && d.t2 != -1000 &&
              d.t3 != -1000 && d.h > 0 && d.w > 0 && d.l > 0)
            eval_3d[c] = true;
          break;
        }
      }
    }
  }
  fclose(fp);
  success = true;
  return dets;
}

std::vector<GroundTruth> loadGroundtruth(const std::string& path,
                                         bool& success) {
  std::vector<GroundTruth> gts;
  FILE* fp = fopen(path.c_str(), "r");
  if (!fp) {
    success = false;
    return gts;
  }
  char str[255];
  while (!feof(fp)) {
    GroundTruth g;
    if (fscanf(fp, "%254s %lf %d %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf",
               str, &g.truncation, &g.occlusion, &g.box.alpha, &g.box.x1,
               &g.box.y1, &g.box.x2, &g.box.y2, &g.h, &g.w, &g.l, &g.t1,
               &g.t2, &g.t3, &g.ry) == 15) {
      g.box.type = str;
      gts.push_back(g);
    }
  }
  fclose(fp);
  success = true;
  return gts;
}

// ---------------------------------------------------------------------------
// core protocol
// ---------------------------------------------------------------------------

std::vector<double> getThresholds(std::vector<double>& v,
                                  double n_groundtruth) {
  std::vector<double> t;
  std::sort(v.begin(), v.end(), std::greater<double>());
  double current_recall = 0;
  for (size_t i = 0; i < v.size(); ++i) {
    const double l_recall = (double)(i + 1) / n_groundtruth;
    const double r_recall =
        i < v.size() - 1 ? (double)(i + 2) / n_groundtruth : l_recall;
    if ((r_recall - current_recall) < (current_recall - l_recall) &&
        i < v.size() - 1)
      continue;
    t.push_back(v[i]);
    current_recall += 1.0 / (N_SAMPLE_PTS - 1.0);
  }
  return t;
}

void cleanData(int current_class, const std::vector<GroundTruth>& gt,
               const std::vector<Detection>& det,
               std::vector<int>& ignored_gt, std::vector<GroundTruth>& dc,
               std::vector<int>& ignored_det, int& n_gt,
               Difficulty difficulty) {
  for (size_t i = 0; i < gt.size(); ++i) {
    const double height = gt[i].box.y2 - gt[i].box.y1;
    int valid_class;
    if (iequals(gt[i].box.type.c_str(), CLASS_NAMES[current_class]))
      valid_class = 1;
    else if (iequals(CLASS_NAMES[current_class], "pedestrian") &&
             iequals("person_sitting", gt[i].box.type.c_str()))
      valid_class = 0;
    else if (iequals(CLASS_NAMES[current_class], "car") &&
             iequals("van", gt[i].box.type.c_str()))
      valid_class = 0;
    else
      valid_class = -1;

    bool ignore = gt[i].occlusion > MAX_OCCLUSION[difficulty] ||
                  gt[i].truncation > MAX_TRUNCATION[difficulty] ||
                  height <= MIN_HEIGHT[difficulty];
    if (g_max_dist > 0 && gt[i].t3 > g_max_dist) ignore = true;

    if (valid_class == 1 && !ignore) {
      ignored_gt.push_back(0);
      n_gt++;
    } else if (valid_class == 0 || (ignore && valid_class == 1)) {
      ignored_gt.push_back(1);
    } else {
      ignored_gt.push_back(-1);
    }
  }

  for (size_t i = 0; i < gt.size(); ++i)
    if (iequals("dontcare", gt[i].box.type.c_str())) dc.push_back(gt[i]);

  for (size_t i = 0; i < det.size(); ++i) {
    int valid_class =
        iequals(det[i].box.type.c_str(), CLASS_NAMES[current_class]) ? 1 : -1;
    const double height = std::fabs(det[i].box.y1 - det[i].box.y2);
    if (height < MIN_HEIGHT[difficulty])
      ignored_det.push_back(1);
    else if (valid_class == 1)
      ignored_det.push_back(0);
    else
      ignored_det.push_back(-1);
  }
}

PrData computeStatistics(int current_class, const std::vector<GroundTruth>& gt,
                         const std::vector<Detection>& det,
                         const std::vector<GroundTruth>& dc,
                         const std::vector<int>& ignored_gt,
                         const std::vector<int>& ignored_det, bool compute_fp,
                         OverlapFn overlap_fn, bool compute_aos = false,
                         double thresh = 0) {
  PrData stat;
  const double NO_DETECTION = -10000000;
  const double min_overlap = g_min_overlap[current_class];
  std::vector<double> delta;
  std::vector<bool> assigned(det.size(), false);
  std::vector<bool> ignored_threshold(det.size(), false);

  if (compute_fp)
    for (size_t i = 0; i < det.size(); ++i)
      if (det[i].thresh < thresh) ignored_threshold[i] = true;

  for (size_t i = 0; i < gt.size(); ++i) {
    if (ignored_gt[i] == -1) continue;

    int det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_overlap = 0;
    bool assigned_ignored_det = false;

    for (size_t j = 0; j < det.size(); ++j) {
      if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j])
        continue;
      const double overlap = overlap_fn(det[j], gt[i], -1);
      if (!compute_fp && overlap > min_overlap &&
          det[j].thresh > valid_detection) {
        det_idx = (int)j;
        valid_detection = det[j].thresh;
      } else if (compute_fp && overlap > min_overlap &&
                 (overlap > max_overlap || assigned_ignored_det) &&
                 ignored_det[j] == 0) {
        max_overlap = overlap;
        det_idx = (int)j;
        valid_detection = 1;
        assigned_ignored_det = false;
      } else if (compute_fp && overlap > min_overlap &&
                 valid_detection == NO_DETECTION && ignored_det[j] == 1) {
        det_idx = (int)j;
        valid_detection = 1;
        assigned_ignored_det = true;
      }
    }

    if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
      stat.fn++;
    } else if (valid_detection != NO_DETECTION &&
               (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (valid_detection != NO_DETECTION) {
      stat.tp++;
      stat.v.push_back(det[det_idx].thresh);
      if (compute_aos)
        delta.push_back(gt[i].box.alpha - det[det_idx].box.alpha);
      assigned[det_idx] = true;
    }
  }

  if (compute_fp) {
    for (size_t i = 0; i < det.size(); ++i)
      if (!(assigned[i] || ignored_det[i] == -1 || ignored_det[i] == 1 ||
            ignored_threshold[i]))
        stat.fp++;

    int nstuff = 0;
    for (size_t i = 0; i < dc.size(); ++i) {
      for (size_t j = 0; j < det.size(); ++j) {
        if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
            ignored_threshold[j])
          continue;
        if (overlap_fn(det[j], dc[i], 0) > min_overlap) {
          assigned[j] = true;
          nstuff++;
        }
      }
    }
    stat.fp -= nstuff;

    if (compute_aos) {
      std::vector<double> tmp(stat.fp, 0.0);
      for (size_t i = 0; i < delta.size(); ++i)
        tmp.push_back((1.0 + std::cos(delta[i])) / 2.0);
      assert((int)tmp.size() == stat.fp + stat.tp);
      if (stat.tp > 0 || stat.fp > 0) {
        stat.similarity = 0;
        for (double x : tmp) stat.similarity += x;
      } else {
        stat.similarity = -1;
      }
    }
  }
  return stat;
}

void saveStats(const std::vector<double>& precision,
               const std::vector<double>& aos, FILE* fp_det, FILE* fp_ori) {
  if (precision.empty()) return;
  for (double p : precision) fprintf(fp_det, "%f ", p);
  fprintf(fp_det, "\n");
  if (aos.empty()) return;
  for (double a : aos) fprintf(fp_ori, "%f ", a);
  fprintf(fp_ori, "\n");
}

bool evalClass(FILE* fp_det, FILE* fp_ori, int current_class,
               const std::vector<std::vector<GroundTruth>>& groundtruth,
               const std::vector<std::vector<Detection>>& detections,
               bool compute_aos, OverlapFn overlap_fn,
               std::vector<double>& precision, std::vector<double>& aos,
               Difficulty difficulty) {
  int n_gt = 0;
  std::vector<double> v;
  std::vector<std::vector<int>> ignored_gt, ignored_det;
  std::vector<std::vector<GroundTruth>> dontcare;

  for (size_t i = 0; i < groundtruth.size(); ++i) {
    std::vector<int> i_gt, i_det;
    std::vector<GroundTruth> dc;
    cleanData(current_class, groundtruth[i], detections[i], i_gt, dc, i_det,
              n_gt, difficulty);
    ignored_gt.push_back(i_gt);
    ignored_det.push_back(i_det);
    dontcare.push_back(dc);
    PrData tmp = computeStatistics(current_class, groundtruth[i],
                                   detections[i], dc, i_gt, i_det, false,
                                   overlap_fn);
    v.insert(v.end(), tmp.v.begin(), tmp.v.end());
  }

  std::vector<double> thresholds = getThresholds(v, n_gt);
  std::vector<PrData> pr(thresholds.size());
  for (size_t i = 0; i < groundtruth.size(); ++i) {
    for (size_t t = 0; t < thresholds.size(); ++t) {
      PrData tmp = computeStatistics(current_class, groundtruth[i],
                                     detections[i], dontcare[i],
                                     ignored_gt[i], ignored_det[i], true,
                                     overlap_fn, compute_aos, thresholds[t]);
      pr[t].tp += tmp.tp;
      pr[t].fp += tmp.fp;
      pr[t].fn += tmp.fn;
      if (tmp.similarity != -1) pr[t].similarity += tmp.similarity;
    }
  }

  precision.assign(N_SAMPLE_PTS, 0);
  if (compute_aos) aos.assign(N_SAMPLE_PTS, 0);
  for (size_t i = 0; i < thresholds.size(); ++i) {
    precision[i] = pr[i].tp / (double)(pr[i].tp + pr[i].fp);
    if (compute_aos)
      aos[i] = pr[i].similarity / (double)(pr[i].tp + pr[i].fp);
  }
  for (size_t i = 0; i < thresholds.size(); ++i) {
    precision[i] = *std::max_element(precision.begin() + i, precision.end());
    if (compute_aos)
      aos[i] = *std::max_element(aos.begin() + i, aos.end());
  }
  saveStats(precision, aos, fp_det, fp_ori);
  return true;
}

std::vector<std::string> listResultFiles(const std::string& data_dir) {
  std::vector<std::string> names;
  DIR* dir = opendir(data_dir.c_str());
  if (!dir) return names;
  while (dirent* ent = readdir(dir)) {
    std::string n = ent->d_name;
    if (n.size() > 4 && n.substr(n.size() - 4) == ".txt") names.push_back(n);
  }
  closedir(dir);
  std::sort(names.begin(), names.end());
  return names;
}

bool evalAll(const std::string& result_dir, const std::string& gt_dir) {
  std::vector<std::vector<GroundTruth>> groundtruth;
  std::vector<std::vector<Detection>> detections;
  bool compute_aos = true;
  std::vector<bool> eval_image(NUM_CLASS, false), eval_ground(NUM_CLASS, false),
      eval_3d(NUM_CLASS, false);

  const std::vector<std::string> files = listResultFiles(result_dir + "/data");
  if (files.empty()) {
    fprintf(stderr, "no result files under %s/data\n", result_dir.c_str());
    return false;
  }
  for (const std::string& name : files) {
    bool gt_ok, det_ok;
    groundtruth.push_back(loadGroundtruth(gt_dir + "/" + name, gt_ok));
    detections.push_back(loadDetections(result_dir + "/data/" + name,
                                        compute_aos, eval_image, eval_ground,
                                        eval_3d, det_ok));
    if (!gt_ok) {
      fprintf(stderr, "missing ground truth %s/%s\n", gt_dir.c_str(),
              name.c_str());
      return false;
    }
  }

  struct MetricSpec {
    const char* suffix;
    OverlapFn fn;
    const std::vector<bool>* enabled;
    bool aos;
  };
  const MetricSpec metrics[3] = {
      {"detection", imageOverlap, &eval_image, true},
      {"detection_ground", groundOverlap, &eval_ground, false},
      {"detection_3d", box3dOverlap, &eval_3d, false},
  };

  for (const MetricSpec& m : metrics) {
    const bool aos_here = m.aos && compute_aos;
    for (int c = 0; c < NUM_CLASS; ++c) {
      if (!(*m.enabled)[c]) continue;
      FILE* fp_det = fopen((result_dir + "/stats_" + CLASS_NAMES[c] + "_" +
                            m.suffix + ".txt").c_str(), "w");
      FILE* fp_ori = nullptr;
      if (aos_here)
        fp_ori = fopen((result_dir + "/stats_" + CLASS_NAMES[c] +
                        "_orientation.txt").c_str(), "w");
      for (int d = 0; d < 3; ++d) {
        std::vector<double> precision, aos;
        evalClass(fp_det, fp_ori, c, groundtruth, detections, aos_here,
                  m.fn, precision, aos, (Difficulty)d);
      }
      fclose(fp_det);
      if (fp_ori) fclose(fp_ori);
      printf("evaluated %s %s\n", CLASS_NAMES[c], m.suffix);
    }
  }
  return true;
}

}  // namespace

int main(int argc, char* argv[]) {
  if (argc < 3) {
    fprintf(stderr,
            "Usage: %s <results_dir> <gt_dir> [--overlap car ped cyc] "
            "[--max_dist m]\n",
            argv[0]);
    return 1;
  }
  const std::string result_dir = argv[1];
  const std::string gt_dir = argv[2];
  for (int i = 3; i < argc; ++i) {
    if (!strcmp(argv[i], "--overlap") && i + 3 < argc) {
      g_min_overlap[0] = atof(argv[i + 1]);
      g_min_overlap[1] = atof(argv[i + 2]);
      g_min_overlap[2] = atof(argv[i + 3]);
      i += 3;
    } else if (!strcmp(argv[i], "--max_dist") && i + 1 < argc) {
      g_max_dist = atof(argv[i + 1]);
      i += 1;
    } else {
      fprintf(stderr, "unknown flag %s\n", argv[i]);
      return 1;
    }
  }
  return evalAll(result_dir, gt_dir) ? 0 : 1;
}
