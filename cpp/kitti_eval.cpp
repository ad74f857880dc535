// KITTI object detection AP evaluation (2D / bird's-eye-view / 3D).
//
// Single parameterized binary covering every variant of the reference devkit
// (/root/reference/data/KITTI/kitti_split1/devkit/cpp/: evaluate_object.cpp
// plus 29 copies differing only in MIN_OVERLAP 0.1..0.7 and a DEPTH_THRESH
// band filter — verified by diff): pass --min_overlap and --depth instead of
// recompiling. Clean-room implementation of the official KITTI protocol with
// 41-point recall interpolation; rotated-rectangle overlap uses a
// Sutherland-Hodgman convex clip instead of boost::geometry.
//
// Usage:
//   kitti_eval --gt_dir DIR --det_dir DIR [--ids FILE] [--class car]
//              [--min_overlap 0.7] [--depth 0] [--metric all]
//
// gt/det files: KITTI label format, one file per frame id (000123.txt).
// --depth D != 0 restricts valid ground truth to the depth band (D-15, D]
// (the reference's evaluate_object_{15,30,45,60}m variants).

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <fstream>
#include <numeric>
#include <sstream>
#include <string>
#include <vector>

static const int N_SAMPLE_PTS = 41;

// difficulty bands: easy, moderate, hard
static const int MIN_HEIGHT[3] = {40, 25, 25};
static const int MAX_OCCLUSION[3] = {0, 1, 2};
static const double MAX_TRUNCATION[3] = {0.15, 0.3, 0.5};

enum Metric { IMAGE = 0, GROUND = 1, BOX3D = 2 };

struct Box {
  std::string type;
  double trunc = 0, occ = 0, alpha = 0;
  double x1 = 0, y1 = 0, x2 = 0, y2 = 0;
  double h = 0, w = 0, l = 0;
  double t1 = 0, t2 = 0, t3 = 0, ry = 0;
  double score = 0;
  bool has_score = false;
};

struct Stats {
  double tp = 0, fp = 0, fn = 0;
  std::vector<double> v;  // scores of true positives (for thresholds)
};

static std::string lower(std::string s) {
  std::transform(s.begin(), s.end(), s.begin(), ::tolower);
  return s;
}

static std::vector<Box> loadBoxes(const std::string &path, bool &ok) {
  std::vector<Box> boxes;
  std::ifstream f(path);
  ok = f.good();
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    std::istringstream ss(line);
    Box b;
    ss >> b.type >> b.trunc >> b.occ >> b.alpha >> b.x1 >> b.y1 >> b.x2 >>
        b.y2 >> b.h >> b.w >> b.l >> b.t1 >> b.t2 >> b.t3 >> b.ry;
    if (ss >> b.score) b.has_score = true;
    b.type = lower(b.type);
    boxes.push_back(b);
  }
  return boxes;
}

// ---------------------------------------------------------------- overlaps
static double imageBoxOverlap(const Box &a, const Box &b) {
  double iw = std::min(a.x2, b.x2) - std::max(a.x1, b.x1);
  double ih = std::min(a.y2, b.y2) - std::max(a.y1, b.y1);
  if (iw <= 0 || ih <= 0) return 0.0;
  double inter = iw * ih;
  double uni = (a.x2 - a.x1) * (a.y2 - a.y1) + (b.x2 - b.x1) * (b.y2 - b.y1) -
               inter;
  return inter / uni;
}

struct Pt {
  double x, y;
};

static std::vector<Pt> bevCorners(const Box &b) {
  // ground-plane rectangle centered (t1, t3), dims (w across, l along), yaw ry
  double c = std::cos(b.ry), s = std::sin(b.ry);
  double hx = b.l / 2, hz = b.w / 2;
  double dx[4] = {hx, hx, -hx, -hx};
  double dz[4] = {hz, -hz, -hz, hz};
  std::vector<Pt> out(4);
  for (int i = 0; i < 4; i++) {
    out[i].x = b.t1 + c * dx[i] + s * dz[i];
    out[i].y = b.t3 - s * dx[i] + c * dz[i];
  }
  return out;
}

static double polyArea(const std::vector<Pt> &p) {
  double a = 0;
  for (size_t i = 0; i < p.size(); i++) {
    size_t j = (i + 1) % p.size();
    a += p[i].x * p[j].y - p[j].x * p[i].y;
  }
  return std::fabs(a) / 2;
}

// Sutherland-Hodgman clip of convex polygon `subject` by convex `clip`
static std::vector<Pt> clipPoly(std::vector<Pt> subject,
                                const std::vector<Pt> &clip) {
  // ensure clip polygon is counter-clockwise
  std::vector<Pt> cl = clip;
  double signedA = 0;
  for (size_t i = 0; i < cl.size(); i++) {
    size_t j = (i + 1) % cl.size();
    signedA += cl[i].x * cl[j].y - cl[j].x * cl[i].y;
  }
  if (signedA < 0) std::reverse(cl.begin(), cl.end());

  for (size_t i = 0; i < cl.size() && !subject.empty(); i++) {
    Pt A = cl[i], B = cl[(i + 1) % cl.size()];
    std::vector<Pt> out;
    auto inside = [&](const Pt &p) {
      return (B.x - A.x) * (p.y - A.y) - (B.y - A.y) * (p.x - A.x) >= 0;
    };
    auto intersect = [&](const Pt &p, const Pt &q) {
      double a1 = B.y - A.y, b1 = A.x - B.x;
      double c1 = a1 * A.x + b1 * A.y;
      double a2 = q.y - p.y, b2 = p.x - q.x;
      double c2 = a2 * p.x + b2 * p.y;
      double det = a1 * b2 - a2 * b1;
      Pt r{(b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det};
      return r;
    };
    for (size_t j = 0; j < subject.size(); j++) {
      Pt P = subject[j], Q = subject[(j + 1) % subject.size()];
      bool pin = inside(P), qin = inside(Q);
      if (pin && qin) {
        out.push_back(Q);
      } else if (pin && !qin) {
        out.push_back(intersect(P, Q));
      } else if (!pin && qin) {
        out.push_back(intersect(P, Q));
        out.push_back(Q);
      }
    }
    subject = out;
  }
  return subject;
}

static double groundBoxOverlap(const Box &d, const Box &g) {
  std::vector<Pt> pd = bevCorners(d), pg = bevCorners(g);
  double inter = polyArea(clipPoly(pd, pg));
  double uni = polyArea(pd) + polyArea(pg) - inter;
  if (uni <= 0) return 0.0;
  return inter / uni;
}

static double box3DOverlap(const Box &d, const Box &g) {
  std::vector<Pt> pd = bevCorners(d), pg = bevCorners(g);
  double inter2d = polyArea(clipPoly(pd, pg));
  // y is down: box spans [t2 - h, t2]
  double ymax = std::min(d.t2, g.t2);
  double ymin = std::max(d.t2 - d.h, g.t2 - g.h);
  double yo = std::max(0.0, ymax - ymin);
  double inter = inter2d * yo;
  double uni = d.h * d.w * d.l + g.h * g.w * g.l - inter;
  if (uni <= 0) return 0.0;
  return inter / uni;
}

static double overlapOf(Metric m, const Box &d, const Box &g) {
  switch (m) {
    case IMAGE: return imageBoxOverlap(d, g);
    case GROUND: return groundBoxOverlap(d, g);
    default: return box3DOverlap(d, g);
  }
}

// ---------------------------------------------------------------- protocol
struct CleanedGt {
  std::vector<int> ignored_gt;   // 0 valid, 1 ignored, -1 skip entirely
  std::vector<Box> dontcare;
  int n_gt = 0;
};

// ignored neighbor classes evaluated leniently (official protocol)
static bool neighborClass(const std::string &cls, const std::string &type) {
  if (cls == "car" && type == "van") return true;
  if (cls == "pedestrian" && type == "person_sitting") return true;
  return false;
}

static CleanedGt cleanGt(const std::vector<Box> &gt, const std::string &cls,
                         int difficulty, double depth_thresh) {
  CleanedGt out;
  for (const auto &g : gt) {
    if (g.type == "dontcare") {
      out.dontcare.push_back(g);
      out.ignored_gt.push_back(-1);
      continue;
    }
    bool same = g.type == cls;
    bool neighbor = neighborClass(cls, g.type);
    if (!same && !neighbor) {
      out.ignored_gt.push_back(-1);
      continue;
    }
    double height = g.y2 - g.y1;
    bool depth_ok = depth_thresh == 0.0 ||
                    (g.t3 <= depth_thresh && g.t3 > depth_thresh - 15);
    bool valid = same && g.occ <= MAX_OCCLUSION[difficulty] &&
                 g.trunc <= MAX_TRUNCATION[difficulty] &&
                 height > MIN_HEIGHT[difficulty] && depth_ok;
    if (valid) {
      out.ignored_gt.push_back(0);
      out.n_gt++;
    } else {
      out.ignored_gt.push_back(1);
    }
  }
  return out;
}

static std::vector<int> cleanDet(const std::vector<Box> &det,
                                 const std::string &cls, int difficulty) {
  std::vector<int> ignored;
  for (const auto &d : det) {
    if (d.type != cls) {
      ignored.push_back(-1);
    } else if (d.y2 - d.y1 < MIN_HEIGHT[difficulty]) {
      ignored.push_back(1);
    } else {
      ignored.push_back(0);
    }
  }
  return ignored;
}

static const double NO_DETECTION = -1e9;

static Stats computeStatistics(Metric metric, const std::vector<Box> &gt,
                               const std::vector<Box> &det,
                               const CleanedGt &cg,
                               const std::vector<int> &ignored_det,
                               bool compute_fp, double min_overlap,
                               double thresh) {
  Stats s;
  std::vector<bool> assigned(det.size(), false);
  std::vector<bool> ignored_threshold(det.size(), false);
  if (compute_fp) {
    for (size_t j = 0; j < det.size(); j++) {
      if (det[j].score < thresh) ignored_threshold[j] = true;
    }
  }

  for (size_t i = 0; i < gt.size(); i++) {
    if (cg.ignored_gt[i] == -1) continue;
    int det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_overlap = 0;
    bool assigned_ignored_det = false;

    for (size_t j = 0; j < det.size(); j++) {
      if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j]) continue;
      double overlap = overlapOf(metric, det[j], gt[i]);
      if (!compute_fp && overlap > min_overlap &&
          det[j].score > valid_detection) {
        det_idx = (int)j;
        valid_detection = det[j].score;
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

    if (valid_detection == NO_DETECTION && cg.ignored_gt[i] == 0) {
      s.fn++;
    } else if (valid_detection != NO_DETECTION &&
               (cg.ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (valid_detection != NO_DETECTION) {
      s.tp++;
      s.v.push_back(det[det_idx].score);
      assigned[det_idx] = true;
    }
  }

  if (compute_fp) {
    for (size_t j = 0; j < det.size(); j++) {
      if (!assigned[j] && ignored_det[j] == 0 && !ignored_threshold[j]) s.fp++;
    }
    // subtract detections covering dontcare areas
    int nstuff = 0;
    for (const auto &dc : cg.dontcare) {
      for (size_t j = 0; j < det.size(); j++) {
        if (assigned[j] || ignored_det[j] != 0 || ignored_threshold[j]) continue;
        if (imageBoxOverlap(det[j], dc) > min_overlap) {
          assigned[j] = true;
          nstuff++;
        }
      }
    }
    s.fp -= nstuff;
  }
  return s;
}

static std::vector<double> getThresholds(std::vector<double> v, int n_gt) {
  std::sort(v.begin(), v.end(), std::greater<double>());
  std::vector<double> t;
  double current_recall = 0;
  for (size_t i = 0; i < v.size(); i++) {
    double l_recall = (double)(i + 1) / n_gt;
    double r_recall =
        (i < v.size() - 1) ? (double)(i + 2) / n_gt : l_recall;
    if ((r_recall - current_recall) < (current_recall - l_recall) &&
        i < v.size() - 1)
      continue;
    t.push_back(v[i]);
    current_recall += 1.0 / (N_SAMPLE_PTS - 1.0);
  }
  return t;
}

struct FrameData {
  std::vector<Box> gt, det;
};

static double evalClass(Metric metric, const std::string &cls, int difficulty,
                        const std::vector<FrameData> &frames,
                        double min_overlap, double depth_thresh,
                        std::vector<double> *precision_out) {
  // pass 1: collect tp scores to pick recall thresholds
  std::vector<double> v;
  int n_gt = 0;
  std::vector<CleanedGt> cleaned(frames.size());
  std::vector<std::vector<int>> ig_det(frames.size());
  for (size_t f = 0; f < frames.size(); f++) {
    cleaned[f] = cleanGt(frames[f].gt, cls, difficulty, depth_thresh);
    ig_det[f] = cleanDet(frames[f].det, cls, difficulty);
    Stats s = computeStatistics(metric, frames[f].gt, frames[f].det, cleaned[f],
                                ig_det[f], false, min_overlap, 0.0);
    v.insert(v.end(), s.v.begin(), s.v.end());
    n_gt += cleaned[f].n_gt;
  }
  if (n_gt == 0) return -1.0;
  std::vector<double> thresholds = getThresholds(v, n_gt);

  // pass 2: pr curve over thresholds
  std::vector<double> precision(N_SAMPLE_PTS, 0.0);
  std::vector<Stats> pr(thresholds.size());
  for (size_t f = 0; f < frames.size(); f++) {
    for (size_t t = 0; t < thresholds.size(); t++) {
      Stats s = computeStatistics(metric, frames[f].gt, frames[f].det,
                                  cleaned[f], ig_det[f], true, min_overlap,
                                  thresholds[t]);
      pr[t].tp += s.tp;
      pr[t].fp += s.fp;
      pr[t].fn += s.fn;
    }
  }
  for (size_t t = 0; t < thresholds.size(); t++) {
    precision[t] = pr[t].tp / std::max(pr[t].tp + pr[t].fp, 1.0);
  }
  // monotone smoothing: precision[i] = max precision at recall >= i
  for (int i = (int)N_SAMPLE_PTS - 2; i >= 0; i--) {
    precision[i] = std::max(precision[i], precision[i + 1]);
  }
  double ap = std::accumulate(precision.begin(), precision.end(), 0.0) /
              N_SAMPLE_PTS * 100.0;
  if (precision_out) *precision_out = precision;
  return ap;
}

// ------------------------------------------------------------------- main
static std::vector<std::string> listIds(const std::string &dir) {
  std::vector<std::string> ids;
  DIR *d = opendir(dir.c_str());
  if (!d) return ids;
  struct dirent *e;
  while ((e = readdir(d)) != nullptr) {
    std::string name = e->d_name;
    if (name.size() > 4 && name.substr(name.size() - 4) == ".txt")
      ids.push_back(name.substr(0, name.size() - 4));
  }
  closedir(d);
  std::sort(ids.begin(), ids.end());
  return ids;
}

int main(int argc, char **argv) {
  std::string gt_dir, det_dir, ids_file, cls = "car", metric_s = "all";
  double min_overlap = 0.7, depth = 0.0;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    auto next = [&]() { return std::string(argv[++i]); };
    if (a == "--gt_dir") gt_dir = next();
    else if (a == "--det_dir") det_dir = next();
    else if (a == "--ids") ids_file = next();
    else if (a == "--class") cls = lower(next());
    else if (a == "--min_overlap") min_overlap = atof(next().c_str());
    else if (a == "--depth") depth = atof(next().c_str());
    else if (a == "--metric") metric_s = next();
    else {
      fprintf(stderr, "unknown arg: %s\n", a.c_str());
      return 1;
    }
  }
  if (gt_dir.empty() || det_dir.empty()) {
    fprintf(stderr,
            "usage: kitti_eval --gt_dir DIR --det_dir DIR [--ids FILE] "
            "[--class car] [--min_overlap 0.7] [--depth 0] [--metric all]\n");
    return 1;
  }

  std::vector<std::string> ids;
  if (!ids_file.empty()) {
    std::ifstream f(ids_file);
    std::string line;
    while (std::getline(f, line)) {
      if (!line.empty()) ids.push_back(line);
    }
  } else {
    ids = listIds(gt_dir);
  }

  std::vector<FrameData> frames;
  for (const auto &id : ids) {
    FrameData fd;
    bool ok1, ok2;
    fd.gt = loadBoxes(gt_dir + "/" + id + ".txt", ok1);
    fd.det = loadBoxes(det_dir + "/" + id + ".txt", ok2);
    if (!ok1) {
      fprintf(stderr, "missing gt file for id %s\n", id.c_str());
      return 1;
    }
    frames.push_back(fd);
  }
  printf("evaluating %zu frames, class=%s, min_overlap=%.2f, depth=%.0f\n",
         frames.size(), cls.c_str(), min_overlap, depth);

  const char *mnames[3] = {"2D  ", "BEV ", "3D  "};
  const char *dnames[3] = {"easy", "moderate", "hard"};
  for (int m = 0; m < 3; m++) {
    if (metric_s != "all" &&
        !(metric_s == "2d" && m == 0) && !(metric_s == "bev" && m == 1) &&
        !(metric_s == "3d" && m == 2))
      continue;
    printf("AP_%s ", mnames[m]);
    for (int d = 0; d < 3; d++) {
      double ap = evalClass((Metric)m, cls, d, frames, min_overlap, depth,
                            nullptr);
      if (ap < 0) printf("%s: n/a  ", dnames[d]);
      else printf("%s: %.2f  ", dnames[d], ap);
    }
    printf("\n");
  }
  return 0;
}
