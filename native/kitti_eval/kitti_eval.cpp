// KITTI offline detection evaluator: 2D / BEV / 3D AP + heading similarity
// (AHS), Car/Pedestrian/Cyclist, easy/moderate/hard, 41 recall points.
//
// Fresh implementation of the official KITTI object-detection evaluation
// protocol (Geiger et al., CVPR'12 devkit semantics), replacing the
// reference's scripts/offline_eval/kitti_native_eval C++ with an independent
// codebase. Differences from the devkit are implementation-internal only:
// rotated-rectangle overlap uses the Green's-theorem line-integral form (the
// same formulation as the TPU kernels in this repo), and everything is plain
// C++17 without boost.
//
// Usage: kitti_eval <gt_dir> <det_dir> <out_dir>
//   gt_dir:  KITTI label_2-style ground-truth txts
//   det_dir: detection txts (16-column KITTI rows with trailing score)
//   out_dir: stats_<class>_<metric>.txt files (3 rows easy/mod/hard, 41
//            precision values each) + summary on stdout.

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

constexpr int kNumRecallPts = 41;
constexpr double kRecallStep = 1.0 / (kNumRecallPts - 1);

enum Difficulty { EASY = 0, MODERATE = 1, HARD = 2 };
const double kMinHeight[3] = {40.0, 25.0, 25.0};
const int kMaxOcclusion[3] = {0, 1, 2};
const double kMaxTruncation[3] = {0.15, 0.30, 0.50};

enum Metric { METRIC_2D = 0, METRIC_BEV = 1, METRIC_3D = 2 };
const char* kMetricNames[3] = {"detection_2d", "detection_bev", "detection_3d"};

struct Box {
  std::string type;
  double trunc = 0, occ = 0, alpha = 0;
  double x1 = 0, y1 = 0, x2 = 0, y2 = 0;       // image box
  double h = 0, w = 0, l = 0;                  // dimensions
  double x = 0, y = 0, z = 0, ry = 0;          // location + heading
  double score = 0;
};

struct ClassSpec {
  std::string name;
  std::vector<std::string> neighbors;   // classes treated as "ignored"
};

const std::vector<ClassSpec> kClasses = {
    {"Car", {"Van"}},
    {"Pedestrian", {"Person_sitting"}},
    {"Cyclist", {}},
};

// Minimum overlap per [metric][class] (class order = kClasses). The standard
// protocol uses 0.7 car / 0.5 ped+cyc for every metric; the reference also
// ships a relaxed variant (evaluate_object_3d_offline_05_iou.cpp:55) that
// halves the BEV/3D thresholds: {0.5 car, 0.25 ped+cyc}, 2D unchanged.
const double kMinOverlapStandard[3][3] = {
    {0.7, 0.5, 0.5}, {0.7, 0.5, 0.5}, {0.7, 0.5, 0.5}};
const double kMinOverlapLow[3][3] = {
    {0.7, 0.5, 0.5}, {0.5, 0.25, 0.25}, {0.5, 0.25, 0.25}};

// ---------------------------------------------------------------------------
// Geometry
// ---------------------------------------------------------------------------

double Image2DIoU(const Box& a, const Box& b) {
  double iw = std::min(a.x2, b.x2) - std::max(a.x1, b.x1);
  double ih = std::min(a.y2, b.y2) - std::max(a.y1, b.y1);
  if (iw <= 0 || ih <= 0) return 0;
  double inter = iw * ih;
  double ua = (a.x2 - a.x1) * (a.y2 - a.y1) + (b.x2 - b.x1) * (b.y2 - b.y1) - inter;
  return ua > 0 ? inter / ua : 0;
}

struct Pt {
  double x, z;
};

// CCW BEV footprint corners of a box_3d.
void BevCorners(const Box& b, Pt out[4]) {
  const double c = std::cos(b.ry), s = std::sin(b.ry);
  const double signs[4][2] = {{-1, -1}, {1, -1}, {1, 1}, {-1, 1}};
  for (int i = 0; i < 4; ++i) {
    double dx = signs[i][0] * b.l / 2.0, dz = signs[i][1] * b.w / 2.0;
    out[i] = {dx * c + dz * s + b.x, -dx * s + dz * c + b.z};
  }
}

// Line-integral sum of A's edges clipped to convex CCW quad B.
// Shared-boundary degeneracies (same rule as the TPU kernel,
// heterofusionrcnn_tpu/core/rotated_iou.py): when drop_same_dir_collinear,
// an A-edge lying exactly on a B-edge with the same direction is excluded —
// identical boxes then count their boundary once, while opposite-direction
// coincidence (touching boxes) cancels between the two passes.
double EdgesInQuadIntegral(const Pt a[4], const Pt b[4],
                           bool drop_same_dir_collinear) {
  constexpr double kEps = 1e-9;
  double total = 0;
  for (int e = 0; e < 4; ++e) {
    const Pt &p = a[e], &q = a[(e + 1) % 4];
    double t0 = 0, t1 = 1;
    for (int h = 0; h < 4 && t1 > t0; ++h) {
      const Pt &h0 = b[h], &h1 = b[(h + 1) % 4];
      double ex = h1.x - h0.x, ez = h1.z - h0.z;
      double d0 = ex * (p.z - h0.z) - ez * (p.x - h0.x);
      double d1 = ex * (q.z - h0.z) - ez * (q.x - h0.x);
      if (d0 < 0 && d1 < 0) {
        t1 = -1;
        break;
      }
      if (drop_same_dir_collinear && std::fabs(d0) <= kEps &&
          std::fabs(d1) <= kEps && (q.x - p.x) * ex + (q.z - p.z) * ez > 0) {
        t1 = -1;
        break;
      }
      if (d0 < 0 || d1 < 0) {
        double tc = d0 / (d0 - d1);
        if (d0 < 0)
          t0 = std::max(t0, tc);
        else
          t1 = std::min(t1, tc);
      }
    }
    if (t1 > t0) total += (t1 - t0) * (p.x * q.z - p.z * q.x);
  }
  return total;
}

double BevOverlap(const Box& a, const Box& b) {
  Pt ca[4], cb[4];
  BevCorners(a, ca);
  BevCorners(b, cb);
  double total = EdgesInQuadIntegral(ca, cb, false) +
                 EdgesInQuadIntegral(cb, ca, true);
  return std::max(0.5 * total, 0.0);
}

double BevIoU(const Box& a, const Box& b) {
  double inter = BevOverlap(a, b);
  double ua = a.l * a.w + b.l * b.w - inter;
  return ua > 0 ? inter / ua : 0;
}

double Iou3D(const Box& a, const Box& b) {
  double inter_bev = BevOverlap(a, b);
  double ymax = std::min(a.y, b.y);                 // y points down; bottom=y
  double ymin = std::max(a.y - a.h, b.y - b.h);
  double ih = std::max(ymax - ymin, 0.0);
  double inter = inter_bev * ih;
  double ua = a.l * a.w * a.h + b.l * b.w * b.h - inter;
  return ua > 0 ? inter / ua : 0;
}

double Overlap(const Box& a, const Box& b, Metric m) {
  switch (m) {
    case METRIC_2D: return Image2DIoU(a, b);
    case METRIC_BEV: return BevIoU(a, b);
    default: return Iou3D(a, b);
  }
}

// ---------------------------------------------------------------------------
// IO
// ---------------------------------------------------------------------------

std::vector<Box> LoadBoxes(const std::string& path, bool with_score) {
  std::vector<Box> boxes;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    Box b;
    ss >> b.type >> b.trunc >> b.occ >> b.alpha >> b.x1 >> b.y1 >> b.x2 >>
        b.y2 >> b.h >> b.w >> b.l >> b.x >> b.y >> b.z >> b.ry;
    if (b.type.empty()) continue;
    if (with_score) ss >> b.score;
    boxes.push_back(b);
  }
  return boxes;
}

std::vector<std::string> ListSamples(const std::string& det_dir) {
  std::vector<std::string> names;
  DIR* d = opendir(det_dir.c_str());
  if (!d) return names;
  while (dirent* ent = readdir(d)) {
    std::string n = ent->d_name;
    if (n.size() > 4 && n.substr(n.size() - 4) == ".txt")
      names.push_back(n.substr(0, n.size() - 4));
  }
  closedir(d);
  std::sort(names.begin(), names.end());
  return names;
}

// ---------------------------------------------------------------------------
// Evaluation core (official protocol)
// ---------------------------------------------------------------------------

// Ground-truth status w.r.t. a class+difficulty: valid (counts toward
// recall), ignored (matches neither count as TP nor FP), or irrelevant.
enum GtStatus { GT_VALID, GT_IGNORED, GT_IRRELEVANT };

GtStatus ClassifyGt(const Box& gt, const ClassSpec& cls, int difficulty) {
  bool same = gt.type == cls.name;
  bool neighbor =
      std::find(cls.neighbors.begin(), cls.neighbors.end(), gt.type) !=
      cls.neighbors.end();
  if (!same && !neighbor) return GT_IRRELEVANT;

  double height = gt.y2 - gt.y1;
  bool meets = gt.occ <= kMaxOcclusion[difficulty] &&
               gt.trunc <= kMaxTruncation[difficulty] &&
               height >= kMinHeight[difficulty];
  if (same && meets) return GT_VALID;
  return GT_IGNORED;  // same class failing difficulty, or neighbor class
}

// Detections too small for this difficulty are ignored rather than FP.
bool DetIgnored(const Box& det, int difficulty) {
  return (det.y2 - det.y1) < kMinHeight[difficulty];
}

struct SampleData {
  std::vector<Box> gts;
  std::vector<Box> dets;
  std::vector<Box> dontcare;
};

struct Counts {
  double tp = 0, fp = 0, fn = 0, similarity = 0;
};

// One assignment pass over a sample at a score threshold.
// When collect_thresholds != nullptr, runs in "recall discovery" mode:
// gathers the scores of detections matched to valid GTs.
Counts EvalSample(const SampleData& s, const ClassSpec& cls, int difficulty,
                  Metric metric, double min_iou, double thresh,
                  std::vector<double>* collect_thresholds) {
  Counts out;
  const size_t ng = s.gts.size(), nd = s.dets.size();
  std::vector<GtStatus> gt_status(ng);
  for (size_t i = 0; i < ng; ++i)
    gt_status[i] = ClassifyGt(s.gts[i], cls, difficulty);

  std::vector<bool> det_assigned(nd, false);
  std::vector<bool> det_is_tp(nd, false);
  std::vector<bool> det_ignored(nd, false);
  for (size_t j = 0; j < nd; ++j)
    det_ignored[j] = DetIgnored(s.dets[j], difficulty);

  // Greedy: each valid GT takes its best det; ignored GTs absorb
  // overlapping dets afterwards.
  for (size_t i = 0; i < ng; ++i) {
    if (gt_status[i] != GT_VALID) continue;
    int best = -1;
    double best_score = -1e18;
    double best_iou = 0;
    for (size_t j = 0; j < nd; ++j) {
      if (det_assigned[j]) continue;
      if (s.dets[j].type != cls.name) continue;
      if (!collect_thresholds && s.dets[j].score < thresh) continue;
      double o = Overlap(s.gts[i], s.dets[j], metric);
      if (o < min_iou) continue;
      // Official rule: prefer the highest-score detection above min IoU
      // (with max-IoU tie-break in threshold-discovery mode).
      if (collect_thresholds) {
        if (o > best_iou) {
          best_iou = o;
          best = (int)j;
        }
      } else if (s.dets[j].score > best_score) {
        best_score = s.dets[j].score;
        best = (int)j;
      }
    }
    if (best >= 0) {
      det_assigned[best] = true;
      det_is_tp[best] = true;
      out.tp += 1;
      double d = std::fabs(s.gts[i].ry - s.dets[best].ry);
      out.similarity += (1.0 + std::cos(d)) / 2.0;
      if (collect_thresholds) collect_thresholds->push_back(s.dets[best].score);
    } else {
      out.fn += 1;
    }
  }
  if (collect_thresholds) return out;

  // Absorb detections overlapping ignored GTs or DontCare regions.
  for (size_t j = 0; j < nd; ++j) {
    if (det_assigned[j] || det_is_tp[j]) continue;
    if (s.dets[j].type != cls.name || s.dets[j].score < thresh) continue;
    bool absorbed = det_ignored[j];
    if (!absorbed) {
      for (size_t i = 0; i < ng && !absorbed; ++i) {
        if (gt_status[i] != GT_IGNORED) continue;
        if (Overlap(s.gts[i], s.dets[j], metric) >= min_iou) absorbed = true;
      }
    }
    if (!absorbed) {
      for (const Box& dc : s.dontcare) {
        // DontCare only has a 2D box: use 2D overlap-over-detection-area.
        double iw = std::min(dc.x2, s.dets[j].x2) - std::max(dc.x1, s.dets[j].x1);
        double ih = std::min(dc.y2, s.dets[j].y2) - std::max(dc.y1, s.dets[j].y1);
        double area = (s.dets[j].x2 - s.dets[j].x1) * (s.dets[j].y2 - s.dets[j].y1);
        if (iw > 0 && ih > 0 && area > 0 && iw * ih / area > 0.5) {
          absorbed = true;
          break;
        }
      }
    }
    if (!absorbed) out.fp += 1;
  }
  return out;
}

struct PRCurve {
  double precision[kNumRecallPts] = {0};
  double similarity[kNumRecallPts] = {0};  // AHS numerator (normalized)
  double ap = 0, ahs = 0;
};

PRCurve EvaluateClass(const std::vector<SampleData>& samples,
                      const ClassSpec& cls, int difficulty, Metric metric,
                      double min_iou) {
  PRCurve curve;

  // 1) discover score thresholds at the 41 recall fractions.
  std::vector<double> matched_scores;
  double total_valid_gt = 0;
  for (const auto& s : samples) {
    EvalSample(s, cls, difficulty, metric, min_iou, -1e18, &matched_scores);
    for (const auto& gt : s.gts)
      if (ClassifyGt(gt, cls, difficulty) == GT_VALID) total_valid_gt += 1;
  }
  if (total_valid_gt == 0) return curve;
  std::sort(matched_scores.rbegin(), matched_scores.rend());

  std::vector<double> thresholds;
  double current_recall = 0;
  for (size_t i = 0; i < matched_scores.size(); ++i) {
    double left = (i + 1) / total_valid_gt;
    double right = i + 2 <= matched_scores.size()
                       ? (i + 2) / total_valid_gt
                       : left;
    if (left >= current_recall &&
        (i + 1 == matched_scores.size() ||
         std::fabs(left - current_recall) < std::fabs(right - current_recall))) {
      thresholds.push_back(matched_scores[i]);
      current_recall += kRecallStep;
    }
  }

  // 2) precision at each threshold.
  for (size_t t = 0; t < thresholds.size() && t < kNumRecallPts; ++t) {
    Counts total;
    for (const auto& s : samples) {
      Counts c =
          EvalSample(s, cls, difficulty, metric, min_iou, thresholds[t], nullptr);
      total.tp += c.tp;
      total.fp += c.fp;
      total.fn += c.fn;
      total.similarity += c.similarity;
    }
    double denom = total.tp + total.fp;
    curve.precision[t] = denom > 0 ? total.tp / denom : 0;
    curve.similarity[t] = denom > 0 ? total.similarity / denom : 0;
  }

  // 3) monotonize right-to-left, AP = mean over the 41 points.
  for (int i = kNumRecallPts - 2; i >= 0; --i) {
    curve.precision[i] = std::max(curve.precision[i], curve.precision[i + 1]);
    curve.similarity[i] = std::max(curve.similarity[i], curve.similarity[i + 1]);
  }
  for (int i = 0; i < kNumRecallPts; ++i) {
    curve.ap += curve.precision[i];
    curve.ahs += curve.similarity[i];
  }
  curve.ap = curve.ap / kNumRecallPts * 100.0;
  curve.ahs = curve.ahs / kNumRecallPts * 100.0;
  return curve;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <gt_dir> <det_dir> <out_dir> [low_iou]\n"
                 "  low_iou: relaxed BEV/3D thresholds (0.5 car, 0.25\n"
                 "  ped/cyc) matching the reference's _05_iou evaluator\n",
                 argv[0]);
    return 1;
  }
  std::string gt_dir = argv[1], det_dir = argv[2], out_dir = argv[3];
  bool low_iou = argc > 4 && std::string(argv[4]) == "low_iou";
  const double(&min_overlap)[3][3] =
      low_iou ? kMinOverlapLow : kMinOverlapStandard;

  std::vector<std::string> names = ListSamples(det_dir);
  if (names.empty()) {
    std::fprintf(stderr, "no detection files in %s\n", det_dir.c_str());
    return 1;
  }

  std::vector<SampleData> samples;
  samples.reserve(names.size());
  for (const auto& n : names) {
    SampleData s;
    for (Box& b : LoadBoxes(gt_dir + "/" + n + ".txt", false)) {
      if (b.type == "DontCare")
        s.dontcare.push_back(b);
      else
        s.gts.push_back(b);
    }
    s.dets = LoadBoxes(det_dir + "/" + n + ".txt", true);
    samples.push_back(std::move(s));
  }
  std::printf("loaded %zu samples\n", samples.size());

  for (size_t c = 0; c < kClasses.size(); ++c) {
    const ClassSpec& cls = kClasses[c];
    for (int m = 0; m < 3; ++m) {
      PRCurve curves[3];
      for (int d = 0; d < 3; ++d)
        curves[d] = EvaluateClass(samples, cls, d, (Metric)m, min_overlap[m][c]);

      std::string lower = cls.name;
      std::transform(lower.begin(), lower.end(), lower.begin(), ::tolower);
      std::string stats_path =
          out_dir + "/stats_" + lower + "_" + kMetricNames[m] + ".txt";
      std::ofstream sf(stats_path);
      for (int d = 0; d < 3; ++d) {
        for (int i = 0; i < kNumRecallPts; ++i)
          sf << curves[d].precision[i] << (i + 1 < kNumRecallPts ? " " : "\n");
      }
      std::printf("%s_%s AP: %.4f %.4f %.4f\n", lower.c_str(), kMetricNames[m],
                  curves[0].ap, curves[1].ap, curves[2].ap);
      if (m == METRIC_3D)
        std::printf("%s_heading_3d AHS: %.4f %.4f %.4f\n", lower.c_str(),
                    curves[0].ahs, curves[1].ahs, curves[2].ahs);
    }
  }
  return 0;
}
