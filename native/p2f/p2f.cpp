// p2f: point-to-mesh distance tool.
//
// Drop-in replacement for the reference's CGAL-based `evaluation` binary
// (reference evaluation/evaluation_code/evaluation.cpp:126-238): reads an
// OFF mesh and an .xyz prediction, locates the closest point on the mesh
// surface for every predicted point via an AABB-BVH over triangles, writes
// `<pred>_point2mesh_distance.xyz` lines "x y z dist", and prints the mean
// and standard deviation of the distances.
//
// No CGAL dependency: median-split BVH + exact point-triangle closest-point
// (Ericson, Real-Time Collision Detection §5.1.5), multithreaded over
// points.
//
// Usage: ./p2f mesh.off pred.xyz [n_threads]

#include <algorithm>
#include <array>
#include <cfloat>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

struct V3 {
  double x = 0, y = 0, z = 0;
  V3() = default;
  V3(double a, double b, double c) : x(a), y(b), z(c) {}
  V3 operator+(const V3 &o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator-(const V3 &o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator*(double s) const { return {x * s, y * s, z * s}; }
};
static double dot(const V3 &a, const V3 &b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
[[maybe_unused]] static V3 cross(const V3 &a, const V3 &b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static double norm2(const V3 &a) { return dot(a, a); }

// Closest point on triangle (a, b, c) to p.
static V3 closest_on_triangle(const V3 &p, const V3 &a, const V3 &b,
                              const V3 &c) {
  V3 ab = b - a, ac = c - a, ap = p - a;
  double d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) return a;
  V3 bp = p - b;
  double d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) return b;
  double vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    double v = d1 / (d1 - d3);
    return a + ab * v;
  }
  V3 cp = p - c;
  double d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) return c;
  double vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    double w = d2 / (d2 - d6);
    return a + ac * w;
  }
  double va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    double w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    return b + (c - b) * w;
  }
  double denom = 1.0 / (va + vb + vc);
  double v = vb * denom, w = vc * denom;
  return a + ab * v + ac * w;
}

struct AABB {
  V3 lo{DBL_MAX, DBL_MAX, DBL_MAX}, hi{-DBL_MAX, -DBL_MAX, -DBL_MAX};
  void grow(const V3 &p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y);
    lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y);
    hi.z = std::max(hi.z, p.z);
  }
  void grow(const AABB &o) { grow(o.lo); grow(o.hi); }
  double dist2(const V3 &p) const {
    double d = 0, t;
    t = std::max({lo.x - p.x, 0.0, p.x - hi.x}); d += t * t;
    t = std::max({lo.y - p.y, 0.0, p.y - hi.y}); d += t * t;
    t = std::max({lo.z - p.z, 0.0, p.z - hi.z}); d += t * t;
    return d;
  }
};

struct BVH {
  struct Node {
    AABB box;
    int left = -1, right = -1;   // children, or -1 for leaf
    int begin = 0, end = 0;      // triangle range for leaves
  };
  std::vector<Node> nodes;
  std::vector<int> tri_order;
  const std::vector<std::array<V3, 3>> *tris = nullptr;

  void build(const std::vector<std::array<V3, 3>> &triangles) {
    tris = &triangles;
    tri_order.resize(triangles.size());
    for (size_t i = 0; i < triangles.size(); ++i) tri_order[i] = (int)i;
    nodes.reserve(triangles.size() * 2);
    build_node(0, (int)triangles.size());
  }

  int build_node(int begin, int end) {
    int idx = (int)nodes.size();
    nodes.emplace_back();
    AABB box;
    for (int i = begin; i < end; ++i)
      for (const V3 &v : (*tris)[tri_order[i]]) box.grow(v);
    nodes[idx].box = box;
    if (end - begin <= 4) {
      nodes[idx].begin = begin;
      nodes[idx].end = end;
      return idx;
    }
    V3 ext = box.hi - box.lo;
    int axis = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2)
                             : (ext.y > ext.z ? 1 : 2);
    int mid = (begin + end) / 2;
    std::nth_element(
        tri_order.begin() + begin, tri_order.begin() + mid,
        tri_order.begin() + end, [&](int a, int b) {
          auto cen = [&](int t, int ax) {
            const auto &T = (*tris)[t];
            double c = (ax == 0 ? T[0].x + T[1].x + T[2].x
                        : ax == 1 ? T[0].y + T[1].y + T[2].y
                                  : T[0].z + T[1].z + T[2].z);
            return c;
          };
          return cen(a, axis) < cen(b, axis);
        });
    int l = build_node(begin, mid);
    int r = build_node(mid, end);
    nodes[idx].left = l;
    nodes[idx].right = r;
    return idx;
  }

  double closest_dist(const V3 &p) const {
    double best = DBL_MAX;
    closest_rec(0, p, best);
    return std::sqrt(best);
  }

  void closest_rec(int ni, const V3 &p, double &best) const {
    const Node &n = nodes[ni];
    if (n.box.dist2(p) >= best) return;
    if (n.left < 0) {
      for (int i = n.begin; i < n.end; ++i) {
        const auto &T = (*tris)[tri_order[i]];
        V3 q = closest_on_triangle(p, T[0], T[1], T[2]);
        best = std::min(best, norm2(p - q));
      }
      return;
    }
    double dl = nodes[n.left].box.dist2(p);
    double dr = nodes[n.right].box.dist2(p);
    if (dl < dr) {
      closest_rec(n.left, p, best);
      closest_rec(n.right, p, best);
    } else {
      closest_rec(n.right, p, best);
      closest_rec(n.left, p, best);
    }
  }
};

static bool load_off(const std::string &path,
                     std::vector<std::array<V3, 3>> &tris) {
  std::ifstream f(path);
  if (!f) return false;
  std::vector<std::string> tok;
  std::string s;
  while (f >> s) tok.push_back(s);
  size_t ptr = 0;
  if (tok.empty()) return false;
  if (tok[0].rfind("OFF", 0) == 0) {
    std::string rest = tok[0].substr(3);
    if (!rest.empty()) tok[0] = rest; else ++ptr;
  }
  long nv = std::stol(tok[ptr]), nf = std::stol(tok[ptr + 1]);
  ptr += 3;  // skip edge count
  std::vector<V3> verts(nv);
  for (long i = 0; i < nv; ++i) {
    verts[i] = {std::stod(tok[ptr]), std::stod(tok[ptr + 1]),
                std::stod(tok[ptr + 2])};
    ptr += 3;
  }
  for (long i = 0; i < nf; ++i) {
    int k = std::stoi(tok[ptr++]);
    std::vector<int> poly(k);
    for (int j = 0; j < k; ++j) poly[j] = std::stoi(tok[ptr++]);
    for (int j = 1; j + 1 < k; ++j)
      tris.push_back({verts[poly[0]], verts[poly[j]], verts[poly[j + 1]]});
  }
  return true;
}

int main(int argc, char **argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s mesh.off pred.xyz [n_threads]\n",
                 argv[0]);
    return 1;
  }
  std::string mesh_path = argv[1], pred_path = argv[2];
  int n_threads = argc > 3 ? std::atoi(argv[3])
                           : (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;

  std::vector<std::array<V3, 3>> tris;
  if (!load_off(mesh_path, tris) || tris.empty()) {
    std::fprintf(stderr, "failed to read mesh %s\n", mesh_path.c_str());
    return 1;
  }
  std::vector<V3> points;
  {
    std::ifstream f(pred_path);
    if (!f) {
      std::fprintf(stderr, "failed to read points %s\n", pred_path.c_str());
      return 1;
    }
    std::string line;
    while (std::getline(f, line)) {
      std::istringstream iss(line);
      V3 p;
      if (iss >> p.x >> p.y >> p.z) points.push_back(p);
    }
  }

  BVH bvh;
  bvh.build(tris);

  std::vector<double> dist(points.size());
  std::vector<std::thread> workers;
  size_t chunk = (points.size() + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    size_t b = t * chunk, e = std::min(points.size(), b + chunk);
    if (b >= e) break;
    workers.emplace_back([&, b, e]() {
      for (size_t i = b; i < e; ++i) dist[i] = bvh.closest_dist(points[i]);
    });
  }
  for (auto &w : workers) w.join();

  // output contract: "<pred minus .xyz>_point2mesh_distance.xyz"
  std::string out_path = pred_path;
  const std::string ext = ".xyz";
  if (out_path.size() > ext.size() &&
      out_path.compare(out_path.size() - ext.size(), ext.size(), ext) == 0)
    out_path = out_path.substr(0, out_path.size() - ext.size());
  out_path += "_point2mesh_distance.xyz";
  std::ofstream out(out_path);
  double sum = 0;
  for (size_t i = 0; i < points.size(); ++i) {
    out << points[i].x << ' ' << points[i].y << ' ' << points[i].z << ' '
        << dist[i] << '\n';
    sum += dist[i];
  }
  double mean = sum / (double)points.size();
  double var = 0;
  for (double d : dist) var += (d - mean) * (d - mean);
  var /= (double)points.size();
  std::printf("p2f avg: %.8f\np2f std: %.8f\n", mean, std::sqrt(var));
  return 0;
}
