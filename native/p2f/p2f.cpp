// p2f: point-to-mesh distance + surface-uniformity sampling tool.
//
// Drop-in replacement for the reference's CGAL-based `evaluation` binary
// (reference evaluation/evaluation_code/evaluation.cpp:126-238): reads an
// OFF mesh and an .xyz prediction, locates the closest point on the mesh
// surface for every predicted point via an AABB-BVH over triangles, writes
// `<pred>_point2mesh_distance.xyz` lines "x y z dist", and prints the mean
// and standard deviation of the distances.
//
// `--uniform` additionally makes the reference's *dead* disk-density path
// live (evaluation.cpp:74-114 is never called from its main): it samples
// `--samples` (default 1000) points uniformly by area on the surface,
// derives one geodesic radius per area percentage
// (pi*r_j^2 = p_j * total_area, p_j in {0.4,0.6,0.8,1.0,1.2}%), counts the
// predicted points whose mapped surface locations lie within geodesic
// distance r_j of each sample, and writes the side-files
// `evaluate.py:116-165` consumes:
//   <pred>_disk_idx.txt              "density:i0 i1 ..." rows, samples x 5
//   <pred>_radius.txt                one radius per percentage
//   <pred>_point2mesh_distance.txt   "x y z dist mx my mz" (cols 4: = the
//                                    mapped points, as `load(...)[:,4:]`)
//
// Geodesics: the reference uses CGAL's exact Surface_mesh_shortest_path;
// here geodesic distance is approximated by a bounded Dijkstra over a graph
// of mesh vertices + STEINER_PER_EDGE evenly spaced points per edge +
// embedded terminals (samples, mapped predictions), with a complete
// straight-line clique inside every face. Validated against closed-form
// great-circle distances on a sphere fixture (tests/test_p2f.py) to ~2%,
// which is well inside the disk-membership noise of the metric.
//
// No CGAL dependency: median-split BVH + exact point-triangle closest-point
// (Ericson, Real-Time Collision Detection 5.1.5), multithreaded over
// points and over Dijkstra sources.
//
// Usage: ./p2f mesh.off pred.xyz [n_threads] [--uniform] [--seed N]
//        [--samples N]

#include <algorithm>
#include <array>
#include <cerrno>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <queue>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
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
static V3 cross(const V3 &a, const V3 &b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static double norm2(const V3 &a) { return dot(a, a); }
static double norm(const V3 &a) { return std::sqrt(dot(a, a)); }

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
  double dist2(const V3 &p) const {
    double d = 0, t;
    t = std::max({lo.x - p.x, 0.0, p.x - hi.x}); d += t * t;
    t = std::max({lo.y - p.y, 0.0, p.y - hi.y}); d += t * t;
    t = std::max({lo.z - p.z, 0.0, p.z - hi.z}); d += t * t;
    return d;
  }
};

struct Mesh {
  std::vector<V3> verts;
  std::vector<std::array<int, 3>> faces;  // triangulated
  V3 corner(int f, int k) const { return verts[faces[f][k]]; }
};

struct Hit {
  double dist = DBL_MAX;
  V3 point;
  int face = -1;
};

struct BVH {
  struct Node {
    AABB box;
    int left = -1, right = -1;   // children, or -1 for leaf
    int begin = 0, end = 0;      // triangle range for leaves
  };
  std::vector<Node> nodes;
  std::vector<int> tri_order;
  const Mesh *mesh = nullptr;

  void build(const Mesh &m) {
    mesh = &m;
    tri_order.resize(m.faces.size());
    for (size_t i = 0; i < m.faces.size(); ++i) tri_order[i] = (int)i;
    nodes.reserve(m.faces.size() * 2);
    build_node(0, (int)m.faces.size());
  }

  int build_node(int begin, int end) {
    int idx = (int)nodes.size();
    nodes.emplace_back();
    AABB box;
    for (int i = begin; i < end; ++i)
      for (int k = 0; k < 3; ++k) box.grow(mesh->corner(tri_order[i], k));
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
            double c = 0;
            for (int k = 0; k < 3; ++k) {
              const V3 &v = mesh->corner(t, k);
              c += (ax == 0 ? v.x : ax == 1 ? v.y : v.z);
            }
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

  Hit closest(const V3 &p) const {
    Hit h;
    double best2 = DBL_MAX;
    closest_rec(0, p, best2, h);
    h.dist = std::sqrt(best2);
    return h;
  }

  void closest_rec(int ni, const V3 &p, double &best2, Hit &h) const {
    const Node &n = nodes[ni];
    if (n.box.dist2(p) >= best2) return;
    if (n.left < 0) {
      for (int i = n.begin; i < n.end; ++i) {
        int f = tri_order[i];
        V3 q = closest_on_triangle(p, mesh->corner(f, 0), mesh->corner(f, 1),
                                   mesh->corner(f, 2));
        double d2 = norm2(p - q);
        if (d2 < best2) {
          best2 = d2;
          h.point = q;
          h.face = f;
        }
      }
      return;
    }
    double dl = nodes[n.left].box.dist2(p);
    double dr = nodes[n.right].box.dist2(p);
    if (dl < dr) {
      closest_rec(n.left, p, best2, h);
      closest_rec(n.right, p, best2, h);
    } else {
      closest_rec(n.right, p, best2, h);
      closest_rec(n.left, p, best2, h);
    }
  }
};

static bool load_off(const std::string &path, Mesh &mesh) {
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
  mesh.verts.resize(nv);
  for (long i = 0; i < nv; ++i) {
    mesh.verts[i] = {std::stod(tok[ptr]), std::stod(tok[ptr + 1]),
                     std::stod(tok[ptr + 2])};
    ptr += 3;
  }
  for (long i = 0; i < nf; ++i) {
    int k = std::stoi(tok[ptr++]);
    std::vector<int> poly(k);
    for (int j = 0; j < k; ++j) poly[j] = std::stoi(tok[ptr++]);
    for (int j = 1; j + 1 < k; ++j)
      mesh.faces.push_back({poly[0], poly[j], poly[j + 1]});
  }
  return true;
}

// ---------------------------------------------------------------------------
// Uniformity mode: approximate-geodesic disk densities.
// ---------------------------------------------------------------------------

static constexpr int STEINER_PER_EDGE = 3;
static const double PERCENTAGES[5] = {0.004, 0.006, 0.008, 0.010, 0.012};

// Graph over the surface: mesh vertices, Steiner points on edges, and
// embedded terminal points, with straight-line cliques inside each face.
struct SurfaceGraph {
  std::vector<V3> pos;                                   // node positions
  std::vector<std::vector<std::pair<int, float>>> adj;   // undirected

  int add_node(const V3 &p) {
    pos.push_back(p);
    adj.emplace_back();
    return (int)pos.size() - 1;
  }
  void add_edge(int a, int b) {
    if (a == b) return;
    float w = (float)norm(pos[a] - pos[b]);
    adj[a].push_back({b, w});
    adj[b].push_back({a, w});
  }
};

// terminals[i] = (face, point). Returns node id per terminal.
static std::vector<int> build_surface_graph(
    const Mesh &mesh, const std::vector<std::pair<int, V3>> &terminals,
    SurfaceGraph &g) {
  for (const V3 &v : mesh.verts) g.add_node(v);

  // unique undirected edges -> Steiner node ranges
  std::unordered_map<uint64_t, int> edge_first_steiner;
  auto ekey = [](int a, int b) {
    if (a > b) std::swap(a, b);
    return ((uint64_t)a << 32) | (uint32_t)b;
  };
  auto steiner_of = [&](int a, int b) -> int {
    uint64_t k = ekey(a, b);
    auto it = edge_first_steiner.find(k);
    if (it != edge_first_steiner.end()) return it->second;
    int first = (int)g.pos.size();
    const V3 &pa = mesh.verts[std::min(a, b)], &pb = mesh.verts[std::max(a, b)];
    for (int s = 1; s <= STEINER_PER_EDGE; ++s) {
      double t = (double)s / (STEINER_PER_EDGE + 1);
      int n = g.add_node(pa + (pb - pa) * t);
      // chain along the edge
      g.add_edge(n, s == 1 ? std::min(a, b) : n - 1);
      if (s == STEINER_PER_EDGE) g.add_edge(n, std::max(a, b));
    }
    edge_first_steiner[k] = first;
    return first;
  };

  // terminals grouped by face
  std::vector<std::vector<int>> face_terms(mesh.faces.size());
  std::vector<int> term_nodes(terminals.size());
  for (size_t i = 0; i < terminals.size(); ++i) {
    term_nodes[i] = g.add_node(terminals[i].second);
    int f = terminals[i].first;
    if (f >= 0) face_terms[f].push_back(term_nodes[i]);
  }

  std::vector<int> boundary;
  for (size_t f = 0; f < mesh.faces.size(); ++f) {
    const auto &tri = mesh.faces[f];
    boundary.clear();
    for (int k = 0; k < 3; ++k) {
      boundary.push_back(tri[k]);
      int first = steiner_of(tri[k], tri[(k + 1) % 3]);
      for (int s = 0; s < STEINER_PER_EDGE; ++s) boundary.push_back(first + s);
    }
    // straight-line clique among boundary nodes of this face (the segment
    // between two points of a triangle lies in the triangle)
    for (size_t i = 0; i < boundary.size(); ++i)
      for (size_t j = i + 1; j < boundary.size(); ++j)
        g.add_edge(boundary[i], boundary[j]);
    // embedded terminals connect to every boundary node and to each other
    const auto &terms = face_terms[f];
    for (size_t i = 0; i < terms.size(); ++i) {
      for (int b : boundary) g.add_edge(terms[i], b);
      for (size_t j = i + 1; j < terms.size(); ++j)
        g.add_edge(terms[i], terms[j]);
    }
  }
  return term_nodes;
}

// Dijkstra from `src`, stopping past `cutoff`; returns (node, dist) pairs.
static void bounded_dijkstra(const SurfaceGraph &g, int src, float cutoff,
                             std::vector<float> &dist,
                             std::vector<int> &touched,
                             std::vector<std::pair<int, float>> &out) {
  out.clear();
  using QE = std::pair<float, int>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
  dist[src] = 0.f;
  touched.push_back(src);
  pq.push({0.f, src});
  while (!pq.empty()) {
    auto [d, u] = pq.top();
    pq.pop();
    if (d > dist[u]) continue;
    out.push_back({u, d});
    for (auto [v, w] : g.adj[u]) {
      float nd = d + w;
      if (nd <= cutoff && nd < dist[v]) {
        if (dist[v] == FLT_MAX) touched.push_back(v);
        dist[v] = nd;
        pq.push({nd, v});
      }
    }
  }
  for (int n : touched) dist[n] = FLT_MAX;
  touched.clear();
}

struct UniformArgs {
  bool enabled = false;
  int samples = 1000;
  uint64_t seed = 2021;
};

static void run_uniform(const Mesh &mesh,
                        const std::vector<Hit> &pred_hits,
                        const std::string &prefix, const UniformArgs &ua,
                        int n_threads) {
  const int n_pred = (int)pred_hits.size();

  // total + cumulative face areas (reference evaluation.cpp:166-172)
  std::vector<double> cum_area(mesh.faces.size() + 1, 0.0);
  for (size_t f = 0; f < mesh.faces.size(); ++f) {
    V3 a = mesh.corner((int)f, 0), b = mesh.corner((int)f, 1),
       c = mesh.corner((int)f, 2);
    cum_area[f + 1] = cum_area[f] + 0.5 * norm(cross(b - a, c - a));
  }
  double total_area = cum_area.back();

  // one radius per percentage: pi * r^2 = p * A
  double radius[5];
  for (int j = 0; j < 5; ++j)
    radius[j] = std::sqrt(PERCENTAGES[j] * total_area / M_PI);

  // sample points uniformly by area: face by area CDF, uniform barycentric
  std::mt19937_64 rng(ua.seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  std::vector<std::pair<int, V3>> terminals;
  terminals.reserve(ua.samples + n_pred);
  for (int i = 0; i < ua.samples; ++i) {
    double u = uni(rng) * total_area;
    int f = (int)(std::upper_bound(cum_area.begin(), cum_area.end(), u) -
                  cum_area.begin()) - 1;
    f = std::min(std::max(f, 0), (int)mesh.faces.size() - 1);
    double r1 = std::sqrt(uni(rng)), r2 = uni(rng);
    V3 a = mesh.corner(f, 0), b = mesh.corner(f, 1), c = mesh.corner(f, 2);
    terminals.push_back(
        {f, a * (1 - r1) + b * (r1 * (1 - r2)) + c * (r1 * r2)});
  }
  for (const Hit &h : pred_hits) terminals.push_back({h.face, h.point});

  SurfaceGraph g;
  std::vector<int> term_nodes = build_surface_graph(mesh, terminals, g);

  // node id -> prediction index for fast disk-membership lookup
  std::vector<int> node_pred(g.pos.size(), -1);
  for (int k = 0; k < n_pred; ++k) node_pred[term_nodes[ua.samples + k]] = k;

  float cutoff = (float)radius[4];
  std::vector<std::string> lines(ua.samples * 5);
  std::vector<std::thread> workers;
  int per = (ua.samples + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int b = t * per, e = std::min(ua.samples, b + per);
    if (b >= e) break;
    workers.emplace_back([&, b, e]() {
      std::vector<float> dist(g.pos.size(), FLT_MAX);
      std::vector<int> touched;
      std::vector<std::pair<int, float>> reached;
      for (int i = b; i < e; ++i) {
        bounded_dijkstra(g, term_nodes[i], cutoff, dist, touched, reached);
        // per radius: indices of predictions within geodesic r_j
        for (int j = 0; j < 5; ++j) {
          std::string idxs;
          int density = 0;
          for (auto [node, d] : reached) {
            int k = node_pred[node];
            if (k >= 0 && d <= (float)radius[j]) {
              ++density;
              idxs += ' ';
              idxs += std::to_string(k);
            }
          }
          lines[i * 5 + j] = std::to_string(density) + ":" + idxs;
        }
      }
    });
  }
  for (auto &w : workers) w.join();

  {
    std::ofstream f(prefix + "_radius.txt");
    for (int j = 0; j < 5; ++j) f << radius[j] << '\n';
  }
  {
    std::ofstream f(prefix + "_disk_idx.txt");
    for (const std::string &l : lines) f << l << '\n';
  }
  std::printf("uniformity side-files written (%d samples, radii %.6f..%.6f)\n",
              ua.samples, radius[0], radius[4]);
}

// Strict numeric parse: rejects non-numeric/garbage values at the CLI
// boundary so bad --samples/--seed don't silently produce empty disk_idx
// side-files (and NaN uniformity measures downstream).
static long long parse_int_arg(const char *flag, const char *s,
                               long long min_val) {
  char *end = nullptr;
  errno = 0;
  long long v = std::strtoll(s, &end, 10);
  if (errno != 0 || end == s || *end != '\0' || v < min_val) {
    std::fprintf(stderr, "invalid value for %s: '%s' (need integer >= %lld)\n",
                 flag, s, min_val);
    std::exit(1);
  }
  return v;
}

int main(int argc, char **argv) {
  std::vector<std::string> pos_args;
  UniformArgs ua;
  int n_threads = 0;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--uniform") ua.enabled = true;
    else if (a == "--seed" && i + 1 < argc)
      ua.seed = (uint64_t)parse_int_arg("--seed", argv[++i], 0);
    else if (a == "--samples" && i + 1 < argc)
      ua.samples = (int)parse_int_arg("--samples", argv[++i], 1);
    else if (a == "--threads" && i + 1 < argc)
      n_threads = (int)parse_int_arg("--threads", argv[++i], 1);
    else pos_args.push_back(a);
  }
  if (pos_args.size() < 2) {
    std::fprintf(stderr,
                 "usage: %s mesh.off pred.xyz [n_threads] [--uniform] "
                 "[--seed N] [--samples N]\n", argv[0]);
    return 1;
  }
  std::string mesh_path = pos_args[0], pred_path = pos_args[1];
  if (pos_args.size() > 2) n_threads = std::atoi(pos_args[2].c_str());
  if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;

  Mesh mesh;
  if (!load_off(mesh_path, mesh) || mesh.faces.empty()) {
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
  bvh.build(mesh);

  std::vector<Hit> hits(points.size());
  std::vector<std::thread> workers;
  size_t chunk = (points.size() + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    size_t b = t * chunk, e = std::min(points.size(), b + chunk);
    if (b >= e) break;
    workers.emplace_back([&, b, e]() {
      for (size_t i = b; i < e; ++i) hits[i] = bvh.closest(points[i]);
    });
  }
  for (auto &w : workers) w.join();

  // output contract: "<pred minus .xyz>_point2mesh_distance.xyz"
  std::string prefix = pred_path;
  const std::string ext = ".xyz";
  if (prefix.size() > ext.size() &&
      prefix.compare(prefix.size() - ext.size(), ext.size(), ext) == 0)
    prefix = prefix.substr(0, prefix.size() - ext.size());
  std::ofstream out(prefix + "_point2mesh_distance.xyz");
  double sum = 0;
  for (size_t i = 0; i < points.size(); ++i) {
    out << points[i].x << ' ' << points[i].y << ' ' << points[i].z << ' '
        << hits[i].dist << '\n';
    sum += hits[i].dist;
  }
  double mean = sum / (double)points.size();
  double var = 0;
  for (const Hit &h : hits) var += (h.dist - mean) * (h.dist - mean);
  var /= (double)points.size();
  std::printf("p2f avg: %.8f\np2f std: %.8f\n", mean, std::sqrt(var));

  if (ua.enabled) {
    // map-points file consumed by analyze_uniform (`evaluate.py:118` reads
    // columns 4: as the mapped points -> 7 columns here)
    std::ofstream mp(prefix + "_point2mesh_distance.txt");
    for (size_t i = 0; i < points.size(); ++i)
      mp << points[i].x << ' ' << points[i].y << ' ' << points[i].z << ' '
         << hits[i].dist << ' ' << hits[i].point.x << ' ' << hits[i].point.y
         << ' ' << hits[i].point.z << '\n';
    run_uniform(mesh, hits, prefix, ua, n_threads);
  }
  return 0;
}
