// Native acceleration-structure builder for raytrace_tpu.
//
// TPU-native rework of the reference's CPU KD-tree build
// (reference accel/kdtree.rs:26-56, node_from_elems :107-138, and the
// flattened GPUTreeNode layout gpu_structs.rs:628-772): recursive
// spatial split over primitive AABBs with straddlers duplicated into
// both children, emitted as flat arrays — plus a cluster view (leaves
// padded to a fixed width) that the TPU culling/traversal kernels
// consume as dense (n_clusters, K) index matrices.
//
// Differences from the reference's build, chosen deliberately:
//  * split at the median of centroids along the widest axis (the
//    reference uses axis = depth % 3 and the MEAN of centroids,
//    kdtree.rs:113-116); widest-axis/median bounds duplication and
//    balances leaves, which matters once leaves become fixed-width
//    TPU clusters. axis_mode=1 reproduces the reference's policy.
//
// C ABI (ctypes): two-phase — build returns a handle with sizes,
// fetch copies into caller buffers, free releases.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Node {
  int32_t axis;       // split axis, -1 for leaf
  float split;        // split plane
  int32_t left;       // child node ids (-1 for leaf)
  int32_t right;
  int32_t leaf_off;   // offset into leaf_prims (leaves only)
  int32_t leaf_len;
};

struct Build {
  std::vector<Node> nodes;
  std::vector<int32_t> leaf_prims;
  // cluster view
  std::vector<int32_t> cluster_prims;  // (n_clusters * cluster_width), -1 pad
  std::vector<float> cluster_lo;       // (n_clusters * 3)
  std::vector<float> cluster_hi;
  int32_t cluster_width = 0;
};

struct Ctx {
  const float* lo;
  const float* hi;
  int leaf_target;
  int max_depth;
  int axis_mode;  // 0: widest/median, 1: reference depth%3/mean
  Build* out;
};

float centroid(const Ctx& c, int prim, int axis) {
  return 0.5f * (c.lo[prim * 3 + axis] + c.hi[prim * 3 + axis]);
}

int build_rec(Ctx& c, std::vector<int32_t>& prims, int depth) {
  Build& b = *c.out;
  int id = (int)b.nodes.size();
  b.nodes.push_back(Node{});
  // leaf when deep enough or small enough (kdtree.rs:109 uses
  // depth > max || len <= 1; we leaf at leaf_target for clusters)
  if (depth >= c.max_depth || (int)prims.size() <= c.leaf_target) {
    Node n;
    n.axis = -1;
    n.split = 0.f;
    n.left = n.right = -1;
    n.leaf_off = (int32_t)b.leaf_prims.size();
    n.leaf_len = (int32_t)prims.size();
    b.leaf_prims.insert(b.leaf_prims.end(), prims.begin(), prims.end());
    b.nodes[id] = n;
    return id;
  }

  int axis;
  float split;
  if (c.axis_mode == 1) {
    axis = depth % 3;
    double acc = 0;
    for (int p : prims) acc += centroid(c, p, axis);
    split = (float)(acc / prims.size());
  } else {
    // widest axis of the centroid bounds
    float cmin[3], cmax[3];
    for (int a = 0; a < 3; a++) { cmin[a] = 1e30f; cmax[a] = -1e30f; }
    for (int p : prims)
      for (int a = 0; a < 3; a++) {
        float v = centroid(c, p, a);
        cmin[a] = std::min(cmin[a], v);
        cmax[a] = std::max(cmax[a], v);
      }
    axis = 0;
    float w = cmax[0] - cmin[0];
    for (int a = 1; a < 3; a++)
      if (cmax[a] - cmin[a] > w) { w = cmax[a] - cmin[a]; axis = a; }
    // median of centroids
    std::vector<float> cs;
    cs.reserve(prims.size());
    for (int p : prims) cs.push_back(centroid(c, p, axis));
    size_t mid = cs.size() / 2;
    std::nth_element(cs.begin(), cs.begin() + mid, cs.end());
    split = cs[mid];
  }

  // partition with straddler duplication (kdtree.rs:118-133)
  std::vector<int32_t> low, high;
  low.reserve(prims.size());
  high.reserve(prims.size());
  for (int p : prims) {
    if (c.hi[p * 3 + axis] >= split) high.push_back(p);
    if (c.lo[p * 3 + axis] <= split) low.push_back(p);
  }
  // degenerate split (all on one side): force a leaf
  if (low.size() == prims.size() && high.size() == prims.size()) {
    Node n;
    n.axis = -1;
    n.split = 0.f;
    n.left = n.right = -1;
    n.leaf_off = (int32_t)b.leaf_prims.size();
    n.leaf_len = (int32_t)prims.size();
    b.leaf_prims.insert(b.leaf_prims.end(), prims.begin(), prims.end());
    b.nodes[id] = n;
    return id;
  }
  prims.clear();
  prims.shrink_to_fit();

  int l = build_rec(c, low, depth + 1);
  int r = build_rec(c, high, depth + 1);
  Node n;
  n.axis = axis;
  n.split = split;
  n.left = l;
  n.right = r;
  n.leaf_off = -1;
  n.leaf_len = 0;
  b.nodes[id] = n;
  return id;
}

void build_clusters(const Ctx& c) {
  Build& b = *c.out;
  int width = 1;
  for (const Node& n : b.nodes)
    if (n.axis < 0) width = std::max(width, (int)n.leaf_len);
  // pad width to a multiple of 8 for TPU-friendly chunking
  width = ((width + 7) / 8) * 8;
  b.cluster_width = width;
  for (const Node& n : b.nodes) {
    if (n.axis >= 0) continue;
    float lo3[3] = {1e30f, 1e30f, 1e30f};
    float hi3[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = 0; i < width; i++) {
      int32_t p = (i < n.leaf_len) ? b.leaf_prims[n.leaf_off + i] : -1;
      b.cluster_prims.push_back(p);
      if (p >= 0)
        for (int a = 0; a < 3; a++) {
          lo3[a] = std::min(lo3[a], c.lo[p * 3 + a]);
          hi3[a] = std::max(hi3[a], c.hi[p * 3 + a]);
        }
    }
    for (int a = 0; a < 3; a++) b.cluster_lo.push_back(lo3[a]);
    for (int a = 0; a < 3; a++) b.cluster_hi.push_back(hi3[a]);
  }
}

}  // namespace

extern "C" {

void* kdtree_build(const float* aabb_lo, const float* aabb_hi, int n_prims,
                   int max_depth, int leaf_target, int axis_mode,
                   int32_t* sizes_out /* [n_nodes, n_leaf_prims, n_clusters, cluster_width] */) {
  Build* b = new Build();
  Ctx c{aabb_lo, aabb_hi, leaf_target, max_depth, axis_mode, b};
  std::vector<int32_t> all(n_prims);
  for (int i = 0; i < n_prims; i++) all[i] = i;
  build_rec(c, all, 0);
  build_clusters(c);
  sizes_out[0] = (int32_t)b->nodes.size();
  sizes_out[1] = (int32_t)b->leaf_prims.size();
  sizes_out[2] = (int32_t)(b->cluster_lo.size() / 3);
  sizes_out[3] = b->cluster_width;
  return b;
}

void kdtree_fetch(void* handle, int32_t* node_axis, float* node_split,
                  int32_t* node_left, int32_t* node_right,
                  int32_t* node_leaf_off, int32_t* node_leaf_len,
                  int32_t* leaf_prims, int32_t* cluster_prims,
                  float* cluster_lo, float* cluster_hi) {
  Build* b = (Build*)handle;
  for (size_t i = 0; i < b->nodes.size(); i++) {
    node_axis[i] = b->nodes[i].axis;
    node_split[i] = b->nodes[i].split;
    node_left[i] = b->nodes[i].left;
    node_right[i] = b->nodes[i].right;
    node_leaf_off[i] = b->nodes[i].leaf_off;
    node_leaf_len[i] = b->nodes[i].leaf_len;
  }
  std::memcpy(leaf_prims, b->leaf_prims.data(), b->leaf_prims.size() * 4);
  std::memcpy(cluster_prims, b->cluster_prims.data(), b->cluster_prims.size() * 4);
  std::memcpy(cluster_lo, b->cluster_lo.data(), b->cluster_lo.size() * 4);
  std::memcpy(cluster_hi, b->cluster_hi.data(), b->cluster_hi.size() * 4);
}

void kdtree_free(void* handle) { delete (Build*)handle; }

}  // extern "C"
