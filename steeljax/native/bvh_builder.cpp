// Binned-SAH BVH builder (C, exposed via ctypes).
//
// The TPU-native replacement for the Vulkan driver's
// vkBuildAccelerationStructuresKHR (reference:
// AccelerationStructureManager.cpp:62-126) — the one large native
// component the reference got for free.  Produces the explicit-node
// format consumed by steeljax.accel:
//
//   nodes[i] = { min.xyz, max.xyz, meta0, meta1 }  (8 floats)
//     internal: meta0 = left child index (right = left + 1), meta1 = 0
//     leaf:     meta0 = first triangle, meta1 = triangle count (> 0)
//
// Indices are stored as exact float values (counts < 2^24).  Triangles
// are partitioned in place; perm_out maps output slots to input ids, so
// leaf ranges stay contiguous (TPU-friendly dynamic-slice reads).
//
// Build: top-down, 16-bin SAH over the centroid extent of the widest
// axis, median-split fallback, leaf when count <= max_leaf or no
// beneficial split.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
    float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Box {
    Vec3 lo{3e38f, 3e38f, 3e38f};
    Vec3 hi{-3e38f, -3e38f, -3e38f};
    void grow(const Box& other) {
        lo = vmin(lo, other.lo);
        hi = vmax(hi, other.hi);
    }
    void grow(const Vec3& p) {
        lo = vmin(lo, p);
        hi = vmax(hi, p);
    }
    float half_area() const {
        float dx = std::max(hi.x - lo.x, 0.f);
        float dy = std::max(hi.y - lo.y, 0.f);
        float dz = std::max(hi.z - lo.z, 0.f);
        return dx * dy + dy * dz + dz * dx;
    }
};

struct Prim {
    Box box;
    Vec3 centroid;
    int64_t id;
};

constexpr int kBins = 16;

struct Builder {
    std::vector<Prim> prims;
    std::vector<float> nodes;  // 8 floats per node
    int max_leaf;

    int alloc_node() {
        nodes.resize(nodes.size() + 8, 0.f);
        return static_cast<int>(nodes.size() / 8) - 1;
    }

    void write_node(int idx, const Box& box, float m0, float m1) {
        float* n = &nodes[idx * 8];
        n[0] = box.lo.x; n[1] = box.lo.y; n[2] = box.lo.z;
        n[3] = box.hi.x; n[4] = box.hi.y; n[5] = box.hi.z;
        n[6] = m0; n[7] = m1;
    }

    // Build [first, last) into node `idx`; returns subtree depth.
    int build(int idx, int first, int last) {
        Box bounds, cbounds;
        for (int i = first; i < last; ++i) {
            bounds.grow(prims[i].box);
            cbounds.grow(prims[i].centroid);
        }
        int count = last - first;
        if (count <= max_leaf) {
            write_node(idx, bounds, float(first), float(count));
            return 1;
        }

        // Widest centroid axis.
        float ex = cbounds.hi.x - cbounds.lo.x;
        float ey = cbounds.hi.y - cbounds.lo.y;
        float ez = cbounds.hi.z - cbounds.lo.z;
        int axis = (ex > ey && ex > ez) ? 0 : (ey > ez ? 1 : 2);
        float lo = axis == 0 ? cbounds.lo.x : (axis == 1 ? cbounds.lo.y
                                                         : cbounds.lo.z);
        float extent = axis == 0 ? ex : (axis == 1 ? ey : ez);

        int mid;
        if (extent < 1e-12f) {
            mid = first + count / 2;  // degenerate: median split
        } else {
            // Binned SAH.
            Box bin_box[kBins];
            int bin_count[kBins] = {0};
            float scale = kBins / extent;
            auto bin_of = [&](const Prim& p) {
                float c = axis == 0 ? p.centroid.x
                                    : (axis == 1 ? p.centroid.y
                                                 : p.centroid.z);
                int b = int((c - lo) * scale);
                return std::min(std::max(b, 0), kBins - 1);
            };
            for (int i = first; i < last; ++i) {
                int b = bin_of(prims[i]);
                bin_box[b].grow(prims[i].box);
                bin_count[b]++;
            }
            // Sweep for the best split plane.
            Box right_acc[kBins];
            Box acc;
            for (int b = kBins - 1; b > 0; --b) {
                acc.grow(bin_box[b]);
                right_acc[b] = acc;
            }
            Box left_acc;
            int left_n = 0;
            float best_cost = 3e38f;
            int best_bin = -1;
            for (int b = 0; b < kBins - 1; ++b) {
                left_acc.grow(bin_box[b]);
                left_n += bin_count[b];
                int right_n = count - left_n;
                if (left_n == 0 || right_n == 0) continue;
                float cost = left_acc.half_area() * left_n
                           + right_acc[b + 1].half_area() * right_n;
                if (cost < best_cost) {
                    best_cost = cost;
                    best_bin = b;
                }
            }
            float leaf_cost = bounds.half_area() * count;
            if (best_bin < 0
                || (count <= 2 * max_leaf && best_cost >= leaf_cost)) {
                mid = first + count / 2;
            } else {
                auto it = std::partition(
                    prims.begin() + first, prims.begin() + last,
                    [&](const Prim& p) { return bin_of(p) <= best_bin; });
                mid = static_cast<int>(it - prims.begin());
                if (mid == first || mid == last) mid = first + count / 2;
            }
        }

        int left = alloc_node();
        int right = alloc_node();  // right == left + 1 by construction
        write_node(idx, bounds, float(left), 0.f);
        int dl = build(left, first, mid);
        int dr = build(right, mid, last);
        return 1 + std::max(dl, dr);
    }
};

}  // namespace

extern "C" {

// Returns 0 on success.  nodes_out must hold >= (2*ceil(T/1)) * 8 floats
// (caller passes capacity in nodes); perm_out holds T int64 slots.
int steeljax_build_bvh(const float* tris, int64_t tri_count, int max_leaf,
                       float* nodes_out, int64_t node_capacity,
                       int64_t* perm_out, int64_t* node_count_out,
                       int* depth_out) {
    if (tri_count <= 0) return 1;
    Builder b;
    b.max_leaf = max_leaf;
    b.prims.resize(tri_count);
    for (int64_t i = 0; i < tri_count; ++i) {
        const float* t = tris + i * 9;
        Prim& p = b.prims[i];
        Vec3 v0{t[0], t[1], t[2]};
        Vec3 v1{t[3], t[4], t[5]};
        Vec3 v2{t[6], t[7], t[8]};
        p.box.grow(v0);
        p.box.grow(v1);
        p.box.grow(v2);
        p.centroid = {(v0.x + v1.x + v2.x) / 3.f,
                      (v0.y + v1.y + v2.y) / 3.f,
                      (v0.z + v1.z + v2.z) / 3.f};
        p.id = i;
    }
    b.nodes.reserve(std::min<int64_t>(node_capacity, 2 * tri_count) * 8);
    int root = b.alloc_node();
    int depth = b.build(root, 0, static_cast<int>(tri_count));
    int64_t node_count = static_cast<int64_t>(b.nodes.size() / 8);
    if (node_count > node_capacity) return 2;
    std::memcpy(nodes_out, b.nodes.data(), b.nodes.size() * sizeof(float));
    for (int64_t i = 0; i < tri_count; ++i) perm_out[i] = b.prims[i].id;
    *node_count_out = node_count;
    *depth_out = depth;
    return 0;
}

}  // extern "C"
