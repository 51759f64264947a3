// Native host-side spatial ops for the data pipeline.
//
// The reference delegates its host spatial queries to native libraries
// (sklearn KDTree at torch_points3d/core/data_transform/transforms.py:119,
// torch-cluster grid_cluster at grid_transform.py:11-14). This library is the
// TPU framework's equivalent: a flat open-addressing grid hash providing
//   * voxel_sample_last  - GridSampling3D mode="last" (random representative
//     per voxel, caller supplies the permutation)
//   * cylinder_query     - all points within an xy radius of a centre
//   * knn1               - 1-NN index from query points to reference points
//     (block-merging / full-res projection)
// Built with: g++ -O3 -shared -fPIC grid_hash.cpp -o libgridhash.so
// Exposed to Python via ctypes (see native.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// voxel_sample_last: for points visited in the order perm[0..n), keep the
// first point landing in each voxel (caller pre-shuffles perm for the
// random-representative semantics). Returns the number of kept points and
// fills sel (capacity n) with the kept original indices, and inv (size n)
// with each point's output voxel slot.
// ---------------------------------------------------------------------------
int64_t voxel_sample_last(
    const float* pos,        // [n, 3]
    int64_t n,
    double size,
    const int64_t* perm,     // [n]
    int64_t* sel,            // out [<=n]
    int64_t* inv             // out [n]
) {
    // quantized coords
    std::vector<int64_t> key(n);
    double inv_size = 1.0 / size;
    for (int64_t i = 0; i < n; ++i) {
        int64_t x = (int64_t)std::llround(pos[3 * i + 0] * inv_size);
        int64_t y = (int64_t)std::llround(pos[3 * i + 1] * inv_size);
        int64_t z = (int64_t)std::llround(pos[3 * i + 2] * inv_size);
        // 21 bits per axis, offset to positive
        key[i] = ((x + (1 << 20)) << 42) | ((y + (1 << 20)) << 21) | (z + (1 << 20));
    }
    // open addressing hash: key -> slot
    size_t cap = 1;
    while (cap < (size_t)(n * 2)) cap <<= 1;
    std::vector<int64_t> table_key(cap, -1);
    std::vector<int64_t> table_slot(cap, -1);
    int64_t m = 0;
    for (int64_t p = 0; p < n; ++p) {
        int64_t i = perm[p];
        uint64_t h = (uint64_t)key[i] * 0x9E3779B97F4A7C15ull;
        size_t b = (size_t)(h & (cap - 1));
        while (true) {
            if (table_key[b] == -1) {
                table_key[b] = key[i];
                table_slot[b] = m;
                sel[m] = i;
                inv[i] = m;
                ++m;
                break;
            }
            if (table_key[b] == key[i]) {
                inv[i] = table_slot[b];
                break;
            }
            b = (b + 1) & (cap - 1);
        }
    }
    return m;
}

// ---------------------------------------------------------------------------
// 2D grid hash over xy for cylinder queries.
// ---------------------------------------------------------------------------
struct Grid2D {
    double cell;
    int64_t n;
    std::vector<float> xy;       // [n, 2]
    std::vector<int64_t> order;  // points sorted by cell
    std::vector<int64_t> start;  // bucket -> start in order
    std::vector<int64_t> bkey;   // sorted unique bucket keys
};

static inline int64_t cell_key(int64_t cx, int64_t cy) {
    return ((cx + (1ll << 30)) << 32) | (uint32_t)(cy + (1ll << 30));
}

void* grid2d_build(const float* pos, int64_t n, double cell) {
    Grid2D* g = new Grid2D();
    g->cell = cell;
    g->n = n;
    g->xy.assign(pos, pos + 2 * n);
    std::vector<std::pair<int64_t, int64_t>> kv(n);
    double inv = 1.0 / cell;
    for (int64_t i = 0; i < n; ++i) {
        int64_t cx = (int64_t)std::floor(pos[2 * i] * inv);
        int64_t cy = (int64_t)std::floor(pos[2 * i + 1] * inv);
        kv[i] = {cell_key(cx, cy), i};
    }
    std::sort(kv.begin(), kv.end());
    g->order.resize(n);
    for (int64_t i = 0; i < n; ++i) g->order[i] = kv[i].second;
    for (int64_t i = 0; i < n; ++i) {
        if (i == 0 || kv[i].first != kv[i - 1].first) {
            g->bkey.push_back(kv[i].first);
            g->start.push_back(i);
        }
    }
    g->start.push_back(n);
    return g;
}

void grid2d_free(void* h) { delete (Grid2D*)h; }

// All points with xy distance <= radius of centre; returns count, fills out.
int64_t grid2d_cylinder_query(
    void* h, double cx, double cy, double radius, int64_t* out
) {
    Grid2D* g = (Grid2D*)h;
    double inv = 1.0 / g->cell;
    int64_t cx0 = (int64_t)std::floor((cx - radius) * inv);
    int64_t cx1 = (int64_t)std::floor((cx + radius) * inv);
    int64_t cy0 = (int64_t)std::floor((cy - radius) * inv);
    int64_t cy1 = (int64_t)std::floor((cy + radius) * inv);
    double r2 = radius * radius;
    int64_t cnt = 0;
    for (int64_t bx = cx0; bx <= cx1; ++bx) {
        for (int64_t by = cy0; by <= cy1; ++by) {
            int64_t k = cell_key(bx, by);
            auto it = std::lower_bound(g->bkey.begin(), g->bkey.end(), k);
            if (it == g->bkey.end() || *it != k) continue;
            size_t bi = it - g->bkey.begin();
            for (int64_t p = g->start[bi]; p < g->start[bi + 1]; ++p) {
                int64_t i = g->order[p];
                double dx = g->xy[2 * i] - cx;
                double dy = g->xy[2 * i + 1] - cy;
                if (dx * dx + dy * dy <= r2) out[cnt++] = i;
            }
        }
    }
    std::sort(out, out + cnt);
    return cnt;
}

// ---------------------------------------------------------------------------
// knn1: 1-NN from each query to the reference set (3D grid hash with ring
// expansion). dist and idx are [nq] outputs.
// ---------------------------------------------------------------------------
void knn1(
    const float* ref, int64_t nr,
    const float* query, int64_t nq,
    double cell,
    int64_t* idx, float* dist
) {
    // build 3D hash
    struct KV { int64_t key; int64_t i; };
    std::vector<KV> kv(nr);
    double inv = 1.0 / cell;
    auto key3 = [](int64_t x, int64_t y, int64_t z) {
        return ((x + (1 << 20)) << 42) | ((y + (1 << 20)) << 21) | (z + (1 << 20));
    };
    for (int64_t i = 0; i < nr; ++i) {
        int64_t cx = (int64_t)std::floor(ref[3 * i] * inv);
        int64_t cy = (int64_t)std::floor(ref[3 * i + 1] * inv);
        int64_t cz = (int64_t)std::floor(ref[3 * i + 2] * inv);
        kv[i] = {key3(cx, cy, cz), i};
    }
    std::sort(kv.begin(), kv.end(), [](const KV& a, const KV& b) { return a.key < b.key; });
    std::vector<int64_t> keys(nr);
    for (int64_t i = 0; i < nr; ++i) keys[i] = kv[i].key;

    for (int64_t q = 0; q < nq; ++q) {
        double best = 1e30;
        int64_t besti = -1;
        int64_t cx = (int64_t)std::floor(query[3 * q] * inv);
        int64_t cy = (int64_t)std::floor(query[3 * q + 1] * inv);
        int64_t cz = (int64_t)std::floor(query[3 * q + 2] * inv);
        for (int64_t ring = 0; ring < (1 << 21); ++ring) {
            // Stop only when no unscanned cell can hold a closer point: a
            // cell at Chebyshev ring r is at least (r-1)*cell away from any
            // point of the query's cell, so a hit at distance d rules out
            // rings with (ring-1)*cell > d. (A ring-0 hit can be up to
            // sqrt(3)*cell away while a closer point sits in ring 2, so a
            // fixed +1 ring after the first hit is NOT enough.)
            if (besti >= 0) {
                double gap = (double)(ring - 1) * cell;
                if (gap > 0.0 && gap * gap > best) break;
            }
            // scan the shell at Chebyshev distance `ring`
            for (int64_t dx = -ring; dx <= ring; ++dx)
                for (int64_t dy = -ring; dy <= ring; ++dy)
                    for (int64_t dz = -ring; dz <= ring; ++dz) {
                        if (std::max({std::llabs(dx), std::llabs(dy), std::llabs(dz)}) != ring)
                            continue;
                        int64_t k = key3(cx + dx, cy + dy, cz + dz);
                        auto it = std::lower_bound(keys.begin(), keys.end(), k);
                        if (it == keys.end() || *it != k) continue;
                        for (size_t p = it - keys.begin(); p < (size_t)nr && keys[p] == k; ++p) {
                            int64_t i = kv[p].i;
                            double ddx = ref[3 * i] - query[3 * q];
                            double ddy = ref[3 * i + 1] - query[3 * q + 1];
                            double ddz = ref[3 * i + 2] - query[3 * q + 2];
                            double d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                            if (d2 < best) { best = d2; besti = i; }
                        }
                    }
        }
        idx[q] = besti;
        dist[q] = (float)std::sqrt(best);
    }
}

}  // extern "C"
