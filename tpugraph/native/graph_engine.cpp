// graph_engine.cpp — native host-side graph runtime for tpugraph.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the *host*
// side of the framework: building CSR structure, packing the BCSR tiles
// the Pallas SpMM kernel consumes, and k-hop BFS for explainer
// neighborhood extraction.  (The reference does all of this in Python
// with dense matrices — utils/graph_utils.py, explain.py:492-501; here
// it is O(E) native code so million-edge graphs load in milliseconds.)
//
// Build: g++ -O3 -march=native -shared -fPIC graph_engine.cpp -o libgraph_engine.so
// ABI: plain C, consumed via ctypes (no pybind11 in this environment).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- CSR build

// Build CSR (indptr[n+1], indices[e]) from COO receiver->sender adjacency.
// rows = receivers, cols = senders (matches ops.message.spmm convention).
// order_out[e] records the permutation from input edge order to CSR order
// so edge-aligned payloads (weights, pair ids) can be permuted alongside.
void coo_to_csr(const int32_t* rows, const int32_t* cols, int64_t e,
                int32_t n, int32_t* indptr, int32_t* indices,
                int32_t* order_out) {
    std::memset(indptr, 0, sizeof(int32_t) * (n + 1));
    for (int64_t i = 0; i < e; ++i) indptr[rows[i] + 1]++;
    for (int32_t i = 0; i < n; ++i) indptr[i + 1] += indptr[i];
    std::vector<int32_t> cursor(indptr, indptr + n);
    for (int64_t i = 0; i < e; ++i) {
        int32_t pos = cursor[rows[i]]++;
        indices[pos] = cols[i];
        order_out[pos] = (int32_t)i;
    }
}

// ------------------------------------------------------------- BCSR packing

// Count nonempty (block x block) tiles of the (rows, cols) sparsity.
int64_t bcsr_count_tiles(const int32_t* rows, const int32_t* cols,
                         const float* w, int64_t e, int32_t n_blocks,
                         int32_t block) {
    std::unordered_map<int64_t, int32_t> seen;
    seen.reserve((size_t)(e / 4 + 1));
    for (int64_t i = 0; i < e; ++i) {
        if (w[i] == 0.0f) continue;
        int64_t key = (int64_t)(rows[i] / block) * n_blocks + cols[i] / block;
        seen.emplace(key, 1);
    }
    return (int64_t)seen.size();
}

// Pack BCSR: tiles [t_pad, block, block] zero-initialised by caller,
// col_blk[t_pad], row_of[t_pad], row_ptr[n_blocks+1].
// Tiles are emitted sorted by (row_block, col_block); padding tiles get
// row_of = n_blocks-1, col_blk = 0 (dead slots after all real rows).
// Returns number of real tiles, or -1 if t_pad is too small.
int64_t bcsr_pack(const int32_t* rows, const int32_t* cols, const float* w,
                  int64_t e, int32_t n_blocks, int32_t block,
                  float* tiles, int32_t* col_blk, int32_t* row_of,
                  int32_t* row_ptr, int64_t t_pad) {
    // map tile key -> slot
    std::unordered_map<int64_t, int64_t> slot;
    slot.reserve((size_t)(e / 4 + 1));
    std::vector<int64_t> keys;
    for (int64_t i = 0; i < e; ++i) {
        if (w[i] == 0.0f) continue;
        int64_t key = (int64_t)(rows[i] / block) * n_blocks + cols[i] / block;
        if (slot.emplace(key, 0).second) keys.push_back(key);
    }
    int64_t t = (int64_t)keys.size();
    if (t > t_pad) return -1;
    std::sort(keys.begin(), keys.end());
    for (int64_t i = 0; i < t; ++i) slot[keys[i]] = i;

    const int64_t tile_sz = (int64_t)block * block;
    for (int64_t i = 0; i < e; ++i) {
        if (w[i] == 0.0f) continue;
        int32_t rb = rows[i] / block, cb = cols[i] / block;
        int64_t s = slot[(int64_t)rb * n_blocks + cb];
        tiles[s * tile_sz + (int64_t)(rows[i] % block) * block +
              (cols[i] % block)] += w[i];
    }
    std::vector<int64_t> counts(n_blocks, 0);
    for (int64_t i = 0; i < t; ++i) {
        int32_t rb = (int32_t)(keys[i] / n_blocks);
        col_blk[i] = (int32_t)(keys[i] % n_blocks);
        row_of[i] = rb;
        counts[rb]++;
    }
    for (int64_t i = t; i < t_pad; ++i) {
        row_of[i] = n_blocks - 1;
        col_blk[i] = 0;
    }
    counts[n_blocks - 1] += t_pad - t;
    row_ptr[0] = 0;
    for (int32_t i = 0; i < n_blocks; ++i)
        row_ptr[i + 1] = row_ptr[i] + (int32_t)counts[i];
    return t;
}

// ---------------------------------------------------------------- k-hop BFS

// Mark all nodes within k hops of src (inclusive) in out_mask[n].
void khop_bfs(const int32_t* indptr, const int32_t* indices, int32_t n,
              int32_t src, int32_t k, uint8_t* out_mask) {
    std::memset(out_mask, 0, n);
    if (src < 0 || src >= n) return;
    std::vector<int32_t> frontier{src}, next;
    out_mask[src] = 1;
    for (int32_t hop = 0; hop < k && !frontier.empty(); ++hop) {
        next.clear();
        for (int32_t u : frontier) {
            for (int32_t p = indptr[u]; p < indptr[u + 1]; ++p) {
                int32_t v = indices[p];
                if (!out_mask[v]) {
                    out_mask[v] = 1;
                    next.push_back(v);
                }
            }
        }
        frontier.swap(next);
    }
}

// Batched BFS: masks for q query nodes into out_masks[q * n].
void khop_bfs_batch(const int32_t* indptr, const int32_t* indices, int32_t n,
                    const int32_t* srcs, int32_t q, int32_t k,
                    uint8_t* out_masks) {
    for (int32_t i = 0; i < q; ++i)
        khop_bfs(indptr, indices, n, srcs[i], k, out_masks + (int64_t)i * n);
}

// ------------------------------------------------------- degree + normalize

// Symmetric normalization in place: w[i] /= sqrt(deg[rows[i]]*deg[cols[i]]).
void sym_normalize(const int32_t* rows, const int32_t* cols, float* w,
                   int64_t e, int32_t n) {
    std::vector<double> deg(n, 0.0);
    for (int64_t i = 0; i < e; ++i) deg[rows[i]] += w[i];
    std::vector<double> inv(n, 0.0);
    for (int32_t i = 0; i < n; ++i)
        if (deg[i] > 0) inv[i] = 1.0 / std::sqrt(deg[i]);
    for (int64_t i = 0; i < e; ++i)
        w[i] = (float)(w[i] * inv[rows[i]] * inv[cols[i]]);
}

}  // extern "C"
