/* Native collate core: the topology-indexing inner loops of
 * infomax3d_tpu/graphs/batch.py::batch_graphs in one O(N + E) C pass.
 *
 * Why native: the reference rides DGL's C++ graph batcher; the pure-numpy
 * rebuild spends ~9.5 ms/batch-of-500 in python-level per-graph loops
 * (argsort x2, bincounts, the readout-regroup loop, mailbox construction),
 * only ~1.4x faster than the 13.8 ms TPU train step it has to feed.  This
 * file replaces every index-shaped loop with counting sorts and single
 * passes; feature payloads (node_feat/edge_feat/coords) stay in numpy,
 * whose concatenate/take are already C-speed.
 *
 * Contract mirrors batch_graphs exactly (same padding values, same stable
 * orderings); tests/test_native_batcher.py asserts array-for-array equality
 * against the numpy path.
 *
 * Build: cc -O3 -shared -fPIC batcher.c -o _batcher_<hash>.so
 * (driven lazily by infomax3d_tpu/native/__init__.py via ctypes; no numpy
 * C API, no pybind11 — raw int32/float32 buffers only.)
 */
#include <stdint.h>
#include <string.h>
#include <math.h>

#define OK 0
#define ERR_DEG_OVERFLOW 1
#define ERR_NMAX_OVERFLOW 2

/* stable counting sort of edges by key[e] in [0, nkeys]; order[newpos] = e */
static void counting_sort(const int32_t *key, int32_t n, int32_t nkeys,
                          int32_t *scratch /* [nkeys+2] */, int32_t *order) {
    memset(scratch, 0, (size_t)(nkeys + 2) * sizeof(int32_t));
    for (int32_t e = 0; e < n; ++e) scratch[key[e] + 1]++;
    for (int32_t k = 0; k < nkeys + 1; ++k) scratch[k + 1] += scratch[k];
    for (int32_t e = 0; e < n; ++e) order[scratch[key[e]]++] = e;
}

/* mailbox: per-node edge-id lists (build_mailbox, ops/mailbox.py:36-64).
 * indices may be unsorted; iteration in ascending e matches the numpy
 * stable argsort.  Returns max degree seen (for the K check). */
static int32_t fill_mailbox(const int32_t *indices, int32_t N, int32_t E,
                            int32_t K, int32_t *deg_ctr /* [N] scratch */,
                            int32_t *edges /* [N*K] */,
                            uint8_t *mask /* [N*K] */,
                            int32_t *slot /* [E] */) {
    for (int64_t i = 0; i < (int64_t)N * K; ++i) { edges[i] = E; mask[i] = 0; }
    memset(deg_ctr, 0, (size_t)N * sizeof(int32_t));
    int32_t deg_max = 0;
    for (int32_t e = 0; e < E; ++e) {
        int32_t n = indices[e];
        if (n < 0 || n >= N) { slot[e] = N * K; continue; }
        int32_t k = deg_ctr[n]++;
        if (deg_ctr[n] > deg_max) deg_max = deg_ctr[n];
        if (k >= K) continue;          /* overflow reported via return */
        edges[(int64_t)n * K + k] = e;
        mask[(int64_t)n * K + k] = 1;
        slot[e] = n * K + k;
    }
    return deg_max;
}

int pack_topology(
    /* per-graph-local edge endpoints, concatenated over graphs */
    const int32_t *src_cat, const int32_t *dst_cat,
    const int32_t *n_per, const int32_t *e_per,
    int32_t g_real, int32_t G, int32_t N, int32_t E,
    int32_t n_tot, int32_t e_tot,
    int32_t K,            /* mailbox width / csr degree bound; 0 = skip */
    int32_t nmax,         /* readout-regroup width; 0 = skip */
    int32_t do_csr,       /* sort edges by receiver + csr/csc arrays */
    /* outputs — all preallocated by the caller */
    int32_t *senders, int32_t *receivers,   /* [E] */
    int32_t *edge_perm,                     /* [E] sorted_pos -> original */
    int32_t *node_graph, int32_t *node_pos, /* [N] */
    int32_t *edge_graph,                    /* [E] */
    uint8_t *node_mask, uint8_t *edge_mask, /* [N], [E] */
    int32_t *n_nodes, uint8_t *graph_mask,  /* [G], [G] */
    float *snorm, float *in_degree,         /* [N], [N] */
    int32_t *csr_row_ptr,                   /* [N+1] (do_csr) */
    int32_t *csc_perm, int32_t *csc_row_ptr,/* [E], [N+1] (do_csr) */
    int32_t *rd_node_idx, int32_t *rd_inv,  /* [G*nmax], [N] (nmax>0) */
    int32_t *mb_in_edges, uint8_t *mb_in_mask, int32_t *mb_in_slot,
    int32_t *mb_out_edges, uint8_t *mb_out_mask, int32_t *mb_out_slot,
    int32_t *scratch                        /* [max(N, E) + N + 2] int32 */
) {
    /* node offsets + per-node graph/pos/mask/snorm + rd regroup */
    int32_t off = 0;
    for (int32_t gi = 0; gi < g_real; ++gi) {
        int32_t n = n_per[gi];
        if (nmax > 0 && n > nmax) return ERR_NMAX_OVERFLOW;
        float s = n > 0 ? 1.0f / sqrtf((float)n) : 0.0f;
        for (int32_t j = 0; j < n; ++j) {
            node_graph[off + j] = gi;
            node_pos[off + j] = j;
            node_mask[off + j] = 1;
            snorm[off + j] = s;
            if (nmax > 0) rd_inv[off + j] = gi * nmax + j;
        }
        if (nmax > 0) {
            for (int32_t j = 0; j < n; ++j)
                rd_node_idx[(int64_t)gi * nmax + j] = off + j;
            for (int32_t j = n; j < nmax; ++j)
                rd_node_idx[(int64_t)gi * nmax + j] = N;
        }
        n_nodes[gi] = n;
        graph_mask[gi] = 1;
        off += n;
    }
    for (int32_t i = n_tot; i < N; ++i) {
        node_graph[i] = G; node_pos[i] = 0; node_mask[i] = 0;
        snorm[i] = 0.0f;
        if (nmax > 0) rd_inv[i] = G * nmax;
    }
    for (int32_t gi = g_real; gi < G; ++gi) {
        n_nodes[gi] = 0; graph_mask[gi] = 0;
        if (nmax > 0)
            for (int32_t j = 0; j < nmax; ++j)
                rd_node_idx[(int64_t)gi * nmax + j] = N;
    }

    /* relabel edges into batch node space (padding -> N) */
    off = 0;
    int32_t e_off = 0;
    for (int32_t gi = 0; gi < g_real; ++gi) {
        int32_t ne = e_per[gi];
        for (int32_t j = 0; j < ne; ++j) {
            senders[e_off + j] = src_cat[e_off + j] + off;
            receivers[e_off + j] = dst_cat[e_off + j] + off;
            edge_graph[e_off + j] = gi;
            edge_mask[e_off + j] = 1;
        }
        e_off += ne;
        off += n_per[gi];
    }
    for (int32_t e = e_tot; e < E; ++e) {
        senders[e] = N; receivers[e] = N; edge_graph[e] = G; edge_mask[e] = 0;
    }

    if (do_csr) {
        /* stable sort by receiver (pad N sorts last) = np.argsort stable */
        int32_t *order = scratch;                 /* [E] */
        int32_t *cnt = scratch + E;               /* [N+2] */
        counting_sort(receivers, E, N, cnt, order);
        /* apply the permutation in place via the scratch copy trick:
         * reuse csc_perm as the temp buffer for each int32 field */
        int32_t *tmp = csc_perm;
        #define PERMUTE_I32(arr) do { \
            for (int32_t e = 0; e < E; ++e) tmp[e] = arr[order[e]]; \
            memcpy(arr, tmp, (size_t)E * sizeof(int32_t)); } while (0)
        PERMUTE_I32(senders);
        PERMUTE_I32(receivers);
        PERMUTE_I32(edge_graph);
        for (int32_t e = 0; e < E; ++e)
            ((uint8_t *)tmp)[e] = edge_mask[order[e]];
        memcpy(edge_mask, tmp, (size_t)E);
        memcpy(edge_perm, order, (size_t)E * sizeof(int32_t));

        csr_row_ptr[0] = 0;
        memset(cnt, 0, (size_t)(N + 2) * sizeof(int32_t));
        for (int32_t e = 0; e < E; ++e) {
            int32_t r = receivers[e];
            cnt[r < N ? r : N]++;
        }
        for (int32_t i = 0; i < N; ++i) csr_row_ptr[i + 1] = csr_row_ptr[i] + cnt[i];

        /* CSC: stable sort of the (already receiver-sorted) edges by sender */
        counting_sort(senders, E, N, cnt, csc_perm);
        csc_row_ptr[0] = 0;
        memset(cnt, 0, (size_t)(N + 2) * sizeof(int32_t));
        for (int32_t e = 0; e < E; ++e) {
            int32_t s = senders[e];
            cnt[s < N ? s : N]++;
        }
        for (int32_t i = 0; i < N; ++i) csc_row_ptr[i + 1] = csc_row_ptr[i] + cnt[i];
    } else {
        for (int32_t e = 0; e < E; ++e) edge_perm[e] = e;
    }

    for (int32_t i = 0; i < N; ++i) in_degree[i] = 0.0f;
    for (int32_t e = 0; e < E; ++e) {
        int32_t r = receivers[e];
        if (r >= 0 && r < N) in_degree[r] += 1.0f;
    }

    if (K > 0) {
        int32_t *deg_ctr = scratch;               /* [N] */
        int32_t dm = fill_mailbox(receivers, N, E, K, deg_ctr,
                                  mb_in_edges, mb_in_mask, mb_in_slot);
        if (dm > K) return ERR_DEG_OVERFLOW;
        dm = fill_mailbox(senders, N, E, K, deg_ctr,
                          mb_out_edges, mb_out_mask, mb_out_slot);
        if (dm > K) return ERR_DEG_OVERFLOW;
    }
    return OK;
}
