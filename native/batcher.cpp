// Native host-side batch packer.
//
// The input pipeline's hot loop: scatter a set of variable-size graphs into
// fixed-shape padded batch arrays (nodes, edges sorted by destination,
// masks, graph ids, eigendata).  The Python/numpy implementation
// (signnet_basisnet_tpu/data/batcher.py) allocates and copies per batch; at
// ZINC scale (10k graphs x 1000 epochs) that host work competes with the
// TPU step.  This C++ version packs into caller-provided buffers with one
// pass and a counting sort by destination (edges within a graph arrive in
// arbitrary order; counting sort is O(E + N) and stable).
//
// Layout contract mirrors graph/batch.py:
//   - padding edges point at node num_nodes-1, padding nodes/edges belong to
//     the padding graph (last slot)
//   - edges sorted by receiver, padding edges last
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Pack one batch.
//
// Inputs are concatenated per-graph arrays with prefix offsets:
//   node_off[g]..node_off[g+1]  -> nodes of graph g (features, eigvecs)
//   edge_off[g]..edge_off[g+1]  -> edges of graph g (senders/receivers local)
// graph_ids: the graphs to pack, in order.
//
// Outputs are preallocated by the caller at padded sizes:
//   senders/receivers [E_pad] int32, edge_mask [E_pad] f32,
//   graph_id [N_pad] int32, edge_graph_id [E_pad] int32,
//   node_mask [N_pad] f32, n_node/n_edge [G_pad] int32, graph_mask [G_pad],
//   node_feat_out [N_pad * nf_dim] (int32), edge_feat_out [E_pad * ef_dim],
//   eigvec_out [N_pad * k] f32, eigval_out [G_pad * k] f32,
//   eig_mask_out [N_pad * k] f32, y_out [G_pad * y_dim] f32.
// Any feature pointer may be null to skip.
//
// Returns 0 on success, -1 if the batch does not fit.
int pack_batch(
    const int32_t* graph_sel, int32_t n_sel,
    const int64_t* node_off, const int64_t* edge_off,
    const int32_t* senders_all, const int32_t* receivers_all,
    const int32_t* node_feat_all, int32_t nf_dim,
    const int32_t* edge_feat_all, int32_t ef_dim,
    const float* eigvec_all, int32_t k_src, const int32_t* eig_counts,
    const float* eigval_all, int32_t k_val_src,
    const float* y_all, int32_t y_dim,
    int32_t num_nodes, int32_t num_edges, int32_t num_graphs, int32_t k,
    int32_t* senders_out, int32_t* receivers_out, float* edge_mask_out,
    int32_t* graph_id_out, int32_t* edge_graph_id_out, float* node_mask_out,
    int32_t* n_node_out, int32_t* n_edge_out, float* graph_mask_out,
    int32_t* node_feat_out, int32_t* edge_feat_out,
    float* eigvec_out, float* eigval_out, float* eig_mask_out, float* y_out) {
  if (n_sel + 1 > num_graphs) return -1;

  const int32_t pad_gid = num_graphs - 1;
  // init padding defaults
  for (int32_t e = 0; e < num_edges; ++e) {
    senders_out[e] = num_nodes - 1;
    receivers_out[e] = num_nodes - 1;
    edge_mask_out[e] = 0.f;
    edge_graph_id_out[e] = pad_gid;
  }
  for (int32_t n = 0; n < num_nodes; ++n) {
    graph_id_out[n] = pad_gid;
    node_mask_out[n] = 0.f;
  }
  std::memset(n_node_out, 0, sizeof(int32_t) * num_graphs);
  std::memset(n_edge_out, 0, sizeof(int32_t) * num_graphs);
  std::memset(graph_mask_out, 0, sizeof(float) * num_graphs);
  if (node_feat_out) std::memset(node_feat_out, 0, sizeof(int32_t) * (int64_t)num_nodes * nf_dim);
  if (edge_feat_out) std::memset(edge_feat_out, 0, sizeof(int32_t) * (int64_t)num_edges * ef_dim);
  if (eigvec_out) std::memset(eigvec_out, 0, sizeof(float) * (int64_t)num_nodes * k);
  if (eigval_out) std::memset(eigval_out, 0, sizeof(float) * (int64_t)num_graphs * k);
  if (eig_mask_out) std::memset(eig_mask_out, 0, sizeof(float) * (int64_t)num_nodes * k);
  if (y_out) std::memset(y_out, 0, sizeof(float) * (int64_t)num_graphs * y_dim);

  // first pass: copy nodes, collect edges (unsorted, global ids)
  int64_t node_cursor = 0, edge_cursor = 0;
  std::vector<int32_t> es, er, egid;
  std::vector<int64_t> esrc_row;  // source row in edge_feat_all
  for (int32_t gi = 0; gi < n_sel; ++gi) {
    const int32_t g = graph_sel[gi];
    const int64_t n0 = node_off[g], n1 = node_off[g + 1];
    const int64_t e0 = edge_off[g], e1 = edge_off[g + 1];
    const int64_t n = n1 - n0, e = e1 - e0;
    if (node_cursor + n > num_nodes || edge_cursor + e > num_edges) return -1;

    for (int64_t j = 0; j < n; ++j) {
      const int64_t out_n = node_cursor + j;
      graph_id_out[out_n] = gi;
      node_mask_out[out_n] = 1.f;
      if (node_feat_out)
        std::memcpy(node_feat_out + out_n * nf_dim,
                    node_feat_all + (n0 + j) * nf_dim,
                    sizeof(int32_t) * nf_dim);
      if (eigvec_out) {
        int32_t kk = eig_counts ? eig_counts[g] : k_src;
        if (kk > k) kk = k;
        std::memcpy(eigvec_out + out_n * k, eigvec_all + (n0 + j) * k_src,
                    sizeof(float) * kk);
        for (int32_t q = 0; q < kk; ++q) eig_mask_out[out_n * k + q] = 1.f;
      }
    }
    for (int64_t j = 0; j < e; ++j) {
      es.push_back((int32_t)(senders_all[e0 + j] + node_cursor));
      er.push_back((int32_t)(receivers_all[e0 + j] + node_cursor));
      egid.push_back(gi);
      esrc_row.push_back(e0 + j);
    }
    n_node_out[gi] = (int32_t)n;
    n_edge_out[gi] = (int32_t)e;
    graph_mask_out[gi] = 1.f;
    if (eigval_out) {
      const int32_t kk = k_val_src < k ? k_val_src : k;
      std::memcpy(eigval_out + (int64_t)gi * k, eigval_all + (int64_t)g * k_val_src,
                  sizeof(float) * kk);
    }
    if (y_out)
      std::memcpy(y_out + (int64_t)gi * y_dim, y_all + (int64_t)g * y_dim,
                  sizeof(float) * y_dim);
    node_cursor += n;
    edge_cursor += e;
  }

  // counting sort by receiver (stable)
  const int64_t E = (int64_t)es.size();
  std::vector<int32_t> count(num_nodes + 1, 0);
  for (int64_t j = 0; j < E; ++j) count[er[j] + 1]++;
  for (int32_t n = 0; n < num_nodes; ++n) count[n + 1] += count[n];
  for (int64_t j = 0; j < E; ++j) {
    const int32_t pos = count[er[j]]++;
    senders_out[pos] = es[j];
    receivers_out[pos] = er[j];
    edge_mask_out[pos] = 1.f;
    edge_graph_id_out[pos] = egid[j];
    if (edge_feat_out)
      std::memcpy(edge_feat_out + (int64_t)pos * ef_dim,
                  edge_feat_all + esrc_row[j] * ef_dim,
                  sizeof(int32_t) * ef_dim);
  }
  return 0;
}

}  // extern "C"
