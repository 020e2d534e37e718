// Native graph-preprocessing kernels (host side).
//
// The TPU compute path is JAX/XLA/Pallas; host-side graph layout work
// (receiver blocking for the Pallas SpMM, ring partitioning) is O(E)
// pointer-chasing that NumPy handles poorly at 10^6..10^7 edges, so it
// lives here as a small C++ library loaded via ctypes (the framework's
// native runtime component; the reference has no native code at all —
// SURVEY.md §2).
//
// Build: see gnnra_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Fill the blocked layout in one stable pass.
// out_senders/out_recv_local/out_weights are [num_blocks, e_block],
// pre-zeroed; out_edge_ids pre-filled with the padding id (num_edges).
// Returns 0 on success, -1 on block overflow.
int32_t fill_receiver_blocks(const int32_t* senders, const int32_t* receivers,
                             const float* weights, int64_t num_edges,
                             int32_t r_block, int32_t num_blocks,
                             int32_t e_block, int32_t* out_senders,
                             int32_t* out_recv_local, float* out_weights,
                             int32_t* out_edge_ids) {
  std::vector<int32_t> fill(num_blocks, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    const int32_t b = receivers[e] / r_block;
    const int32_t slot = fill[b]++;
    if (slot >= e_block) return -1;
    const int64_t idx = static_cast<int64_t>(b) * e_block + slot;
    out_senders[idx] = senders[e];
    out_recv_local[idx] = receivers[e] - b * r_block;
    out_weights[idx] = weights[e];
    out_edge_ids[idx] = static_cast<int32_t>(e);
  }
  return 0;
}

// Ring-partition preprocessing (parallel/graph_parallel.partition_for_ring):
// edges bucket by (receiver chunk d, sender chunk o, receiver block b); the
// blocked layout stacks to [D, D, B, e_block]. One O(E) counting pass...
// counts must hold D*D*B zeros.
void count_ring_cells(const int32_t* senders, const int32_t* receivers,
                      int64_t num_edges, int32_t nodes_per_device,
                      int32_t num_devices, int32_t r_block,
                      int64_t* counts) {
  const int64_t blocks = nodes_per_device / r_block;
  for (int64_t e = 0; e < num_edges; ++e) {
    const int64_t d = receivers[e] / nodes_per_device;
    const int64_t o = senders[e] / nodes_per_device;
    const int64_t b = (receivers[e] - d * nodes_per_device) / r_block;
    ++counts[(d * num_devices + o) * blocks + b];
  }
}

// ...and one O(E) stable fill pass. out_* are [D, D, B, e_block],
// pre-zeroed. Sender/receiver ids become chunk-/block-local. Returns 0 on
// success, -1 on cell overflow.
int32_t fill_ring_cells(const int32_t* senders, const int32_t* receivers,
                        const float* weights, int64_t num_edges,
                        int32_t nodes_per_device, int32_t num_devices,
                        int32_t r_block, int32_t e_block,
                        int32_t* out_senders, int32_t* out_recv_local,
                        float* out_weights) {
  const int64_t blocks = nodes_per_device / r_block;
  std::vector<int32_t> fill(
      static_cast<int64_t>(num_devices) * num_devices * blocks, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    const int64_t d = receivers[e] / nodes_per_device;
    const int64_t o = senders[e] / nodes_per_device;
    const int64_t b = (receivers[e] - d * nodes_per_device) / r_block;
    const int64_t cell = (d * num_devices + o) * blocks + b;
    const int32_t slot = fill[cell]++;
    if (slot >= e_block) return -1;
    const int64_t idx = cell * e_block + slot;
    out_senders[idx] = senders[e] - static_cast<int32_t>(o) * nodes_per_device;
    out_recv_local[idx] = receivers[e] -
        static_cast<int32_t>(d) * nodes_per_device -
        static_cast<int32_t>(b) * r_block;
    out_weights[idx] = weights[e];
  }
  return 0;
}

// BFS relabeling over the undirected edge set (graph.reorder_nodes 'bfs'):
// perm[out_pos] = old id in visit order, starting a new BFS from every
// unvisited node in ascending id order. Inputs: CSR of the undirected
// adjacency (offsets [n+1], neighbors [2E]). O(N + E); the NumPy/deque
// version took ~6.5 min at 1M nodes / 10M edges.
void bfs_order(const int64_t* offsets, const int32_t* neighbors,
               int32_t num_nodes, int32_t* perm) {
  std::vector<uint8_t> visited(num_nodes, 0);
  std::vector<int32_t> queue(num_nodes);
  int64_t out_pos = 0;
  for (int32_t start = 0; start < num_nodes; ++start) {
    if (visited[start]) continue;
    visited[start] = 1;
    int64_t q_head = 0, q_tail = 0;
    queue[q_tail++] = start;
    while (q_head < q_tail) {
      const int32_t u = queue[q_head++];
      perm[out_pos++] = u;
      for (int64_t i = offsets[u]; i < offsets[u + 1]; ++i) {
        const int32_t v = neighbors[i];
        if (!visited[v]) {
          visited[v] = 1;
          queue[q_tail++] = v;
        }
      }
    }
  }
}

}  // extern "C"
