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

// Count edges per receiver block. counts must hold num_blocks zeros.
void count_receiver_blocks(const int32_t* receivers, int64_t num_edges,
                           int32_t r_block, int32_t num_blocks,
                           int64_t* counts) {
  for (int64_t e = 0; e < num_edges; ++e) {
    ++counts[receivers[e] / r_block];
  }
}

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

// Bucket edges by (receiver chunk, sender chunk) for the ring partition:
// writes each edge's flat bucket id (d * num_devices + o). Also counts per
// bucket (counts must hold num_devices^2 zeros).
void count_ring_buckets(const int32_t* senders, const int32_t* receivers,
                        int64_t num_edges, int32_t nodes_per_device,
                        int32_t num_devices, int64_t* counts) {
  for (int64_t e = 0; e < num_edges; ++e) {
    const int32_t d = receivers[e] / nodes_per_device;
    const int32_t o = senders[e] / nodes_per_device;
    ++counts[static_cast<int64_t>(d) * num_devices + o];
  }
}

}  // extern "C"
