// Native token-budget batch packing.
//
// C++ twin of data/batching.py::batch_by_size — the same role the
// reference fills with Cython (fairseq/data/data_utils_fast.pyx:27-68,
// compiled precisely because packing millions of indices in Python is a
// startup bottleneck on large corpora). The algorithm grows a batch while
// (len+1)*running_max_tokens <= max_tokens, respects max_sentences, and on
// overflow splits at the largest multiple of bsz_mult, carrying the
// remainder into the next batch. Batches are therefore contiguous runs
// over the (pre-ordered) index array, so the result is fully described by
// end offsets.
//
// Exposed via ctypes (native/build.py); data/batching.py falls back to the
// pure-Python twin when no toolchain is available and cross-checks both in
// tests/test_native.py.

#include <cstdint>

extern "C" {

// num_tokens: per-position token counts, aligned with the caller's index
//             array (NOT indexed by dataset id).
// batch_ends: out, capacity n; receives the exclusive end offset of each
//             emitted batch.
// Returns the number of batches, or -(i+1) if the sentence at position i
// exceeds max_tokens (caller raises, matching the Python assertion).
int64_t batch_by_size_fast(const int64_t* num_tokens, int64_t n,
                           int64_t max_tokens, int64_t max_sentences,
                           int64_t bsz_mult, int64_t* batch_ends) {
  int64_t n_batches = 0;
  int64_t batch_start = 0;   // inclusive
  int64_t sample_len = 0;    // running max token count within the batch
  for (int64_t i = 0; i < n; ++i) {
    int64_t tok = num_tokens[i];
    if (tok > sample_len) sample_len = tok;
    if (max_tokens > 0 && sample_len > max_tokens) return -(i + 1);
    int64_t batch_len = i - batch_start;  // size BEFORE appending i
    int64_t would_be = (batch_len + 1) * sample_len;
    bool full = batch_len > 0 &&
                ((max_sentences > 0 && batch_len == max_sentences) ||
                 (max_tokens > 0 && would_be > max_tokens));
    if (full) {
      int64_t mod_len = bsz_mult * (batch_len / bsz_mult);
      int64_t rem = batch_len % bsz_mult;
      if (rem > mod_len) mod_len = rem;
      batch_ends[n_batches++] = batch_start + mod_len;
      batch_start += mod_len;
      // recompute the running max over the carried remainder + i
      sample_len = 0;
      for (int64_t j = batch_start; j <= i; ++j)
        if (num_tokens[j] > sample_len) sample_len = num_tokens[j];
    }
  }
  if (batch_start < n) batch_ends[n_batches++] = n;
  return n_batches;
}

// Token-block chunking, break_mode='complete' (role of the reference's
// Cython _get_slice_indices_fast, token_block_utils_fast.pyx): greedily
// pack whole sentences into blocks of at most block_size tokens (a lone
// oversize sentence still forms its own block). Writes (start, end) token
// offsets; returns the block count. Capacity required: n pairs.
int64_t token_block_complete(const int64_t* sizes, int64_t n,
                             int64_t block_size, int64_t* starts,
                             int64_t* ends) {
  int64_t n_blocks = 0;
  int64_t tok_idx = 0;
  int64_t curr = 0;
  for (int64_t i = 0; i < n;) {
    if (curr == 0 || curr + sizes[i] <= block_size) {
      curr += sizes[i];
      ++i;
    } else {
      starts[n_blocks] = tok_idx;
      ends[n_blocks] = tok_idx + curr;
      ++n_blocks;
      tok_idx += curr;
      curr = 0;
    }
  }
  if (curr > 0) {
    starts[n_blocks] = tok_idx;
    ends[n_blocks] = tok_idx + curr;
    ++n_blocks;
  }
  return n_blocks;
}

}  // extern "C"
