/*
 * Batched Levenshtein edit distance + alignment path — native twin of the
 * reference libnat (fairseq/clib/libnat/edit_dist.cpp compute_ed2 /
 * suggested_ed2_path) used for NAT target preparation, and of the
 * device-side DP in fbk_fairseq_st_tpu/ops/edit_distance.py.
 *
 * C ABI (ctypes):
 *   edit_distance(a, a_len, b, b_len) -> int
 *   edit_distance_batch(a (B x Ta), a_lens, b (B x Tb), b_lens, B, Ta, Tb,
 *                       out (B,))
 *   suggested_path(a, a_len, b, b_len, ops_out) -> writes per-position ops
 *     (0 = match/sub, 1 = insert-into-a, 2 = delete-from-a) backtracked
 *     from the DP table; returns path length.
 */

#include <algorithm>
#include <cstddef>
#include <vector>

static int ed(const int* a, int la, const int* b, int lb,
              std::vector<std::vector<int>>* table_out) {
    std::vector<std::vector<int>> d(la + 1, std::vector<int>(lb + 1, 0));
    for (int i = 0; i <= la; i++) d[i][0] = i;
    for (int j = 0; j <= lb; j++) d[0][j] = j;
    for (int i = 1; i <= la; i++) {
        for (int j = 1; j <= lb; j++) {
            int sub = d[i - 1][j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0);
            int del = d[i - 1][j] + 1;
            int ins = d[i][j - 1] + 1;
            d[i][j] = std::min(sub, std::min(del, ins));
        }
    }
    if (table_out) *table_out = d;
    return d[la][lb];
}

extern "C" {

int edit_distance(const int* a, int la, const int* b, int lb) {
    return ed(a, la, b, lb, nullptr);
}

void edit_distance_batch(
    const int* a, const int* a_lens,
    const int* b, const int* b_lens,
    int bsz, int ta, int tb, int* out) {
    for (int i = 0; i < bsz; i++) {
        out[i] = ed(a + (size_t)i * ta, a_lens[i], b + (size_t)i * tb, b_lens[i],
                    nullptr);
    }
}

/* Backtracked edit path; ops_out must have room for la + lb entries.
 * Returns the path length. */
int suggested_path(const int* a, int la, const int* b, int lb, int* ops_out) {
    std::vector<std::vector<int>> d;
    ed(a, la, b, lb, &d);
    int i = la, j = lb, n = 0;
    std::vector<int> rev;
    while (i > 0 || j > 0) {
        if (i > 0 && j > 0 &&
            d[i][j] == d[i - 1][j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0)) {
            rev.push_back(0);
            i--; j--;
        } else if (j > 0 && d[i][j] == d[i][j - 1] + 1) {
            rev.push_back(1);
            j--;
        } else {
            rev.push_back(2);
            i--;
        }
        n++;
    }
    for (int k = 0; k < n; k++) ops_out[k] = rev[n - 1 - k];
    return n;
}

}  // extern "C"
