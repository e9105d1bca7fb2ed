/*
 * Corpus BLEU counting core — native twin of the Python scorer in
 * fbk_fairseq_st_tpu/scoring/bleu.py, matching the reference libbleu's
 * semantics: trim leading pads and trailing eos/pads, then clipped n-gram
 * matching for n = 1..4 over FNV-1a-hashed n-grams.
 *
 * Exposed as a plain C ABI consumed through ctypes; integer counting only,
 * so Python and native paths are bit-identical.
 *
 * Build: see fbk_fairseq_st_tpu/native/build.py (cc -O2 -shared -fPIC).
 */

#include <cstddef>
#include <cstring>
#include <unordered_map>

namespace {

struct Span {
    const int* data;
    size_t len;
};

// Strip leading pads and trailing eos/pads (keeping at least one token).
Span trimmed(const int* sent, size_t len, int pad, int eos) {
    size_t lo = 0;
    while (lo < len && sent[lo] == pad) lo++;
    size_t n = len - lo;
    const int* base = sent + lo;
    while (n > 1 && (base[n - 1] == eos || base[n - 1] == pad)) n--;
    return Span{base, n};
}

// FNV-1a over the n-gram's raw bytes.
size_t fnv1a(const int* gram, size_t n) {
    size_t h = 14695981039346656037ul;
    const unsigned char* bytes = reinterpret_cast<const unsigned char*>(gram);
    for (size_t i = 0; i < n * sizeof(int); i++) {
        h ^= bytes[i];
        h *= 0x100000001b3ul;
    }
    return h;
}

// Clipped n-gram matches: each hypothesis n-gram counts at most as many
// times as it occurs in the reference.
void count_ngrams(size_t n, Span ref, Span hyp, size_t* total, size_t* match) {
    if (hyp.len < n) return;
    const size_t n_hyp = hyp.len - n + 1;
    *total += n_hyp;
    if (ref.len < n) return;

    std::unordered_map<size_t, size_t> hyp_counts;
    hyp_counts.reserve(n_hyp * 2);
    for (size_t i = 0; i < n_hyp; i++) {
        hyp_counts[fnv1a(hyp.data + i, n)]++;
    }
    for (size_t i = 0; i + n <= ref.len; i++) {
        auto it = hyp_counts.find(fnv1a(ref.data + i, n));
        if (it != hyp_counts.end() && it->second > 0) {
            it->second--;
            (*match)++;
        }
    }
}

}  // namespace

typedef struct {
    size_t reflen;
    size_t predlen;
    size_t match1;
    size_t count1;
    size_t match2;
    size_t count2;
    size_t match3;
    size_t count3;
    size_t match4;
    size_t count4;
} bleu_stat;

extern "C" {

void bleu_zero_init(bleu_stat* stat) {
    std::memset(stat, 0, sizeof(bleu_stat));
}

// Sentence-level smoothing: orders 2..4 start with one pseudo-match.
void bleu_one_init(bleu_stat* stat) {
    bleu_zero_init(stat);
    stat->count2 = stat->count3 = stat->count4 = 1;
    stat->match2 = stat->match3 = stat->match4 = 1;
}

void bleu_add(bleu_stat* stat,
              size_t reflen, const int* ref,
              size_t predlen, const int* pred,
              int pad, int eos) {
    Span r = trimmed(ref, reflen, pad, eos);
    Span h = trimmed(pred, predlen, pad, eos);
    stat->reflen += r.len;
    stat->predlen += h.len;
    count_ngrams(1, r, h, &stat->count1, &stat->match1);
    count_ngrams(2, r, h, &stat->count2, &stat->match2);
    count_ngrams(3, r, h, &stat->count3, &stat->match3);
    count_ngrams(4, r, h, &stat->count4, &stat->match4);
}

}  // extern "C"
