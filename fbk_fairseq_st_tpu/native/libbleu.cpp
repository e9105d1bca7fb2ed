/*
 * Corpus BLEU counting core — native twin of the Python scorer in
 * fbk_fairseq_st_tpu/scoring/bleu.py (semantics of the reference
 * fairseq/clib/libbleu/libbleu.cpp: trim pad/eos, clipped n-gram matching
 * via FNV-1a hashed counts, n = 1..4).
 *
 * Exposed as a plain C ABI consumed through ctypes
 * (fbk_fairseq_st_tpu/scoring/native.py); integer counting only, so Python
 * and native paths are bit-identical.
 *
 * Build: see fbk_fairseq_st_tpu/native/build.py (cc -O2 -shared -fPIC).
 */

#include <cstddef>
#include <cstring>
#include <map>

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

static void bleu_ltrim(size_t* len, const int** sent, int pad) {
    size_t start = 0;
    while (start < *len && (*sent)[start] == pad) {
        start++;
    }
    *sent += start;
    *len -= start;
}

static void bleu_rtrim(size_t* len, const int** sent, int pad, int eos) {
    if (*len == 0) return;
    size_t end = *len - 1;
    while (end > 0 && ((*sent)[end] == eos || (*sent)[end] == pad)) {
        end--;
    }
    *len = end + 1;
}

static void bleu_trim(size_t* len, const int** sent, int pad, int eos) {
    bleu_ltrim(len, sent, pad);
    bleu_rtrim(len, sent, pad, eos);
}

static size_t bleu_hash(size_t n, const int* data) {
    size_t h = 14695981039346656037ul;
    size_t prime = 0x100000001b3;
    const char* b = (const char*)data;
    size_t blen = sizeof(int) * n;
    while (blen-- > 0) {
        h ^= *b++;
        h *= prime;
    }
    return h;
}

static void bleu_addngram(
    size_t* ntotal, size_t* nmatch, size_t n,
    size_t reflen, const int* ref, size_t predlen, const int* pred) {
    if (predlen < n) return;
    predlen = predlen - n + 1;
    (*ntotal) += predlen;
    if (reflen < n) return;
    reflen = reflen - n + 1;

    std::map<size_t, size_t> count;
    while (predlen > 0) {
        size_t w = bleu_hash(n, pred++);
        count[w]++;
        predlen--;
    }
    while (reflen > 0) {
        size_t w = bleu_hash(n, ref++);
        if (count[w] > 0) {
            (*nmatch)++;
            count[w] -= 1;
        }
        reflen--;
    }
}

extern "C" {

void bleu_zero_init(bleu_stat* stat) {
    std::memset(stat, 0, sizeof(bleu_stat));
}

void bleu_one_init(bleu_stat* stat) {
    bleu_zero_init(stat);
    stat->count1 = 0;
    stat->count2 = 1;
    stat->count3 = 1;
    stat->count4 = 1;
    stat->match1 = 0;
    stat->match2 = 1;
    stat->match3 = 1;
    stat->match4 = 1;
}

void bleu_add(
    bleu_stat* stat,
    size_t reflen, const int* ref, size_t predlen, const int* pred,
    int pad, int eos) {
    bleu_trim(&reflen, &ref, pad, eos);
    bleu_trim(&predlen, &pred, pad, eos);
    stat->reflen += reflen;
    stat->predlen += predlen;
    bleu_addngram(&stat->count1, &stat->match1, 1, reflen, ref, predlen, pred);
    bleu_addngram(&stat->count2, &stat->match2, 2, reflen, ref, predlen, pred);
    bleu_addngram(&stat->count3, &stat->match3, 3, reflen, ref, predlen, pred);
    bleu_addngram(&stat->count4, &stat->match4, 4, reflen, ref, predlen, pred);
}

}  // extern "C"
