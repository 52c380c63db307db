/*
 * Native host-side runtime: clean-room C implementation of the framework's
 * behavioral contract (encoder + block Viterbi decoders), matching the C
 * reference bit-for-bit (semantics documented in SURVEY.md; reference:
 * common/encoder.c, AWGN-channel/viterbi-decoder.c,
 * binary-symmetric-channel/viterbi-decoder.c — reimplemented, not copied).
 *
 * Purpose in the TPU framework:
 *   - fast fuzz oracle for the JAX/Pallas decoders (tests/test_native.py
 *     cross-checks millions of trellis steps beyond the pinned goldens),
 *   - host-side fallback decoder for environments without an accelerator.
 *
 * Built as a shared library via tools/build_native.py; bound with ctypes
 * (convolutional_codes_tpu/utils/native.py).  Batch-level APIs operate on
 * unpacked bit/symbol arrays to mirror the device layout.
 */

#include <stdint.h>
#include <string.h>
#include <math.h>
#include <stdlib.h>

#define MAX_POLYS 8

typedef struct {
    int32_t symlen_out;
    int32_t constraint_length;
    int32_t block_length;      /* info bits per block */
    int32_t compat_parity;     /* 1 = reference effective parity */
    uint32_t polynomials[MAX_POLYS]; /* low-bit form, newest tap at K-1 */
} cc_params;

/* Quirk mask in low-bit register space (SURVEY.md §2c): 64-bit positions
 * {4,12,...,60} shifted into the K-bit register. */
static uint32_t quirk_mask_low(int k) {
    uint32_t m = 0;
    for (int j = 4; j <= 60; j += 8) {
        int b = j - 64 + k;
        if (b >= 0 && b < k) m |= (uint32_t)1u << b;
    }
    return m;
}

static inline int parity32(uint32_t x) {
    return __builtin_parity(x);
}

/* Expected symbol for register r (K bits, newest input at bit K-1). */
static inline int expected_symbol(const cc_params* p, uint32_t quirk,
                                  uint32_t r) {
    int sym = 0;
    for (int n = 0; n < p->symlen_out; ++n) {
        uint32_t x = r & p->polynomials[n];
        int bit = parity32(x);
        if (p->compat_parity && parity32(x & quirk)) bit = 0;
        sym = (sym << 1) | bit;
    }
    return sym;
}

/* ---- encoder -------------------------------------------------------- */

/* bits_in: [nblocks][block_length] (0/1 int8); syms_out: [nblocks][T] int32
 * with T = block_length + K - 1 (auto tail termination). */
void cc_encode_blocks(const cc_params* p, const int8_t* bits_in,
                      int32_t* syms_out, int64_t nblocks) {
    const int K = p->constraint_length;
    const int L = p->block_length;
    const int T = L + K - 1;
    const uint32_t quirk = quirk_mask_low(K);
    for (int64_t b = 0; b < nblocks; ++b) {
        const int8_t* bits = bits_in + b * L;
        int32_t* out = syms_out + b * T;
        uint32_t reg = 0;
        for (int t = 0; t < T; ++t) {
            int bit = (t < L) ? bits[t] : 0;
            reg = (reg >> 1) | ((uint32_t)bit << (K - 1));
            out[t] = expected_symbol(p, quirk, reg);
        }
    }
}

/* ---- Viterbi -------------------------------------------------------- */

#define HARD_SAT 0xFF00

/* Soft decode: dists [nblocks][T][2^m] float32 → bits_out [nblocks][L]. */
void cc_viterbi_soft_blocks(const cc_params* p, const float* dists,
                            int8_t* bits_out, int64_t nblocks) {
    const int K = p->constraint_length;
    const int L = p->block_length;
    const int T = L + K - 1;
    const int S = 1 << (K - 1);
    const int M = 1 << p->symlen_out;
    const uint32_t quirk = quirk_mask_low(K);

    float* metrics = malloc(sizeof(float) * S);
    float* newm = malloc(sizeof(float) * S);
    uint8_t* dec = malloc((size_t)T * S);      /* chosen predecessor parity */
    int* esym = malloc(sizeof(int) * S * 2);   /* esym[state][input] */
    for (int s = 0; s < S; ++s)
        for (int i = 0; i < 2; ++i)
            esym[2 * s + i] = expected_symbol(
                p, quirk, (uint32_t)s | ((uint32_t)i << (K - 1)));

    for (int64_t b = 0; b < nblocks; ++b) {
        const float* d = dists + (size_t)b * T * M;
        for (int s = 0; s < S; ++s) metrics[s] = INFINITY;
        metrics[0] = 0.0f;
        for (int t = 0; t < T; ++t) {
            const float* row = d + (size_t)t * M;
            for (int ns = 0; ns < S; ++ns) {
                int inp = ns >> (K - 2);
                int p0 = (ns & ((S >> 1) - 1)) << 1;
                float c0 = metrics[p0] + row[esym[2 * p0 + inp]];
                float c1 = metrics[p0 + 1] + row[esym[2 * (p0 + 1) + inp]];
                int pick1 = c1 < c0;             /* strict: ties → even pred */
                newm[ns] = pick1 ? c1 : c0;
                dec[(size_t)t * S + ns] = (uint8_t)pick1;
            }
            memcpy(metrics, newm, sizeof(float) * S);
        }
        int cur = 0;
        float best = INFINITY;
        for (int s = 0; s < S; ++s)
            if (metrics[s] < best) { best = metrics[s]; cur = s; }
        int8_t* out = bits_out + b * L;
        for (int t = T - 1; t >= 0; --t) {
            int bit = cur >> (K - 2);
            int prev = ((cur & ((S >> 1) - 1)) << 1) | dec[(size_t)t * S + cur];
            if (t < L) out[t] = (int8_t)bit;
            cur = prev;
        }
    }
    free(metrics); free(newm); free(dec); free(esym);
}

/* Hard decode: rx [nblocks][T] int32 symbols → bits_out [nblocks][L],
 * path_metric_out [nblocks] int32 (saturating 0xFF00 arithmetic). */
void cc_viterbi_hard_blocks(const cc_params* p, const int32_t* rx,
                            int8_t* bits_out, int32_t* path_metric_out,
                            int64_t nblocks) {
    const int K = p->constraint_length;
    const int L = p->block_length;
    const int T = L + K - 1;
    const int S = 1 << (K - 1);
    const uint32_t quirk = quirk_mask_low(K);

    int32_t* metrics = malloc(sizeof(int32_t) * S);
    int32_t* newm = malloc(sizeof(int32_t) * S);
    uint8_t* dec = malloc((size_t)T * S);
    int* esym = malloc(sizeof(int) * S * 2);
    for (int s = 0; s < S; ++s)
        for (int i = 0; i < 2; ++i)
            esym[2 * s + i] = expected_symbol(
                p, quirk, (uint32_t)s | ((uint32_t)i << (K - 1)));

    for (int64_t b = 0; b < nblocks; ++b) {
        const int32_t* r = rx + (size_t)b * T;
        for (int s = 0; s < S; ++s) metrics[s] = HARD_SAT;
        metrics[0] = 0;
        for (int t = 0; t < T; ++t) {
            int sym = r[t];
            for (int ns = 0; ns < S; ++ns) {
                int inp = ns >> (K - 2);
                int p0 = (ns & ((S >> 1) - 1)) << 1;
                int32_t c0 = metrics[p0]
                    + __builtin_popcount((unsigned)(esym[2 * p0 + inp] ^ sym));
                int32_t c1 = metrics[p0 + 1]
                    + __builtin_popcount((unsigned)(esym[2 * (p0 + 1) + inp] ^ sym));
                if (c0 > HARD_SAT) c0 = HARD_SAT;
                if (c1 > HARD_SAT) c1 = HARD_SAT;
                int pick1 = c1 < c0;
                newm[ns] = pick1 ? c1 : c0;
                dec[(size_t)t * S + ns] = (uint8_t)pick1;
            }
            memcpy(metrics, newm, sizeof(int32_t) * S);
        }
        int cur = 0;
        int32_t best = HARD_SAT;
        for (int s = 0; s < S; ++s)
            if (metrics[s] < best) { best = metrics[s]; cur = s; }
        path_metric_out[b] = best;
        int8_t* out = bits_out + b * L;
        for (int t = T - 1; t >= 0; --t) {
            int bit = cur >> (K - 2);
            int prev = ((cur & ((S >> 1) - 1)) << 1) | dec[(size_t)t * S + cur];
            if (t < L) out[t] = (int8_t)bit;
            cur = prev;
        }
    }
    free(metrics); free(newm); free(dec); free(esym);
}
