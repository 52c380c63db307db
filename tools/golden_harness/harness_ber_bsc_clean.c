/*
 * harness_ber_bsc.c with the channel RNG replaced by splitmix64 and an
 * exact 2^64 threshold — the IDEAL binary symmetric channel (no modulo
 * bias, no lagged-Fibonacci serial correlation), i.e. the channel the
 * framework's threefry / coordinate-hash samplers draw from.  Used to
 * extend results/reference_fresh_bsc_seq.json: the published BSC tables
 * inherit the reference driver's glibc rand()%1e6 sampling artifacts
 * (binary-symmetric-channel/main.c:61-68), which burst-sensitive
 * sequential decoders amplify at mid crossovers.
 *
 * Usage: harness_ber_bsc_clean <code_idx> <nblocks> <seed> <rate_ppm>
 * Output: "<bits> <bit_errors> <frame_errors>"
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>

#include "code.h"
#include "codebook.h"
#include "encoder.h"
#include "decoder.h"

static uint64_t sm_state;

static uint64_t splitmix64(void) {
    uint64_t z = (sm_state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

static uint8_t txsym[512];
static int T_glob;
static int enc_cb(uint8_t* data, uint8_t len, void* ud) {
    (void)ud;
    for (int i = 0; i < len; ++i) txsym[i] = data[i];
    T_glob = len;
    return -1;
}

static uint8_t dec_bits[64];
static int dec_cb(uint8_t* data, uint8_t len, int32_t path_metric, void* ud) {
    (void)ud; (void)path_metric;
    for (int i = 0; i < (len + 7) / 8; ++i) dec_bits[i] = data[i];
    return -1;
}

int main(int argc, char** argv) {
    if (argc < 5) return 2;
    int code_idx = atoi(argv[1]);
    long nblocks = atol(argv[2]);
    unsigned seed = (unsigned)strtoul(argv[3], NULL, 10);
    long ppm = atol(argv[4]);
    sm_state = 0x243F6A8885A308D3ULL ^ (uint64_t)seed * 0x100000001B3ULL;
    /* exact threshold: flip iff u64 < p * 2^64 (ppm/1e6 scaled).
     * ppm >= 1e6 makes thr exactly 2^64, which truncates to 0 in the
     * uint64 — saturate so p = 1.0 flips every bit instead of none. */
    __uint128_t thr = ((__uint128_t)ppm << 64) / 1000000u;
    uint64_t threshold = (ppm >= 1000000) ? UINT64_MAX : (uint64_t)thr;

    struct code_param param;
    get_code((uint8_t)code_idx, &param);
    param.userdata = NULL;

    struct encoder* enc = encoder_create();
    encoder_init(enc, &param);
    encoder_register_callback(enc, enc_cb);

    struct decoder* dec = decoder_create();
    decoder_init(dec, &param);
    decoder_register_callback(dec, dec_cb);

    int L = param.block_len;
    int nbytes = (L + 7) / 8;
    uint8_t packed[64];
    long long bits = 0, errs = 0, ferrs = 0;

    for (long b = 0; b < nblocks; ++b) {
        for (int i = 0; i < nbytes; ++i)
            packed[i] = (uint8_t)(splitmix64() & 0xFF);
        encoder_input(enc, packed, (uint8_t)L);
        int T = T_glob;
        for (int t = 0; t < T; ++t) {
            uint8_t s = txsym[t];
            for (int k = 0; k < param.symlen_out; ++k) {
                if (splitmix64() < threshold) s ^= (uint8_t)(1 << k);
            }
            txsym[t] = s;
        }
        decoder_input(dec, txsym, (uint8_t)T);
        long long before = errs;
        for (int i = 0; i < L; ++i) {
            int tx = (packed[i / 8] >> (7 - (i % 8))) & 1;
            int rxb = (dec_bits[i / 8] >> (7 - (i % 8))) & 1;
            if (tx != rxb) ++errs;
        }
        if (errs != before) ++ferrs;
        bits += L;
    }
    printf("%lld %lld %lld\n", bits, errs, ferrs);
    return 0;
}
