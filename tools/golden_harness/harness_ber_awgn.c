/*
 * BER-measurement harness for the reference AWGN chain (encoder → mapper →
 * gengauss noise → soft/hard demapper → decoder) with runtime code index
 * and Eb/N0 — the shipped driver fixes the sweep grid and sample tiers
 * (AWGN-channel/main.c:150-211).  Links the actual reference sources; used
 * only to adjudicate published-table discrepancies (the archive rows were
 * found stale for some BSC codes — see results/reference_fresh_bsc.json).
 *
 * Build with exactly one of AWGN-channel/{viterbi,stack,fano}-decoder.c
 * and one of common/{demapper,hard-demapper}.c, like the reference's CMake
 * component selection.
 *
 * Usage: harness_ber_awgn <code_idx> <nblocks> <seed> <ebn0_db_x100>
 * Output: "<bits> <bit_errors> <frame_errors>"
 *
 * The frame-error column exists because decoder bit errors arrive in
 * per-frame bursts; rare-event points need the EVENT count to judge
 * significance (see results/reference_fresh_awgn_stack0.json).
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <math.h>

#include "code.h"
#include "codebook.h"
#include "encoder.h"
#include "mapper.h"
#include "demapper.h"
#include "decoder.h"
#include "gaussian.h"

static struct mapper* map;
static struct demapper* dem;
static struct decoder* dec;
static float scaling;

static int enc_cb(uint8_t* data, uint8_t len, void* ud) {
    (void)ud;
    mapper_input(map, data, len);
    return -1;
}

static int map_cb(float* data, uint8_t len, void* ud) {
    /* len counts FLOATS (one symbol per callback, len == 2), like the
     * reference noise loop (AWGN-channel/main.c:100-102); looping 2*len
     * here read/wrote past the mapper's 2-float buffer and drew two
     * extra gengauss() per symbol (timing + heap corruption bug). */
    (void)ud;
    for (int i = 0; i < (int)len; ++i) data[i] += scaling * gengauss();
    demapper_input(dem, data, len);
    return -1;
}

static int dem_cb(float* data, uint8_t len, void* ud) {
    (void)ud;
    decoder_input(dec, data, len);
    return -1;
}

static uint8_t dec_bits[64];
static int dec_cb(uint8_t* data, uint8_t len, void* ud) {
    (void)ud;
    for (int i = 0; i < (len + 7) / 8; ++i) dec_bits[i] = data[i];
    return -1;
}

int main(int argc, char** argv) {
    if (argc < 5) return 2;
    int code_idx = atoi(argv[1]);
    long nblocks = atol(argv[2]);
    unsigned seed = (unsigned)strtoul(argv[3], NULL, 10);
    double ebn0_db = atol(argv[4]) / 100.0;
    srand(seed);

    struct code_param param;
    get_code((uint8_t)code_idx, &param);
    param.userdata = NULL;

    /* per-component sigma, Eb = Es (AWGN-channel/main.c:153-161) */
    scaling = (float)(sqrt(0.5) * pow(10.0, -ebn0_db / 20.0));

    struct encoder* enc = encoder_create();
    encoder_init(enc, &param);
    encoder_register_callback(enc, enc_cb);
    map = mapper_create();
    mapper_init(map, &param);
    mapper_register_callback(map, map_cb);
    dem = demapper_create();
    demapper_init(dem, &param);
    demapper_register_callback(dem, dem_cb);
    dec = decoder_create();
    decoder_init(dec, &param);
    decoder_register_callback(dec, dec_cb);

    int L = param.block_len;
    int nbytes = (L + 7) / 8;
    uint8_t packed[64];
    long long bits = 0, errs = 0, ferrs = 0;

    for (long b = 0; b < nblocks; ++b) {
        for (int i = 0; i < nbytes; ++i) packed[i] = (uint8_t)(rand() % 256);
        encoder_input(enc, packed, (uint8_t)L);
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
