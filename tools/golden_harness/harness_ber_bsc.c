/*
 * BER-measurement harness for the reference BSC hard-Viterbi chain with a
 * runtime code index (the reference driver hard-codes index 0,
 * binary-symmetric-channel/main.c:113).  Replicates that driver's channel
 * sampling — libc rand()%1000000 < rate_ppm per coded bit, random data via
 * rand() — so a fresh reference measurement can adjudicate published-table
 * discrepancies.  Fixture/diagnostic scaffolding only (links the actual
 * reference sources; never part of the framework).
 *
 * Usage: harness_ber_bsc <code_idx> <nblocks> <seed> <rate_ppm>
 * Output: "<bits> <bit_errors> <frame_errors>"
 *
 * Build with one of binary-symmetric-channel/{viterbi,stack,fano}-decoder.c
 * like the reference's CMake component selection.
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>

#include "code.h"
#include "codebook.h"
#include "encoder.h"
#include "decoder.h"

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
    srand(seed);

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
        for (int i = 0; i < nbytes; ++i) packed[i] = (uint8_t)(rand() % 256);
        /* mask tail of last byte like the reference's full-byte blocks:
           block_len is a multiple of 8 for all shipped codes except WSPR */
        encoder_input(enc, packed, (uint8_t)L);
        int T = T_glob;
        for (int t = 0; t < T; ++t) {
            uint8_t s = txsym[t];
            for (int k = 0; k < param.symlen_out; ++k) {
                if ((rand() % 1000000) < ppm) s ^= (uint8_t)(1 << k);
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
