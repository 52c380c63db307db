/*
 * Golden-vector harness for the *hard* (BSC-side) reference decoders.
 * Links one of binary-symmetric-channel/{viterbi,stack,fano}-decoder.c
 * (shared decoder.h with the extra path_metric callback arg) and feeds
 * deterministic received symbols straight into decoder_input.
 *
 * Usage: harness_bsc <code_idx> <nblocks> <seed> <mode>
 *   mode 0: uniform random symbols (xs() & mask)
 *   mode 1: encoder output with each coded bit flipped when (xs() % 64) == 0
 * Output per block: "O b0 b1 ... | metric"
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>

#include "code.h"
#include "codebook.h"
#include "encoder.h"
#include "decoder.h"

static uint32_t rs;
static uint32_t xs(void) { uint32_t x = rs; x ^= x << 13; x ^= x >> 17; x ^= x << 5; return rs = x; }

static uint8_t txsym[512];
static int enc_cb(uint8_t* data, uint8_t len, void* ud) {
    (void)ud;
    for (int i = 0; i < len; ++i) txsym[i] = data[i];
    return -1;
}

static uint8_t dec_bits[64];
static int32_t dec_metric = 0;
static int dec_cb(uint8_t* data, uint8_t len, int32_t path_metric, void* ud) {
    (void)ud;
    dec_metric = path_metric;
    for (int i = 0; i < (len + 7) / 8; ++i) dec_bits[i] = data[i];
    return -1;
}

int main(int argc, char** argv) {
    if (argc < 5) return 2;
    int code_idx = atoi(argv[1]);
    int nblocks = atoi(argv[2]);
    rs = (uint32_t)strtoul(argv[3], NULL, 10);
    int mode = atoi(argv[4]);

    struct code_param param;
    get_code((uint8_t)code_idx, &param);
    param.userdata = NULL;

    struct encoder* enc = encoder_create();
    encoder_init(enc, &param);
    encoder_register_callback(enc, enc_cb);

    struct decoder* dec = decoder_create();
    decoder_init(dec, &param);
    decoder_register_callback(dec, dec_cb);

    int T = param.block_len + param.constr_len - 1;
    uint8_t mask = (uint8_t)((1 << param.symlen_out) - 1);
    uint8_t packed[64];
    uint8_t rx[512];

    for (int b = 0; b < nblocks; ++b) {
        if (mode == 1) {
            int nbytes = (param.block_len + 7) / 8;
            for (int i = 0; i < nbytes; ++i) packed[i] = 0;
            for (int i = 0; i < param.block_len; ++i) {
                int bit = (int)(xs() & 1u);
                packed[i / 8] |= (uint8_t)(bit << (7 - (i % 8)));
            }
            encoder_input(enc, packed, param.block_len);
            for (int t = 0; t < T; ++t) {
                uint8_t s = txsym[t];
                for (int k = 0; k < param.symlen_out; ++k) {
                    if ((xs() % 64u) == 0u) s ^= (uint8_t)(1 << k);
                }
                rx[t] = s;
            }
        } else {
            for (int t = 0; t < T; ++t) rx[t] = (uint8_t)(xs() & mask);
        }
        decoder_input(dec, rx, (uint8_t)T);
        printf("O");
        for (int i = 0; i < param.block_len; ++i) {
            printf(" %d", (dec_bits[i / 8] >> (7 - (i % 8))) & 1);
        }
        printf(" | %d\n", dec_metric);
    }
    decoder_destroy(&dec);
    encoder_destroy(&enc);
    return 0;
}
