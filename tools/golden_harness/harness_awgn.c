/*
 * Golden-vector harness for the *soft* (AWGN-side) reference decoders.
 * Links one of AWGN-channel/{viterbi,stack,fano}-decoder.c (they share the
 * same decoder.h API) and feeds deterministic distance vectors straight into
 * decoder_input, bypassing mapper/channel so outputs are bit-reproducible.
 *
 * Usage: harness_awgn <code_idx> <nblocks> <seed> <mode>
 *   mode 0: uniform pseudo-random distances (x & 0xFFFF) / 4096.0f
 *   mode 1: decodable distances 0.5*hamming(e, tx_sym) + (x & 0xFF)/1024.0f,
 *           tx symbols produced by the reference encoder on random blocks.
 * Output per block: "D d0 d1 ..." distance stream (only mode prints inputs
 * implicitly via the shared RNG) then "O b0 b1 ..." decoded bits.
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
static int txsym_n = 0;
static int enc_cb(uint8_t* data, uint8_t len, void* ud) {
    (void)ud;
    txsym_n = len;
    for (int i = 0; i < len; ++i) txsym[i] = data[i];
    return -1;
}

static int dec_len = -1;
static uint8_t dec_bits[64];
static int dec_cb(uint8_t* data, uint8_t len, void* ud) {
    (void)ud;
    dec_len = len;
    for (int i = 0; i < (len + 7) / 8; ++i) dec_bits[i] = data[i];
    return -1;
}

static int popcnt8(uint8_t v) { int c = 0; while (v) { c += v & 1; v >>= 1; } return c; }

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
    int M = 1 << param.symlen_out;
    float dist[8];
    uint8_t packed[64];

    for (int b = 0; b < nblocks; ++b) {
        if (mode == 1) {
            int nbytes = (param.block_len + 7) / 8;
            for (int i = 0; i < nbytes; ++i) packed[i] = 0;
            for (int i = 0; i < param.block_len; ++i) {
                int bit = (int)(xs() & 1u);
                packed[i / 8] |= (uint8_t)(bit << (7 - (i % 8)));
            }
            encoder_input(enc, packed, param.block_len);
        }
        for (int t = 0; t < T; ++t) {
            for (int e = 0; e < M; ++e) {
                uint32_t r = xs();
                if (mode == 1) {
                    dist[e] = 0.5f * (float)popcnt8((uint8_t)(e ^ txsym[t]))
                              + (float)(r & 0xFFu) / 1024.0f;
                } else {
                    dist[e] = (float)(r & 0xFFFFu) / 4096.0f;
                }
            }
            decoder_input(dec, dist, (uint8_t)M);
        }
        printf("O");
        for (int i = 0; i < param.block_len; ++i) {
            printf(" %d", (dec_bits[i / 8] >> (7 - (i % 8))) & 1);
        }
        printf("\n");
    }
    decoder_destroy(&dec);
    encoder_destroy(&enc);
    return 0;
}
