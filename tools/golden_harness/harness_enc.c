/*
 * Golden-vector harness: drives the *reference* encoder (linked from the
 * read-only checkout, not copied) with deterministic xorshift32 inputs and
 * dumps the emitted channel symbols.  Used once by tools/gen_goldens.py to
 * pin fixtures in tests/goldens/ and to validate tests/golden_model.py.
 *
 * Usage: harness_enc <code_idx> <nblocks> <seed>
 * Output: one line per block: "S s0 s1 ... s{T-1}"
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>

#include "code.h"
#include "codebook.h"
#include "encoder.h"

static uint32_t rs;
static uint32_t xs(void) { uint32_t x = rs; x ^= x << 13; x ^= x >> 17; x ^= x << 5; return rs = x; }

static int enc_cb(uint8_t* data, uint8_t len, void* ud) {
    (void)ud;
    printf("S");
    for (int i = 0; i < len; ++i) printf(" %d", data[i]);
    printf("\n");
    return -1;
}

int main(int argc, char** argv) {
    if (argc < 4) return 2;
    int code_idx = atoi(argv[1]);
    int nblocks = atoi(argv[2]);
    rs = (uint32_t)strtoul(argv[3], NULL, 10);

    struct code_param param;
    get_code((uint8_t)code_idx, &param);
    param.userdata = NULL;

    struct encoder* enc = encoder_create();
    encoder_init(enc, &param);
    encoder_register_callback(enc, enc_cb);

    uint8_t packed[64];
    for (int b = 0; b < nblocks; ++b) {
        int nbytes = (param.block_len + 7) / 8;
        for (int i = 0; i < nbytes; ++i) packed[i] = 0;
        printf("B");
        for (int i = 0; i < param.block_len; ++i) {
            int bit = (int)(xs() & 1u);
            printf(" %d", bit);
            packed[i / 8] |= (uint8_t)(bit << (7 - (i % 8)));
        }
        printf("\n");
        encoder_input(enc, packed, param.block_len);
    }
    encoder_destroy(&enc);
    return 0;
}
