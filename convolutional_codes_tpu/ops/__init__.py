from convolutional_codes_tpu.ops.encoder import encode
from convolutional_codes_tpu.ops.mapper import map_symbols, map_symbols_m
from convolutional_codes_tpu.ops.demapper import soft_demap, hard_demap, hard_decide
from convolutional_codes_tpu.ops.channels import awgn, bsc, awgn_sigma
from convolutional_codes_tpu.ops.viterbi import viterbi_decode_soft, viterbi_decode_hard
from convolutional_codes_tpu.ops.stack import stack_decode_soft, stack_decode_hard
from convolutional_codes_tpu.ops.fano import fano_decode_soft, fano_decode_hard

__all__ = ["encode", "map_symbols", "map_symbols_m",
           "soft_demap", "hard_demap", "hard_decide",
           "awgn", "bsc", "awgn_sigma",
           "viterbi_decode_soft", "viterbi_decode_hard",
           "stack_decode_soft", "stack_decode_hard",
           "fano_decode_soft", "fano_decode_hard",
           "mc_chain_viterbi"]


def mc_chain_viterbi(*args, **kwargs):
    """Fused on-chip Monte-Carlo kernel (TPU only) — lazy import so the CPU
    path never touches Pallas."""
    from convolutional_codes_tpu.ops.fused_chain import mc_chain_viterbi as f
    return f(*args, **kwargs)
