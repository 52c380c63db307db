from convolutional_codes_tpu.ops.encoder import encode
from convolutional_codes_tpu.ops.mapper import map_symbols
from convolutional_codes_tpu.ops.demapper import soft_demap, hard_demap
from convolutional_codes_tpu.ops.channels import awgn, bsc, awgn_sigma

__all__ = ["encode", "map_symbols", "soft_demap", "hard_demap",
           "awgn", "bsc", "awgn_sigma"]
