"""TPU-native convolutional-code simulation and decoding framework.

A brand-new JAX/XLA/Pallas framework with the full capabilities of the C
reference ``thomas-emig/convolutional-codes``: table-driven codebook,
shift-register convolutional encoder with tail termination, Gray-coded QAM
constellation mapper, AWGN / binary-symmetric channels with on-device RNG,
soft and hard demappers, and three decoder families (Viterbi, stack, Fano).

Design principles (TPU-first, not a port):
  * A code is *data* (trellis tables / tap integers), not behavior.
  * Every pipeline stage is a pure function over ``[batch, ...]`` arrays.
  * Hot loops (Viterbi add-compare-select) run as Pallas VPU kernels.
  * Monte-Carlo sweeps shard frames x SNR points over a ``jax.sharding.Mesh``
    with ``psum`` error aggregation; long frames use time-block trellis
    partitioning with state handoff.
"""

__version__ = "0.1.0"

from convolutional_codes_tpu.models.codebook import Code, get_code, register_code, list_codes

__all__ = ["Code", "get_code", "register_code", "list_codes", "__version__"]
