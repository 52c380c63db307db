from convolutional_codes_tpu.utils import bitops  # noqa: F401
