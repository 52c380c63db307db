from convolutional_codes_tpu.parallel.mesh import make_mesh, frames_axis_size
from convolutional_codes_tpu.parallel.montecarlo import sharded_accumulate

__all__ = ["make_mesh", "frames_axis_size", "sharded_accumulate"]
