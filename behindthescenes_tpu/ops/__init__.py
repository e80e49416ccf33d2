from behindthescenes_tpu.ops.grid_sample import grid_sample_2d
from behindthescenes_tpu.ops.posenc import PositionalEncoding
from behindthescenes_tpu.ops.ssim import ssim

__all__ = ["grid_sample_2d", "PositionalEncoding", "ssim"]
