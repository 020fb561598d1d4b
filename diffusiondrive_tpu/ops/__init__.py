from diffusiondrive_tpu.ops.ddim import DDIMScheduler
from diffusiondrive_tpu.ops.embed import gen_sineembed_for_position, sinusoidal_pos_emb
from diffusiondrive_tpu.ops.hungarian import batched_linear_sum_assignment, linear_sum_assignment
from diffusiondrive_tpu.ops.lidar_splat import splat_points
from diffusiondrive_tpu.ops.sampling import (
    adaptive_avg_pool2d,
    grid_sample_2d,
    resize_bilinear,
    resize_bilinear_no_aa,
)
from diffusiondrive_tpu.ops.savgol import savgol_filter_jax

__all__ = [
    "DDIMScheduler",
    "adaptive_avg_pool2d",
    "batched_linear_sum_assignment",
    "gen_sineembed_for_position",
    "grid_sample_2d",
    "linear_sum_assignment",
    "resize_bilinear",
    "resize_bilinear_no_aa",
    "savgol_filter_jax",
    "sinusoidal_pos_emb",
    "splat_points",
]
