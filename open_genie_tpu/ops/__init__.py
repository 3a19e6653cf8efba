"""Functional TPU-first compute primitives (XLA + Pallas)."""
from open_genie_tpu.ops.attention import dot_product_attention
from open_genie_tpu.ops.conv import (
    causal_conv3d,
    causal_conv_transpose3d,
    causal_time_pad,
    conv2d,
    conv3d,
)
from open_genie_tpu.ops.lfq import (
    lfq_avg_entropy,
    lfq_loss,
    lfq_quantize,
    lfq_sample_entropy,
)
from open_genie_tpu.ops.resample import (
    blur_kernel_2d,
    blur_kernel_3d,
    blur_pool_2d,
    blur_pool_3d,
    depth_to_space,
    depth_to_spacetime,
    depth_to_time,
    space_to_depth,
)
from open_genie_tpu.ops.rope import apply_rope, rope_frequencies
