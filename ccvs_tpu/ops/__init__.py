"""TPU-native ops layer.

Replaces the reference's native CUDA/C++ components with XLA/Pallas
equivalents (reference: `models/skip_vid_generator/modules/upfirdn2d.cpp`,
`fused_bias_act.cpp`, `correlation.py` inline CUDA):

- :mod:`ccvs_tpu.ops.upfirdn2d` — fused upsample-FIR-downsample resampling.
- :mod:`ccvs_tpu.ops.fused_act` — fused bias + leaky-ReLU (+ scale).
- :mod:`ccvs_tpu.ops.correlation` — 7x7 local cost volume (LiteFlowNet-style).
- :mod:`ccvs_tpu.ops.warp` — bilinear backwarp (grid-sample equivalent).
- :mod:`ccvs_tpu.ops.vq` — vector-quantization codebook lookup.
- :mod:`ccvs_tpu.ops.convops` — equalized conv / transposed conv primitives
  with torch-layout weights (for checkpoint porting parity).

All ops use NHWC layout (TPU-preferred) and are jit/grad-compatible.
"""

from ccvs_tpu.ops.upfirdn2d import upfirdn2d, make_resample_kernel
from ccvs_tpu.ops.fused_act import fused_leaky_relu, leaky_relu
from ccvs_tpu.ops.correlation import local_correlation
from ccvs_tpu.ops.warp import backwarp, backwarp_sampled, make_backwarp_grid, grid_sample
from ccvs_tpu.ops.vq import vq_lookup, vq_embed
from ccvs_tpu.ops.convops import conv2d, conv_transpose2d, conv3d

__all__ = [
    "upfirdn2d",
    "make_resample_kernel",
    "fused_leaky_relu",
    "leaky_relu",
    "local_correlation",
    "backwarp",
    "make_backwarp_grid",
    "grid_sample",
    "backwarp_sampled",
    "vq_lookup",
    "vq_embed",
    "conv2d",
    "conv_transpose2d",
    "conv3d",
]
