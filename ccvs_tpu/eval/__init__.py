"""Offline evaluation: PSNR/SSIM/LPIPS and FVD.

Replaces `tools/pytorch_metrics/metrics.py` (piq/skimage) and
`tools/tf_fvd/fvd.py` (TF1 + tfhub I3D) with self-contained JAX/NumPy
implementations.
"""

from ccvs_tpu.eval.metrics import lpips, psnr, ssim, video_metrics
from ccvs_tpu.eval.fvd import frechet_distance, fvd_from_videos

__all__ = ["psnr", "ssim", "lpips", "video_metrics", "frechet_distance", "fvd_from_videos"]
