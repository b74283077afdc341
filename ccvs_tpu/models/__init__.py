"""Model wrappers: pure-function apply/loss bundles over param pytrees.

Replaces the reference's string-mode-dispatched `nn.Module` wrappers
(`models/skip_vid_generator/models/quantized_video_model.py`,
`transformer_model.py`, `state_model.py`, `stft_model.py`) with explicit
functions — the TPU-idiomatic shape for jit/pjit.
"""

from ccvs_tpu.models.autoencoder import FrameAutoencoder
from ccvs_tpu.models.transformer import TokenTransformer
from ccvs_tpu.models.state_model import StateModel
from ccvs_tpu.models.stft_model import StftModel

__all__ = ["FrameAutoencoder", "TokenTransformer", "StateModel", "StftModel"]
