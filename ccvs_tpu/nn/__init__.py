"""Networks (flax, NHWC, torch-layout params for checkpoint porting)."""

from ccvs_tpu.nn.encoder import SkipEncoder
from ccvs_tpu.nn.decoder import SkipDecoder, InterBlock, interblock_schedule
from ccvs_tpu.nn.gpt import GPT, CGPT, GPTCore, Schedule, build_schedule
from ccvs_tpu.nn.discriminators import (
    FeatureDiscriminator,
    ImageDiscriminator,
    VideoDiscriminator,
)
from ccvs_tpu.nn.state import StateEstimator, StftDecoder, StftEncoder
from ccvs_tpu.nn.quantizer import VectorQuantizer

__all__ = [
    "SkipEncoder",
    "SkipDecoder",
    "InterBlock",
    "interblock_schedule",
    "GPT",
    "CGPT",
    "GPTCore",
    "Schedule",
    "build_schedule",
    "ImageDiscriminator",
    "VideoDiscriminator",
    "FeatureDiscriminator",
    "StateEstimator",
    "StftEncoder",
    "StftDecoder",
    "VectorQuantizer",
]
