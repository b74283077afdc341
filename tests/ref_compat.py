"""Load the reference PyTorch modules on CPU for true end-to-end parity tests.

The reference ships CPU fallbacks for its native ops
(`modules/upfirdn2d.py:144-150`, `modules/fused_act.py:105-120`), but the
modules JIT-compile the CUDA extensions at import time and depend on
cupy/torchvision which this environment lacks. This helper stubs exactly
those import-time dependencies (never exercised on CPU) and substitutes the
cupy correlation (`modules/correlation.py:405-409`) with a vectorized torch
mirror of the kernel semantics, so the *real* reference networks can run on
torch-CPU as a numerics oracle.
"""

import sys
import types

_REF = "/root/reference"


def _stub_modules():
    import torch
    import torch.utils.cpp_extension as ce

    # upfirdn2d.py / fused_act.py call load() at import; the returned op is
    # only touched on the CUDA path.
    ce.load = lambda *a, **k: types.SimpleNamespace()

    # mingpt.get_pos_emb hardcodes .cuda() on a zeros() even on CPU inputs
    torch.Tensor.cuda = lambda self, *a, **k: self

    if "cupy" not in sys.modules:
        cupy = types.ModuleType("cupy")
        cupy.memoize = lambda **kw: (lambda f: f)
        cupy.cuda = types.SimpleNamespace(compile_with_cache=lambda *a, **k: None)
        sys.modules["cupy"] = cupy

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")

        ops = types.ModuleType("torchvision.ops")

        class _DeformConv2d:  # only instantiated under use_deformed_conv
            def __init__(self, *a, **k):
                raise NotImplementedError("deform conv not exercised on CPU")

        ops.DeformConv2d = _DeformConv2d
        transforms = types.ModuleType("torchvision.transforms")
        for name in ("Compose", "ToTensor", "Normalize", "Resize"):
            setattr(transforms, name, lambda *a, **k: None)
        utils = types.ModuleType("torchvision.utils")
        utils.make_grid = lambda *a, **k: None
        models = types.ModuleType("torchvision.models")
        tv.ops, tv.transforms, tv.utils, tv.models = ops, transforms, utils, models
        sys.modules.update({
            "torchvision": tv,
            "torchvision.ops": ops,
            "torchvision.transforms": transforms,
            "torchvision.utils": utils,
            "torchvision.models": models,
        })


def torch_correlation(first, second, stride=1):
    """Vectorized torch mirror of the reference CUDA correlation
    (`modules/correlation.py:32-100`): 49-channel cost volume, NCHW."""
    import torch
    import torch.nn.functional as F

    b, c, h, w = first.shape
    pad = 3 * stride
    sec = F.pad(second, (pad, pad, pad, pad))
    outs = []
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            sh = sec[:, :, pad + dy * stride : pad + dy * stride + h,
                     pad + dx * stride : pad + dx * stride + w]
            outs.append((first * sh).mean(1)[:, ::stride, ::stride])
    return torch.stack(outs, 1)


def load_reference():
    """Returns (skip_autoencoder, mingpt, quantize) reference modules, CPU-ready."""
    _stub_modules()
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import models.skip_vid_generator.models.mingpt as mingpt
    import models.skip_vid_generator.models.skip_autoencoder as sa
    import models.skip_vid_generator.modules.quantize as quantize

    sa.FunctionCorrelation = torch_correlation
    return sa, mingpt, quantize
