"""Vendored-weight exporter tests with mocked torch sources.

Real VGG19/I3D weights can't be downloaded in this environment; these tests
exercise the exporter logic itself (key filtering, layout translation, npz
round trip) with synthetic state dicts of the real shapes.
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_export_vgg_with_mocked_torchvision(tmp_path, monkeypatch):
    import torch

    from ccvs_tpu.nn.vgg import _layer_plan, features, load_vgg19_npz
    from ccvs_tpu.port import export_vgg

    sd, i = {}, 0
    for kind, cin, cout in _layer_plan():
        if kind == "conv":
            sd[f"features.{i}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
            sd[f"features.{i}.bias"] = torch.randn(cout) * 0.01
        i += 1
    sd["classifier.0.weight"] = torch.randn(8, 8)  # must be filtered out

    fake_vgg = types.SimpleNamespace(state_dict=lambda: sd)
    tv = types.ModuleType("torchvision")
    tv.models = types.SimpleNamespace(vgg19=lambda weights=None: fake_vgg)
    monkeypatch.setitem(sys.modules, "torchvision", tv)

    out = tmp_path / "vgg19.npz"
    export_vgg.main(str(out))
    raw = np.load(str(out))
    assert all(k.startswith("features.") for k in raw.files)

    params = load_vgg19_npz(str(out))
    np.testing.assert_allclose(
        np.asarray(params["conv0"]["weight"]), sd["features.0.weight"].numpy()
    )
    acts = features(params, jnp.zeros((1, 32, 32, 3)))
    assert len(acts) == 5
    assert all(np.isfinite(np.asarray(a)).all() for a in acts)


def test_export_vgg_roundtrip_forward_equality(tmp_path, monkeypatch, rng):
    """File-drop guarantee for the day real torchvision weights arrive: a
    state dict in torchvision's exact key format, pushed through the REAL
    exporter (`port/export_vgg.py`) into the npz our loader reads, must give
    slice activations and perceptual loss numerically equal to a pure-torch
    VGG19 forward on the same weights (`modules/perceptual.py:9-24`)."""
    import torch

    from ccvs_tpu.nn.vgg import _layer_plan, features, load_vgg19_npz, vgg_loss
    from ccvs_tpu.port import export_vgg

    torch.manual_seed(0)
    sd, i = {}, 0
    layers = []
    for kind, cin, cout in _layer_plan():
        if kind == "conv":
            conv = torch.nn.Conv2d(cin, cout, 3, padding=1)
            with torch.no_grad():
                conv.weight.mul_(0.2)  # keep deep activations in fp32 range
            sd[f"features.{i}.weight"] = conv.weight.detach().clone()
            sd[f"features.{i}.bias"] = conv.bias.detach().clone()
            layers.append(conv)
        elif kind == "relu":
            layers.append(torch.nn.ReLU())
        else:
            layers.append(torch.nn.MaxPool2d(2, 2))
        i += 1
    net = torch.nn.Sequential(*layers).eval()

    fake_vgg = types.SimpleNamespace(state_dict=lambda: sd)
    tv = types.ModuleType("torchvision")
    tv.models = types.SimpleNamespace(vgg19=lambda weights=None: fake_vgg)
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    out = tmp_path / "vgg19.npz"
    export_vgg.main(str(out))

    params = load_vgg19_npz(str(out))
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    slice_ends = {2, 7, 12, 21, 30}  # perceptual.py:10-23 slice boundaries
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def torch_slices(xin):
        # features() normalizes [-1,1] -> imagenet internally; mirror it
        h = ((xin + 1.0) * 0.5 - mean) / std
        h = torch.from_numpy(h.transpose(0, 3, 1, 2))
        outs = []
        with torch.no_grad():
            for j, layer in enumerate(net):
                h = layer(h)
                if j + 1 in slice_ends:
                    outs.append(h.numpy().transpose(0, 2, 3, 1))
        return outs

    torch_acts = torch_slices(x)
    acts = features(params, jnp.asarray(x))
    assert len(acts) == len(torch_acts)
    for a, ta in zip(acts, torch_acts):
        np.testing.assert_allclose(np.asarray(a), ta, rtol=2e-4, atol=2e-4)

    # weighted perceptual loss end-to-end vs a pure-torch computation
    # (weights 1/32..1, perceptual.py:30-36,44-52)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    loss = vgg_loss(params, jnp.asarray(x), jnp.asarray(y))
    want = sum(
        w * float(np.abs(fa - ra).mean())
        for w, fa, ra in zip([1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0],
                             torch_acts, torch_slices(y))
    )
    np.testing.assert_allclose(float(loss), want, rtol=5e-4)


def _torch_style_i3d_sd(variables):
    """Inverse of export_i3d.translate: flax variables -> pytorch-i3d keys."""
    from ccvs_tpu.port.export_i3d import _BRANCH, _ENDPOINT

    inv_ep = {v: k for k, v in _ENDPOINT.items()}
    inv_br = {v: k for k, v in _BRANCH.items()}
    sd = {}

    def walk(node, scope):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, scope + (k,))
                continue
            mods = list(scope) + [k]
            ep = inv_ep.get(mods[0], mods[0])
            rest = mods[1:]
            if rest and rest[0] in inv_br:
                ep = f"{ep}.{inv_br[rest[0]]}"
                rest = rest[1:]
            unit, field = rest[0], rest[1]
            v = np.asarray(v)
            if unit == "conv3d" and field == "kernel":
                sd[f"{ep}.conv3d.weight"] = v.transpose(4, 3, 0, 1, 2)
            elif unit == "bn" and field == "scale":
                sd[f"{ep}.bn.weight"] = v
            elif unit == "bn" and field == "bias":
                sd[f"{ep}.bn.bias"] = v
            elif unit == "bn" and field == "mean":
                sd[f"{ep}.bn.running_mean"] = v
            elif unit == "bn" and field == "var":
                sd[f"{ep}.bn.running_var"] = v

    walk(variables["params"], ())
    walk(variables["batch_stats"], ())
    return sd


def test_export_i3d_translate_roundtrip(tmp_path):
    """translate() must rebuild the exact flax tree our I3D init produces."""
    from flax.core import unfreeze

    from ccvs_tpu.eval.fvd import I3D, load_i3d
    from ccvs_tpu.port.export_i3d import translate

    model = I3D()
    variables = unfreeze(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 64, 3))))
    sd = _torch_style_i3d_sd(variables)
    tree = translate(sd)

    want = jax.tree_util.tree_map(lambda x: tuple(x.shape), variables)
    got = jax.tree_util.tree_map(lambda x: tuple(x.shape), tree)
    assert want == got

    # numerics survive the round trip and the npz load path
    np.savez(tmp_path / "i3d.npz", variables=np.array(tree, dtype=object))
    loaded = load_i3d(str(tmp_path / "i3d.npz"))
    emb = model.apply(loaded, jnp.zeros((1, 16, 64, 64, 3)))
    ref = model.apply(variables, jnp.zeros((1, 16, 64, 64, 3)))
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref), rtol=1e-5, atol=1e-6)
    assert emb.shape == (1, 1024)


def test_vgg16_params_autodetect_in_perceptual_loss():
    """A vgg16 npz (export_lpips backbone) must flow through the trainers'
    perceptual loss: features/vgg_loss auto-detect the arch from the params
    dict instead of assuming vgg19 (reference perceptual is vgg19-only,
    `modules/perceptual.py:6-52`; LPIPS rides vgg16,
    `tools/pytorch_metrics/metrics.py:12`)."""
    from ccvs_tpu.nn import vgg as vgg_mod

    key = jax.random.PRNGKey(0)
    # Both archs truncated at features[0:30] hold exactly 13 convs; what
    # distinguishes them is the torchvision feature INDEX of the convs
    # (vgg19 has a conv at features[16], vgg16 a pool there and a conv at 17).
    for arch, marker, absent in (("vgg16", "conv17", "conv16"),
                                 ("vgg19", "conv16", "conv17")):
        params = vgg_mod.init_random(key, arch=arch)
        assert len(params) == 13
        assert marker in params and absent not in params
        assert vgg_mod.params_arch(params) == arch
        x = jnp.zeros((1, 32, 32, 3))
        feats = vgg_mod.features(params, x)  # no arch passed: auto-detect
        assert len(feats) == 5
        loss = vgg_mod.vgg_loss(params, x, jnp.ones_like(x) * 0.5)
        assert np.isfinite(float(loss))


def test_explicit_missing_vgg_npz_raises(tmp_path):
    """A typo'd --vgg-npz must raise, not silently train/score with random
    filters (same contract as eval/fvd.py's i3d_npz handling); no path at
    all still opts into the loud random fallback."""
    import pytest

    from ccvs_tpu.nn import vgg as vgg_mod

    assert vgg_mod.check_npz(None) is False
    assert vgg_mod.check_npz("") is False
    with pytest.raises(FileNotFoundError):
        vgg_mod.check_npz(str(tmp_path / "nope.npz"))
    with pytest.raises(FileNotFoundError):
        from ccvs_tpu.eval.metrics import LPIPS

        LPIPS(vgg_npz=str(tmp_path / "nope.npz"))


def test_npz_params_round_trip(tmp_path):
    """Single-file weight persistence (`ccvs_tpu/port/npz_params.py`): the
    TPU-native stand-in for the reference's single-file `.pth` shipping
    (reference models/__init__.py:5-26). Floats round-trip through fp16
    storage; ints keep their dtype; prefixes keep multiple trees apart."""
    from ccvs_tpu.port.npz_params import (load_params_npz, save_params_npz,
                                          unflatten_params, flatten_params)

    rng = np.random.default_rng(0)
    ae = {"conv": {"kernel": rng.standard_normal((3, 3, 4, 8)).astype(np.float32),
                   "bias": np.zeros(8, np.float32)},
          "steps": np.array(7, np.int32)}
    gpt = {"blocks_0": {"w": rng.standard_normal((16, 16)).astype(np.float32)}}

    path = str(tmp_path / "w.npz")
    save_params_npz(path, ae_gen=ae, gpt=gpt)
    out = load_params_npz(path, "ae_gen", "gpt")

    assert out["ae_gen"]["conv"]["kernel"].dtype == np.float32
    assert np.allclose(out["ae_gen"]["conv"]["kernel"],
                       ae["conv"]["kernel"], atol=1e-3)
    assert out["ae_gen"]["steps"].dtype == np.int32  # ints never cast
    assert out["ae_gen"]["steps"] == 7
    assert np.allclose(out["gpt"]["blocks_0"]["w"], gpt["blocks_0"]["w"],
                       atol=1e-3)
    with pytest.raises(KeyError):
        load_params_npz(path, "nope")

    # flax FrozenDict-style trees flatten through to_state_dict too
    flat = flatten_params({"a": {"b": jnp.ones((2,), jnp.float32)}}, "t")
    assert set(flat) == {"t/a/b"} and flat["t/a/b"].dtype == np.float16
    back = unflatten_params(flat, "t")
    assert back["a"]["b"].dtype == np.float32
