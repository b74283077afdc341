"""Pure-torch oracles for the vendored-weight forward paths.

The VGG19 perceptual stack and the I3D FVD embedder can only ever see real
pretrained weights through the exporters (zero-egress environment), so the
*semantics* of our conv/pad/pool/BN graphs must be proven independently of
key names: build the same network in pure torch (Conv/ReLU/MaxPool/BatchNorm
only — no torchvision), load one set of weights into both, and assert forward
equality. Matches `modules/perceptual.py:9-24` (VGG19 slices) and
`tools/tf_fvd/fvd.py:63-122` (I3D embedder).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp


# ---------------- VGG19 ----------------


def _torch_vgg19_features(params):
    """torchvision-vgg19.features[0:30] rebuilt from Conv2d/ReLU/MaxPool2d,
    initialised from our npz-format param dict."""
    from ccvs_tpu.nn.vgg import _layer_plan

    layers = []
    for i, (kind, cin, cout) in enumerate(_layer_plan()):
        if kind == "conv":
            conv = torch.nn.Conv2d(cin, cout, 3, padding=1)
            with torch.no_grad():
                conv.weight.copy_(torch.from_numpy(np.asarray(params[f"conv{i}"]["weight"])))
                conv.bias.copy_(torch.from_numpy(np.asarray(params[f"conv{i}"]["bias"])))
            layers.append(conv)
        elif kind == "relu":
            layers.append(torch.nn.ReLU())
        else:
            layers.append(torch.nn.MaxPool2d(2, 2))
    return torch.nn.Sequential(*layers).eval()


def _torch_vgg_slices(net, x, slice_ends):
    outs, h = [], x
    for i, layer in enumerate(net):
        h = layer(h)
        if i + 1 in slice_ends:
            outs.append(h)
    return outs


def test_vgg19_forward_matches_pure_torch(rng):
    """Same weights, same input -> same five slice activations and the same
    weighted perceptual loss. Validates conv padding, pooling, normalization
    — not just exporter key names."""
    from ccvs_tpu.nn import vgg as vgg_mod

    params = vgg_mod.init_random(jax.random.PRNGKey(3))
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    ours = vgg_mod.features(params, jnp.asarray(x))

    net = _torch_vgg19_features(params)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    xt = (xt + 1.0) * 0.5
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        ref = _torch_vgg_slices(net, (xt - mean) / std, vgg_mod._SLICE_ENDS)

    assert len(ours) == len(ref) == 5
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
        )

    # weighted L1 perceptual loss agrees too (perceptual.py:44-52)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ours_l = float(vgg_mod.vgg_loss(params, jnp.asarray(y), jnp.asarray(x)))
    yt = torch.from_numpy(y).permute(0, 3, 1, 2)
    yt = ((yt + 1.0) * 0.5 - mean) / std
    with torch.no_grad():
        fy = _torch_vgg_slices(net, yt, vgg_mod._SLICE_ENDS)
    ref_l = sum(
        w * (a - b).abs().mean().item()
        for w, a, b in zip(vgg_mod._WEIGHTS, fy, ref)
    )
    assert abs(ours_l - ref_l) < 1e-3


# ---------------- I3D ----------------


def _torch_unit3d(flax_vars, cin, cout, kernel, use_bn=True):
    """Unit3D rebuilt in torch from a flax variable tree (stride-1 SAME)."""
    p = flax_vars["params"]
    conv = torch.nn.Conv3d(cin, cout, kernel, padding=tuple(k // 2 for k in kernel),
                           bias=not use_bn)
    with torch.no_grad():
        # flax (kt, kh, kw, I, O) -> torch (O, I, kt, kh, kw)
        conv.weight.copy_(torch.from_numpy(
            np.asarray(p["conv3d"]["kernel"]).transpose(4, 3, 0, 1, 2)))
        if not use_bn:
            conv.bias.copy_(torch.from_numpy(np.asarray(p["conv3d"]["bias"])))
    mods = [conv]
    if use_bn:
        bn = torch.nn.BatchNorm3d(cout, eps=1e-3)
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(np.asarray(p["bn"]["scale"])))
            bn.bias.copy_(torch.from_numpy(np.asarray(p["bn"]["bias"])))
            bn.running_mean.copy_(torch.from_numpy(
                np.asarray(flax_vars["batch_stats"]["bn"]["mean"])))
            bn.running_var.copy_(torch.from_numpy(
                np.asarray(flax_vars["batch_stats"]["bn"]["var"])))
        mods.append(bn)
    mods.append(torch.nn.ReLU())
    return torch.nn.Sequential(*mods).eval()


def _randomize_bn_stats(variables, rng):
    """init gives mean=0/var=1; perturb so the test can't pass with BN inert."""
    import flax

    def walk(node, stats):
        for k in list(node.keys()):
            if k == "bn":
                n = node[k]["mean"].shape[0]
                node[k]["mean"] = jnp.asarray(rng.normal(0, 0.5, n), jnp.float32)
                node[k]["var"] = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
            elif isinstance(node[k], dict):
                walk(node[k], stats)

    variables = flax.core.unfreeze(variables)
    walk(variables["batch_stats"], None)
    return variables


def test_i3d_unit3d_matches_pure_torch(rng):
    """Conv3d + BatchNorm(eval, eps 1e-3) + ReLU at stride 1: flax vs torch."""
    from ccvs_tpu.eval.fvd import Unit3D

    for kernel in [(1, 1, 1), (3, 3, 3)]:
        m = Unit3D(12, kernel)
        x = rng.normal(0, 1, (2, 5, 8, 8, 6)).astype(np.float32)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = _randomize_bn_stats(variables, rng)
        ours = np.asarray(m.apply(variables, jnp.asarray(x)))

        net = _torch_unit3d(variables, 6, 12, kernel)
        with torch.no_grad():
            ref = net(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
        np.testing.assert_allclose(
            ours, ref.permute(0, 2, 3, 4, 1).numpy(), rtol=1e-4, atol=1e-4
        )


def test_i3d_inception_block_matches_pure_torch(rng):
    """A full Mixed block (4 branches + SAME maxpool + concat): flax vs torch."""
    from ccvs_tpu.eval.fvd import InceptionBlock

    ch = (8, 6, 10, 4, 6, 5)
    m = InceptionBlock(ch)
    x = rng.normal(0, 1, (1, 4, 8, 8, 7)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
    variables = _randomize_bn_stats(variables, rng)
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    s = variables["batch_stats"]

    def unit(name, cin, cout, kernel=(1, 1, 1)):
        return _torch_unit3d(
            {"params": p[name], "batch_stats": s[name]}, cin, cout, kernel)

    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        b0 = unit("Branch_0", 7, ch[0])(xt)
        b1 = unit("Branch_1b", ch[1], ch[2], (3, 3, 3))(unit("Branch_1a", 7, ch[1])(xt))
        b2 = unit("Branch_2b", ch[3], ch[4], (3, 3, 3))(unit("Branch_2a", 7, ch[3])(xt))
        b3 = unit("Branch_3b", 7, ch[5])(F.max_pool3d(xt, 3, stride=1, padding=1))
        ref = torch.cat([b0, b1, b2, b3], dim=1)
    np.testing.assert_allclose(
        ours, ref.permute(0, 2, 3, 4, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_i3d_stride2_same_padding_matches_tf_semantics(rng):
    """The stem's 7x7x7 stride-2 conv uses TF 'SAME' padding, which is
    asymmetric on even inputs (pad 2 before, 3 after). Prove flax matches
    explicit-pad torch — the exact trap a renamed-key port would miss."""
    from ccvs_tpu.eval.fvd import Unit3D

    m = Unit3D(4, (7, 7, 7), (2, 2, 2))
    x = rng.normal(0, 1, (1, 16, 16, 16, 3)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(2), jnp.asarray(x))
    variables = _randomize_bn_stats(variables, rng)
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))
    assert ours.shape == (1, 8, 8, 8, 4)

    p = variables["params"]
    conv = torch.nn.Conv3d(3, 4, 7, stride=2, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            np.asarray(p["conv3d"]["kernel"]).transpose(4, 3, 0, 1, 2)))
    bn = torch.nn.BatchNorm3d(4, eps=1e-3)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(p["bn"]["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(p["bn"]["bias"])))
        bn.running_mean.copy_(torch.from_numpy(
            np.asarray(variables["batch_stats"]["bn"]["mean"])))
        bn.running_var.copy_(torch.from_numpy(
            np.asarray(variables["batch_stats"]["bn"]["var"])))
    bn.eval()
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        # TF SAME for k=7, s=2, even input: total pad 5 = (2 lo, 3 hi) per dim
        ref = torch.relu(bn(conv(F.pad(xt, (2, 3, 2, 3, 2, 3)))))
    np.testing.assert_allclose(
        ours, ref.permute(0, 2, 3, 4, 1).numpy(), rtol=1e-4, atol=1e-4
    )


# ---------------- calibrated LPIPS (VGG16 + lin weights) ----------------


def test_lpips_calibrated_matches_pure_torch(tmp_path, monkeypatch, rng):
    """export_lpips npz (mocked torchvision VGG16 + richzhang-format lin
    checkpoint) -> our LPIPS == a pure-torch LPIPS oracle. Matches the
    reference's piq scoring path (`tools/pytorch_metrics/metrics.py:12,46`)."""
    import sys
    import types

    from ccvs_tpu.eval.metrics import LPIPS
    from ccvs_tpu.nn.vgg import _SLICE_ENDS16, _layer_plan
    from ccvs_tpu.port import export_lpips

    # mocked torchvision vgg16 state dict (conv shapes of the real net)
    sd, i = {}, 0
    for kind, cin, cout in _layer_plan("vgg16"):
        if kind == "conv":
            sd[f"features.{i}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
            sd[f"features.{i}.bias"] = torch.randn(cout) * 0.01
        i += 1
    fake_vgg = types.SimpleNamespace(state_dict=lambda: sd)
    tv = types.ModuleType("torchvision")
    tv.models = types.SimpleNamespace(vgg16=lambda weights=None: fake_vgg)
    monkeypatch.setitem(sys.modules, "torchvision", tv)

    # mocked richzhang lin checkpoint: lin{k}.model.1.weight of shape (1,C,1,1)
    chans = [64, 128, 256, 512, 512]
    lin_sd = {
        f"lin{k}.model.1.weight": torch.rand(1, c, 1, 1) * 0.1
        for k, c in enumerate(chans)
    }
    lin_path = tmp_path / "vgg_lin.pth"
    torch.save(lin_sd, lin_path)
    out = tmp_path / "lpips_vgg.npz"
    export_lpips.main(str(lin_path), str(out))

    lp = LPIPS(str(out))
    assert lp.calibrated and lp.arch == "vgg16"
    a = rng.uniform(-1, 1, (2, 161, 161, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 161, 161, 3)).astype(np.float32)
    ours = lp(a, b)

    # pure-torch oracle
    layers, j = [], 0
    for kind, cin, cout in _layer_plan("vgg16"):
        if kind == "conv":
            conv = torch.nn.Conv2d(cin, cout, 3, padding=1)
            with torch.no_grad():
                conv.weight.copy_(sd[f"features.{j}.weight"])
                conv.bias.copy_(sd[f"features.{j}.bias"])
            layers.append(conv)
        elif kind == "relu":
            layers.append(torch.nn.ReLU())
        else:
            layers.append(torch.nn.MaxPool2d(2, 2))
        j += 1
    net = torch.nn.Sequential(*layers).eval()

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def torch_slices(x):
        x = ((torch.from_numpy(x).permute(0, 3, 1, 2) + 1) * 0.5 - mean) / std
        return _torch_vgg_slices(net, x, _SLICE_ENDS16)

    with torch.no_grad():
        fa = torch_slices(a)
        fb = torch_slices(b)
        ref = torch.zeros(2)
        for k, (x, y) in enumerate(zip(fa, fb)):
            xn = x / (x.norm(dim=1, keepdim=True) + 1e-10)
            yn = y / (y.norm(dim=1, keepdim=True) + 1e-10)
            w = lin_sd[f"lin{k}.model.1.weight"].view(1, -1, 1, 1)
            ref += (w * (xn - yn) ** 2).sum(dim=1).mean(dim=(1, 2))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=1e-4)
