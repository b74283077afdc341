"""Multi-device trainer tests on the virtual 8-device CPU mesh.

These run the *real* trainer code paths (not `train.dryrun`) data-parallel
over `parallel.mesh.make_mesh(8)` and assert numerical equality with an
unsharded run — the TPU-native analog of the reference's 4-GPU DDP default
(`tools/engine.py:71-101`, `scripts/bairhd/train_frame_autoencoder.sh`).
"""

import dataclasses
import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ccvs_tpu.config import AutoencoderConfig, Config, DataConfig, TransformerConfig
from ccvs_tpu.parallel.mesh import make_mesh, put_batch

AE_CFG = AutoencoderConfig(
    necf=8, necf_mult=(1, 2), ndcf=8, ndcf_mult=(1, 2),
    z_size=16, z_num=32, z_shape=(4, 4), max_dim=8,
    inter_p=0.5, skip_memory=2, skip_context=(1, 2),
    use_di=True, use_dv=True, use_vgg_img=False, use_vgg_vid=False,
    use_direct_recovery_img=True, use_direct_recovery_vid=True,
    slide_inter=True, n_consecutive_img=2, vid_len=3,
    load_elastic_view=False, elastic_corruption=False, d_reg_every=2,
    stddev_group=2,
)
GPT_CFG = TransformerConfig(
    z_num=32, z_len=32, z_chunk=16, num_blocks=2, cond_len=16,
    n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
)
DATA_CFG = DataConfig(
    dataset="synthetic", max_dim=8, true_dim=32, vid_len=3,
    batch_size_img=8, batch_size_vid=8, n_consecutive_img=2, img_out_of_n=8,
    load_elastic_view=False, num_workers=1, load_vid_len=8,
)


def _cfg(tmp):
    return Config(
        name="par", save_path=tmp, data=DATA_CFG, ae=AE_CFG, gpt=GPT_CFG,
        n_iter=2, save_latest_freq=100, log_freq=0,
    )


def _leaves(tree):
    return np.concatenate(
        [np.asarray(l, np.float32).ravel() for l in jax.tree_util.tree_leaves(tree)]
    )


def test_put_batch_shards_divisible_leading_axis():
    mesh = make_mesh(8)
    batch = {"img": np.zeros((16, 4, 4, 3)), "delta": np.zeros((3,))}
    out = put_batch(mesh, batch)
    assert "data" in str(out["img"].sharding.spec)  # sharded
    assert out["delta"].sharding.spec == jax.sharding.PartitionSpec()  # replicated


def _run_ae(tmp, n_devices):
    from ccvs_tpu.train.ae_trainer import FrameAutoencoderTrainer

    random.seed(42)  # dataset per-sample aug params (single worker => ordered)
    cfg = _cfg(tmp)
    tr = FrameAutoencoderTrainer(cfg, dtype=jnp.float32, mesh=make_mesh(n_devices))
    return tr.run(n_iter=2)


def test_ae_trainer_dp8_matches_dp1(tmp_path):
    """Two AE iterations (G+D+R1, img+vid) through the actual trainer: the
    dp8-sharded run must produce the same params as the unsharded run."""
    s1 = _run_ae(str(tmp_path / "dp1"), 1)
    s8 = _run_ae(str(tmp_path / "dp8"), 8)
    g1, g8 = _leaves(s1.gen), _leaves(s8.gen)
    d1, d8 = _leaves(s1.disc), _leaves(s8.disc)
    np.testing.assert_allclose(g1, g8, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(d1, d8, rtol=2e-3, atol=2e-4)
    # batch really was sharded: the mesh spans 8 devices
    assert s8.gen and len(jax.devices()) == 8


def test_transformer_trainer_dp8_matches_dp1(tmp_path):
    from ccvs_tpu.models import FrameAutoencoder
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer

    base = _cfg(str(tmp_path))
    cfg = base.replace(data=dataclasses.replace(base.data, vid_len=2, load_vid_len=None))
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.float32)
    ae_params = ae.init(jax.random.PRNGKey(0))

    outs = []
    for n in (1, 8):
        random.seed(42)
        cfg_n = cfg.replace(save_path=str(tmp_path / f"dp{n}"))
        tr = TransformerTrainer(cfg_n, ae_params, dtype=jnp.float32, mesh=make_mesh(n))
        outs.append(tr.run(n_iter=2))
    np.testing.assert_allclose(
        _leaves(outs[0].params), _leaves(outs[1].params), rtol=2e-3, atol=2e-4
    )


def test_transformer_trainer_fsdp_matches_dp1(tmp_path):
    """ZeRO-3 param+moment sharding (`parallel/fsdp.py`): the fsdp=True dp8
    run must match the unsharded dp1 run numerically, hold genuinely split
    param shards (1/8th per device), and KEEP them split across steps (the
    elementwise adam update must not trigger a GSPMD replication)."""
    import dataclasses as dc

    from ccvs_tpu.models import FrameAutoencoder
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer

    base = _cfg(str(tmp_path))
    cfg = base.replace(data=dataclasses.replace(base.data, vid_len=2, load_vid_len=None))
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.float32)
    ae_params = ae.init(jax.random.PRNGKey(0))

    outs = []
    for n, fsdp in ((1, False), (8, True)):
        random.seed(42)
        cfg_n = cfg.replace(save_path=str(tmp_path / f"fsdp{n}"),
                            gpt=dc.replace(cfg.gpt, fsdp=fsdp))
        tr = TransformerTrainer(cfg_n, ae_params, dtype=jnp.float32, mesh=make_mesh(n))
        outs.append(tr.run(n_iter=2))
    np.testing.assert_allclose(
        _leaves(outs[0].params), _leaves(outs[1].params), rtol=2e-3, atol=2e-4
    )
    split = [l for l in jax.tree_util.tree_leaves(outs[1].params)
             if l.ndim and l.addressable_shards[0].data.shape != l.shape]
    assert split, "no param leaf stayed FSDP-sharded after training steps"
    biggest = max(jax.tree_util.tree_leaves(outs[1].params), key=lambda l: l.size)
    assert biggest.addressable_shards[0].data.size == biggest.size // 8
    # moments sharded identically to their params
    mu = jax.tree_util.tree_leaves(outs[1].opt)
    assert any(l.ndim and l.size == biggest.size and
               l.addressable_shards[0].data.size == l.size // 8 for l in mu)


def test_transformer_sp2_matches_dp8():
    """Sequence-parallel activation sharding (dp4 x sp2, `parallel/sp.py`):
    loss and grads must equal the plain dp8 run — GSPMD shards the token axis
    over 'model' (all-gathers K/V inside attention) without changing math.
    Also checks the constraints degrade to no-ops outside a mesh context."""
    import dataclasses as dc

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ccvs_tpu.models import TokenTransformer

    cfg_sp = dc.replace(GPT_CFG, seq_parallel=True)
    tr = TokenTransformer(GPT_CFG, dtype=jnp.float32)
    tr_sp = TokenTransformer(cfg_sp, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = tr.init(key, batch=1)
    code = jax.random.randint(key, (8, GPT_CFG.z_len), 0, GPT_CFG.z_num)

    mesh8 = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))
    mesh42 = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))

    def run(t, mesh, ctx):
        c = jax.device_put(code, NamedSharding(mesh, P("data")))
        p = jax.device_put(params, NamedSharding(mesh, P()))
        f = jax.jit(jax.value_and_grad(lambda pp, cc: t.loss(pp, cc)[0]))
        if ctx:
            with mesh:
                l, g = f(p, c)
        else:
            l, g = f(p, c)
        return float(l), _leaves(g)

    l_dp, g_dp = run(tr, mesh8, False)
    l_sp, g_sp = run(tr_sp, mesh42, True)
    np.testing.assert_allclose(l_dp, l_sp, rtol=1e-5)
    np.testing.assert_allclose(g_dp, g_sp, rtol=1e-4, atol=1e-6)
    # the sharding really bit: XLA inserted sequence all-gathers
    c = jax.device_put(code, NamedSharding(mesh42, P("data")))
    p = jax.device_put(params, NamedSharding(mesh42, P()))
    with mesh42:
        compiled = jax.jit(lambda pp, cc: tr_sp.loss(pp, cc)[0]).lower(p, c).compile()
    assert "all-gather" in compiled.as_text()
    # seq_parallel params still run in a plain jit with no mesh context
    l_plain, _ = run(tr_sp, mesh8, False)
    np.testing.assert_allclose(l_dp, l_plain, rtol=1e-6)


def test_pipeline_parallel_core_matches_sequential():
    """GPipe pipeline of the GPT block stack (`parallel/pp.py`, mesh 2x4 =
    dp2 x pp4): forward and parameter gradients must equal the plain
    `GPTCore.apply` within f32 rounding. The backward pipeline comes from
    autodiff (the transpose of ppermute is the reverse permute)."""
    import dataclasses as dc

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ccvs_tpu.nn.gpt import GPTCore
    from ccvs_tpu.parallel.pp import pipeline_core, shard_stage_params

    cfg = dc.replace(GPT_CFG, n_layer=4)
    core = GPTCore(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (8, 20, cfg.n_embd), jnp.float32)
    params = core.init(key, emb)["params"]

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))
    cp = {
        "blocks": {"block": shard_stage_params(mesh, params["blocks"]["block"])},
        "ln_f": jax.device_put(params["ln_f"], NamedSharding(mesh, P())),
    }
    emb_sh = jax.device_put(emb, NamedSharding(mesh, P("data")))

    ref, _ = jax.jit(lambda p, e: core.apply({"params": p}, e))(params, emb)
    out = jax.jit(lambda c, e: pipeline_core(cfg, c, e, mesh, n_micro=2))(cp, emb_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g_ref = jax.jit(jax.grad(
        lambda p, e: (core.apply({"params": p}, e)[0] ** 2).sum()))(params, emb)
    g_pp = jax.jit(jax.grad(
        lambda c, e: (pipeline_core(cfg, c, e, mesh, n_micro=2) ** 2).sum()))(cp, emb_sh)
    # atol covers near-zero grads (full-grad scale here is ~6e2, so 5e-4
    # is still ~1e-6 relative — f32 accumulation-order noise)
    np.testing.assert_allclose(_leaves(g_pp), _leaves(g_ref), rtol=1e-4, atol=5e-4)


def test_transformer_trainer_dp4_sp2(tmp_path):
    """Sequence parallelism through the real trainer (`seq_parallel=True`,
    mesh 4x2): the trainer enters the mesh context so the bare-PartitionSpec
    constraints resolve. The model axis > 1 also TP-shards the params, so
    this exercises the combined dp x tp x sp step (Megatron TP+SP analog)."""
    from ccvs_tpu.models import FrameAutoencoder
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer

    base = _cfg(str(tmp_path))
    cfg = base.replace(
        data=dataclasses.replace(base.data, vid_len=2, load_vid_len=None),
        gpt=dataclasses.replace(base.gpt, seq_parallel=True),
    )
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.float32)
    ae_params = ae.init(jax.random.PRNGKey(0))
    random.seed(42)
    tr = TransformerTrainer(cfg, ae_params, dtype=jnp.float32,
                            mesh=make_mesh(8, model_parallel=2))
    state = tr.run(n_iter=1)
    assert int(state.step) == 1
    assert np.all(np.isfinite(_leaves(state.params)))


def test_transformer_trainer_dp4_tp2(tmp_path):
    """Megatron head/MLP sharding through the real trainer (mesh 4x2)."""
    from ccvs_tpu.models import FrameAutoencoder
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer

    base = _cfg(str(tmp_path))
    cfg = base.replace(data=dataclasses.replace(base.data, vid_len=2, load_vid_len=None))
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.float32)
    ae_params = ae.init(jax.random.PRNGKey(0))
    random.seed(42)
    tr = TransformerTrainer(cfg, ae_params, dtype=jnp.float32,
                            mesh=make_mesh(8, model_parallel=2))
    state = tr.run(n_iter=1)
    assert int(state.step) == 1
    assert np.all(np.isfinite(_leaves(state.params)))


def test_transformer_trainer_dp4_tp2_fsdp(tmp_path):
    """TP x FSDP composition through the real trainer: head/MLP split on
    'model' AND largest-free-dim split on 'data' (`parallel/fsdp.py`
    base_specs path); finite step + a doubly-sharded leaf must survive it."""
    import dataclasses as dc

    from ccvs_tpu.models import FrameAutoencoder
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer

    base = _cfg(str(tmp_path))
    cfg = base.replace(
        data=dataclasses.replace(base.data, vid_len=2, load_vid_len=None),
        gpt=dc.replace(base.gpt, fsdp=True),
    )
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.float32)
    ae_params = ae.init(jax.random.PRNGKey(0))
    random.seed(42)
    tr = TransformerTrainer(cfg, ae_params, dtype=jnp.float32,
                            mesh=make_mesh(8, model_parallel=2))
    state = tr.run(n_iter=1)
    assert int(state.step) == 1
    assert np.all(np.isfinite(_leaves(state.params)))
    # at least one leaf is split over BOTH axes (shard = 1/8 of global)
    assert any(
        l.ndim and l.addressable_shards[0].data.size == l.size // 8
        for l in jax.tree_util.tree_leaves(state.params)
    ), "no leaf carries the composed tp x fsdp sharding"


def test_dryrun_multichip_step():
    """The driver's multichip dry run must keep passing under the test mesh
    (guards `__graft_entry__.dryrun_multichip` against regressions)."""
    from ccvs_tpu.train.dryrun import run_tiny_multichip_step

    run_tiny_multichip_step(make_mesh(8))


def test_transformer_trainer_resume(tmp_path):
    """latest-checkpoint resume through the real trainer (`--resume`,
    reference `--cont_train`, `options.py:122`)."""
    from ccvs_tpu.models import FrameAutoencoder
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer

    base = _cfg(str(tmp_path))
    cfg = base.replace(data=dataclasses.replace(base.data, vid_len=2, load_vid_len=None))
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.float32)
    ae_params = ae.init(jax.random.PRNGKey(0))

    tr = TransformerTrainer(cfg, ae_params, dtype=jnp.float32, mesh=make_mesh(1))
    s1 = tr.run(n_iter=2)
    assert int(s1.step) == 2

    tr2 = TransformerTrainer(cfg, ae_params, dtype=jnp.float32, mesh=make_mesh(1))
    s2 = tr2.run(n_iter=4, resume=True)
    assert int(s2.step) == 4
    # resumed params differ from the step-2 checkpoint (training continued)
    a = np.concatenate([np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(s1.params)])
    b = np.concatenate([np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(s2.params)])
    assert not np.allclose(a, b)


def test_host_local_rows_roundtrip():
    """host_local_rows on a single process returns every row with its global
    index (the multi-host generate CLI writes per-host rows named by these
    ids; on one process it must reduce to the identity)."""
    import numpy as np

    from ccvs_tpu.parallel.mesh import host_local_rows, make_mesh, put_batch

    mesh = make_mesh(n_devices=8)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    dev = put_batch(mesh, {"x": x})["x"]
    rows, ids = host_local_rows(dev)
    np.testing.assert_array_equal(ids, np.arange(16))
    np.testing.assert_array_equal(rows, x)
