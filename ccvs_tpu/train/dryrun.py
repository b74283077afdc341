"""Multi-chip dry run: the full training step jitted over a device mesh on
tiny shapes. Exercised by `__graft_entry__.dryrun_multichip` on a virtual CPU
mesh and usable as a smoke test on real pods."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccvs_tpu.config import AutoencoderConfig, TransformerConfig
from ccvs_tpu.models.autoencoder import FrameAutoencoder
from ccvs_tpu.models.transformer import TokenTransformer
from ccvs_tpu.nn import vgg as vgg_mod
from ccvs_tpu.nn.discriminators import ImageDiscriminator, VideoDiscriminator
from ccvs_tpu.train.ae_losses import AELosses
from ccvs_tpu.train.steps import make_ae_steps, make_transformer_step


def run_tiny_multichip_step(mesh: Mesh) -> None:
    """One data-parallel AE (G+D+R1) step and one transformer step over the
    mesh, on 8x8 images. Batch is sharded over 'data'; params replicated;
    gradient all-reduce is XLA's implicit psum."""
    n_data = mesh.shape["data"]
    ae_cfg = AutoencoderConfig(
        necf=8, necf_mult=(1, 2), ndcf=8, ndcf_mult=(1, 2),
        z_size=16, z_num=32, z_shape=(4, 4), max_dim=8,
        inter_p=0.5, skip_memory=2, skip_context=(1, 2),
        use_di=True, use_dv=True, use_vgg_img=False, use_vgg_vid=False,
        use_direct_recovery_img=True, use_direct_recovery_vid=True,
        slide_inter=True, n_consecutive_img=2, vid_len=3,
        load_elastic_view=False, elastic_corruption=False, d_reg_every=2,
        stddev_group=2,
    )
    gpt_cfg = TransformerConfig(
        z_num=32, z_len=32, z_chunk=16, num_blocks=2, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
    )

    ae = FrameAutoencoder(ae_cfg, dtype=jnp.float32)
    di = ImageDiscriminator(ae_cfg)
    dv = VideoDiscriminator(ae_cfg, vid_len=ae_cfg.vid_len)
    losses = AELosses(ae_cfg, ae, di=di, dv=dv)

    key = jax.random.PRNGKey(0)
    gen = ae.init(key)
    img = jnp.zeros((2, 8, 8, 3), jnp.float32)
    vid = jnp.zeros((2, ae_cfg.vid_len, 8, 8, 3), jnp.float32)
    disc = {
        "di": di.init(key, img)["params"],
        "dv": dv.init(key, vid)["params"],
    }

    init_state, g_step, d_step, r1_step = make_ae_steps(losses, vgg_params=None)
    state = init_state(key, gen, disc)

    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)

    bsz = 2 * n_data  # group_size=2 per sample x n_data shards
    batch_img = {
        "img": jax.device_put(
            jax.random.uniform(key, (bsz * 2, 8, 8, 3), jnp.float32, -1, 1), dsh
        )
    }
    batch_vid = {
        "vid": jax.device_put(
            jax.random.uniform(key, (bsz, ae_cfg.vid_len, 8, 8, 3), jnp.float32, -1, 1), dsh
        )
    }

    g_img = jax.jit(lambda s, b, r: g_step(s, b, r, "img"))
    d_img = jax.jit(lambda s, b, f, r: d_step(s, b, f, r, "img"))
    r1_img = jax.jit(lambda s, b: r1_step(s, b, "img"))
    g_vid = jax.jit(lambda s, b, r: g_step(s, b, r, "vid"))
    d_vid = jax.jit(lambda s, b, f, r: d_step(s, b, f, r, "vid"))

    rng = jax.random.PRNGKey(1)
    state, gm, fake = g_img(state, batch_img, rng)
    state, dm = d_img(state, batch_img, fake, rng)
    state, rm = r1_img(state, batch_img)
    state, gmv, fakev = g_vid(state, batch_vid, rng)
    state, dmv = d_vid(state, batch_vid, fakev, rng)
    jax.block_until_ready(state)
    assert np.isfinite(float(gm["g_loss"])) and np.isfinite(float(dm["d_loss"]))
    assert np.isfinite(float(gmv["g_loss"])) and np.isfinite(float(dmv["d_loss"]))

    # transformer data-parallel step
    tr = TokenTransformer(gpt_cfg, dtype=jnp.float32)
    params = tr.init(key, batch=1)
    init_t, t_step = make_transformer_step(tr, gpt_cfg, n_iter=10)
    tstate = init_t(params)
    tstate = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tstate)
    code = jax.device_put(
        jax.random.randint(key, (n_data * 2, gpt_cfg.z_len), 0, gpt_cfg.z_num), dsh
    )
    tstate, tm = t_step(tstate, {"code": code})
    jax.block_until_ready(tstate)
    assert np.isfinite(float(tm["nll"]))

    # dp x fsdp: ZeRO-3 param+moment sharding over 'data' (parallel/fsdp.py);
    # same step program, GSPMD all-gathers params / reduce-scatters grads.
    from ccvs_tpu.parallel.fsdp import shard_fsdp

    fstate = init_t(params)
    fstate = fstate.replace(
        step=jax.device_put(fstate.step, repl),
        params=shard_fsdp(mesh, fstate.params, min_size=1024),
        opt=shard_fsdp(mesh, fstate.opt, min_size=1024),
    )
    _, f_step = make_transformer_step(
        tr, gpt_cfg, n_iter=10,
        state_shardings=jax.tree_util.tree_map(lambda x: x.sharding, fstate))
    fstate, tm_f = f_step(fstate, {"code": code})
    jax.block_until_ready(fstate)
    nll_fsdp = float(tm_f["nll"])
    assert np.isfinite(nll_fsdp) and abs(nll_fsdp - float(tm["nll"])) < 1e-3
    assert any(l.ndim and l.addressable_shards[0].data.shape != l.shape
               for l in jax.tree_util.tree_leaves(fstate.params)), \
        "fsdp dryrun: params did not stay sharded"

    # dp x tp: re-run the transformer step with Megatron-style head/MLP
    # sharding over a 2-way 'model' axis when the device count allows
    nll_tp = None
    n_total = n_data
    if n_total % 2 == 0 and n_total >= 4:
        from ccvs_tpu.parallel.mesh import make_mesh
        from ccvs_tpu.parallel.tp import shard_gpt_params

        mesh_tp = make_mesh(n_total, model_parallel=2)
        repl_tp = NamedSharding(mesh_tp, P())
        params_tp = shard_gpt_params(mesh_tp, params)
        tstate_tp = init_t(params_tp)
        tstate_tp = tstate_tp.replace(
            step=jax.device_put(tstate_tp.step, repl_tp)
        )
        code_tp = jax.device_put(
            jax.random.randint(key, (mesh_tp.shape["data"] * 2, gpt_cfg.z_len), 0, gpt_cfg.z_num),
            NamedSharding(mesh_tp, P("data")),
        )
        tstate_tp, tm_tp = t_step(tstate_tp, {"code": code_tp})
        jax.block_until_ready(tstate_tp)
        nll_tp = float(tm_tp["nll"])
        assert np.isfinite(nll_tp)

        # dp x sp: sequence-parallel activation sharding over the same 2-way
        # 'model' axis (parallel/sp.py) — params replicated, token axis of
        # every block activation sharded; must reproduce the dp/tp nll.
        import dataclasses

        gpt_cfg_sp = dataclasses.replace(gpt_cfg, seq_parallel=True)
        tr_sp = TokenTransformer(gpt_cfg_sp, dtype=jnp.float32)
        init_sp, sp_step = make_transformer_step(tr_sp, gpt_cfg_sp, n_iter=10)
        sstate = init_sp(params)
        sstate = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl_tp), sstate)
        with mesh_tp:
            sstate, tm_sp = sp_step(sstate, {"code": code_tp})
        jax.block_until_ready(sstate)
        nll_sp = float(tm_sp["nll"])
        assert np.isfinite(nll_sp) and abs(nll_sp - nll_tp) < 1e-3

        # dp x pp: GPipe pipeline of the block stack over the same 'model'
        # axis (parallel/pp.py) — layers split across stages, microbatch
        # activations ppermute stage-to-stage; must reproduce core numerics
        # (forward and grad; grad checked in tests/test_parallel.py).
        from ccvs_tpu.nn.gpt import GPTCore
        from ccvs_tpu.parallel.pp import pipeline_core, shard_stage_params

        core = GPTCore(gpt_cfg, dtype=jnp.float32)
        emb_pp = jax.random.normal(
            key, (2 * mesh_tp.shape["data"], 8, gpt_cfg.n_embd), jnp.float32)
        cparams = core.init(key, emb_pp)["params"]
        ref_out, _ = jax.jit(lambda p, e: core.apply({"params": p}, e))(
            cparams, emb_pp)
        cp = {
            "blocks": {"block": shard_stage_params(mesh_tp, cparams["blocks"]["block"])},
            "ln_f": jax.device_put(cparams["ln_f"], repl_tp),
        }
        emb_sh = jax.device_put(emb_pp, NamedSharding(mesh_tp, P("data")))
        pp_out = jax.jit(lambda c, e: pipeline_core(gpt_cfg, c, e, mesh_tp, 2))(
            cp, emb_sh)
        assert float(jnp.abs(pp_out - ref_out).max()) < 1e-4

    print(
        f"dryrun_multichip ok: mesh={dict(mesh.shape)} "
        f"g={float(gm['g_loss']):.3f} d={float(dm['d_loss']):.3f} "
        f"gv={float(gmv['g_loss']):.3f} nll={float(tm['nll']):.3f} "
        f"nll_fsdp={nll_fsdp:.3f}"
        + (f" nll_dpxtp={nll_tp:.3f} nll_dpxsp={nll_sp:.3f} pp2=ok (tp=sp=pp=2)"
           if nll_tp is not None else "")
    )
