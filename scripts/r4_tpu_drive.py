"""Round-4 TPU drive: exercise the new layout-conditioned generation and the
fixed-shape step-by-step path on the real chip at small shapes.

Validates (1) both paths compile and execute on TPU (unit tests run on the
CPU mesh only), (2) the fixed-shape step-by-step traces exactly one
transformer program across frames, (3) outputs are finite / in-range.

    python scripts/r4_tpu_drive.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def main():
    import dataclasses

    from ccvs_tpu.config import AutoencoderConfig, Config, TransformerConfig
    from ccvs_tpu.generate import VideoGenerator
    from ccvs_tpu.models import FrameAutoencoder, TokenTransformer
    from ccvs_tpu.models.transformer import TokenTransformer as TT

    assert jax.default_backend() == "tpu", jax.default_backend()
    out = {"backend": "tpu"}

    ae_cfg = AutoencoderConfig(
        necf=8, necf_mult=(1, 2), ndcf=8, ndcf_mult=(1, 2),
        z_size=16, z_num=32, z_shape=(4, 4), max_dim=8,
        inter_p=0.5, skip_memory=3, skip_context=(1, 2, 3),
        use_layout=True, layout_size=5, same_decoder_layout=True,
    )
    gcfg = TransformerConfig(
        z_num=32, z_len=128, z_chunk=32, num_blocks=4, cond_len=16,
        n_layer=2, n_head=2, n_embd=32, z_shape=(4, 4), emb_mode="temporal",
        layout=True, state_num=32, state_size=16, top_k=5,
        sample_state=True, top_k_state=5,
    )
    ae = FrameAutoencoder(ae_cfg, dtype=jnp.bfloat16)
    tr = TokenTransformer(gcfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = {"ae": ae.init(key), "gpt": tr.init(key, batch=1)}
    gen = VideoGenerator(Config(ae=ae_cfg, gpt=gcfg), ae, tr)
    rng = np.random.RandomState(0)
    vid = jnp.asarray(rng.randn(1, 4, 8, 8, 3).astype(np.float32)) * 0.1
    layout = jnp.asarray(rng.randint(0, 5, (1, 4, 8, 8)))

    t0 = time.time()
    o = gen.generate(params, jax.random.PRNGKey(1), vid, layout=layout)
    sync(o["fake"])
    fl = np.asarray(o["fake_layout"])
    out["layout_gen_s"] = round(time.time() - t0, 1)
    out["layout_fake_finite"] = bool(np.isfinite(np.asarray(o["fake"])).all())
    out["layout_classes_in_range"] = bool(fl.min() >= 0 and fl.max() < 5)
    out["rec_layout_shape"] = list(np.asarray(o["rec_layout"]).shape)

    # fixed-shape step-by-step: one traced transformer program for all frames
    ae2_cfg = dataclasses.replace(ae_cfg, use_layout=False, layout_size=None,
                                  same_decoder_layout=False)
    g2 = dataclasses.replace(gcfg, layout=False, state_num=0, state_size=0,
                             z_len=64, z_chunk=16, sample_state=False)
    ae2 = FrameAutoencoder(ae2_cfg, dtype=jnp.bfloat16)
    tr2 = TokenTransformer(g2, dtype=jnp.bfloat16)
    params2 = {"ae": ae2.init(key), "gpt": tr2.init(key, batch=1)}
    gen2 = VideoGenerator(Config(ae=ae2_cfg, gpt=g2), ae2, tr2)
    vid6 = jnp.asarray(rng.randn(1, 6, 8, 8, 3).astype(np.float32)) * 0.1
    before = TT._chunk_fill_jit._cache_size()
    t0 = time.time()
    o2 = gen2.generate_step_by_step(params2, jax.random.PRNGKey(2), vid6)
    sync(o2["fake"])
    out["sbs_fixed_s"] = round(time.time() - t0, 1)
    out["sbs_programs_traced"] = TT._chunk_fill_jit._cache_size() - before
    out["sbs_finite"] = bool(np.isfinite(np.asarray(o2["fake"])).all())

    # p2p step-by-step (end-frame cond prefix + extra decode context)
    g3 = dataclasses.replace(g2, p2p=True)
    tr3 = TokenTransformer(g3, dtype=jnp.bfloat16)
    params3 = {"ae": params2["ae"], "gpt": tr3.init(key, batch=1)}
    gen3 = VideoGenerator(Config(ae=ae2_cfg, gpt=g3), ae2, tr3)
    t0 = time.time()
    o3 = gen3.generate_step_by_step(params3, jax.random.PRNGKey(3), vid6)
    sync(o3["fake"])
    out["sbs_p2p_s"] = round(time.time() - t0, 1)
    out["sbs_p2p_finite"] = bool(np.isfinite(np.asarray(o3["fake"])).all())
    out["sbs_p2p_end_frame_real"] = bool(
        np.allclose(np.asarray(o3["fake"][:, -1]), np.asarray(vid6[:, -1]),
                    atol=1e-2))

    print(json.dumps(out))
    ok = (out["layout_fake_finite"] and out["layout_classes_in_range"]
          and out["sbs_programs_traced"] == 1 and out["sbs_finite"]
          and out["sbs_p2p_finite"] and out["sbs_p2p_end_frame_real"])
    os.makedirs("runs_r4", exist_ok=True)
    with open("runs_r4/tpu_drive_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
