"""Data-layer tests: elastic layout branch + layout loading quadrants."""

import numpy as np
import pytest

from ccvs_tpu.config import DataConfig
from ccvs_tpu.data.base import SyntheticDataset
from ccvs_tpu.data.elastic import ElasticParams, get_augmentation


def _img_layout(d=32):
    img = np.full((d, d, 3), -1.0, np.float32)
    lay = np.zeros((d, d), np.int64)
    img[8:20, 10:22] = 0.8
    lay[8:20, 10:22] = 1
    img[24:30, 2:8] = 0.3
    lay[24:30, 2:8] = 2
    return img, lay


@pytest.mark.parametrize("invert", [False, True])
@pytest.mark.parametrize("zoom", [1.0, 1.3])
def test_elastic_layout_branch_shapes(invert, zoom):
    """Layout branch (`augmentations.py:107-128`): same flows, nearest mode,
    class ids preserved."""
    img, lay = _img_layout()
    p = ElasticParams(alpha=1.0, sigma=0.2, invert=invert, min_zoom=zoom, max_zoom=zoom)
    out = get_augmentation(img, 16, p, np.random.RandomState(0), layout=lay)
    assert len(out) == 6
    ctx, dist, flow, mask, ctx_l, dist_l = out
    assert ctx.shape == (16, 16, 3) and dist.shape == (16, 16, 3)
    assert ctx_l.shape == (16, 16) and dist_l.shape == (16, 16)
    assert ctx_l.dtype == np.int64 and dist_l.dtype == np.int64
    assert set(np.unique(ctx_l)) <= {0, 1, 2}
    assert set(np.unique(dist_l)) <= {0, 1, 2}
    # without layout the legacy 4-tuple survives
    out4 = get_augmentation(img, 16, p, np.random.RandomState(0))
    assert len(out4) == 4


def test_elastic_layout_follows_image():
    """The warped layout must track the warped image: bright pixels (the
    class-1 square) should carry label 1 after the same elastic warp."""
    img = np.full((32, 32, 3), -1.0, np.float32)
    lay = np.zeros((32, 32), np.int64)
    img[6:26, 6:26] = 1.0
    lay[6:26, 6:26] = 1
    p = ElasticParams(alpha=1.0, sigma=0.3)
    ctx, dist, flow, mask, ctx_l, dist_l = get_augmentation(
        img, 32, p, np.random.RandomState(1), layout=lay
    )
    bright = dist[..., 0] > 0.5
    dark = dist[..., 0] < -0.5
    agree = (dist_l[bright] == 1).mean() if bright.any() else 1.0
    agree_bg = (dist_l[dark] == 0).mean() if dark.any() else 1.0
    assert agree > 0.9 and agree_bg > 0.9


def _cfg(**kw):
    base = dict(
        dataset="synthetic", max_dim=16, true_dim=32, vid_len=3,
        batch_size_img=4, batch_size_vid=2, n_consecutive_img=2, img_out_of_n=8,
        num_workers=1, load_layout=True,
    )
    base.update(kw)
    return DataConfig(**base)


def test_synthetic_layouts_img_group_with_elastic():
    cfg = _cfg(load_elastic_view=True, elastic_alpha=1.0, elastic_sigma=0.2)
    ds = SyntheticDataset(cfg, phase="train")
    item = ds[0]
    # [ctx, other, distorted] images; layouts follow (`base_dataset.py:313-318`;
    # shape matches the img-loss layout contract, tests/test_train.py)
    assert item["img"].shape == (3, 16, 16, 3)
    assert item["layout"].shape == (3, 16, 16)
    assert item["layout"].dtype == np.int64
    assert set(np.unique(item["layout"])) <= {0, 1}


def test_synthetic_layouts_vid():
    cfg = _cfg()
    ds = SyntheticDataset(cfg, phase="train", load_vid=True)
    item = ds[0]
    assert item["vid"].shape == (3, 16, 16, 3)
    assert item["layout"].shape == (3, 16, 16)
    # the moving square is labeled 1 where the frame is bright
    bright = item["vid"][..., 0] > 0.0
    assert (item["layout"][bright] == 1).mean() > 0.9


def test_loader_propagates_worker_exception():
    """A dataset error must surface in the consumer, not hang the loader."""
    from ccvs_tpu.data.loader import PrefetchLoader

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise ValueError("boom")

    loader = PrefetchLoader(Bad(), batch_size=2, num_workers=1)
    with pytest.raises(ValueError, match="boom"):
        next(iter(loader))


def test_img_layout_batch_feeds_layout_loss():
    """Dataset -> collate -> img loss integration for layout twins: the
    (G, H, W) layout batches must flow through img_generator_loss without
    rank errors (regression: a stray T axis broke the z_q/zl_q concat)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ccvs_tpu.config import AutoencoderConfig
    from ccvs_tpu.data.base import group_collate
    from ccvs_tpu.models import FrameAutoencoder
    from ccvs_tpu.train.ae_losses import AELosses

    ae_cfg = AutoencoderConfig(
        necf=8, necf_mult=(1, 2), ndcf=8, ndcf_mult=(1, 2),
        z_size=16, z_num=32, z_shape=(8, 8), max_dim=16,
        inter_p=0.5, skip_memory=2, skip_context=(1, 2),
        use_di=False, use_dv=False, use_vgg_img=False,
        use_direct_recovery_img=True, slide_inter=True, n_consecutive_img=2,
        use_layout=True, layout_size=2, same_decoder_layout=True,
    )
    data_cfg = _cfg(n_consecutive_img=2)
    ds = SyntheticDataset(data_cfg, phase="train")
    batch = group_collate([ds[0], ds[1]])
    assert batch["img"].shape == (4, 16, 16, 3)
    assert batch["layout"].shape == (4, 16, 16)

    ae = FrameAutoencoder(ae_cfg, dtype=jnp.float32)
    losses = AELosses(ae_cfg, ae)
    gen = ae.init(jax.random.PRNGKey(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    loss, (m, fake) = losses.img_generator_loss(gen, None, None, jb, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "layout_img" in m and "layout_quant_img" in m


def test_host_sharded_loading_matches_single_host():
    """Two simulated hosts loading disjoint strides of the same shuffled
    global index reassemble exactly the single-host batch (the multi-host
    input feed; reference per-rank split `tools/engine.py:81-101`)."""
    from ccvs_tpu.config import DataConfig
    from ccvs_tpu.data import PrefetchLoader, create_dataset

    cfg = DataConfig(dataset="synthetic", max_dim=16, true_dim=32,
                     batch_size_img=8, n_consecutive_img=1, img_out_of_n=4)
    ds = create_dataset(cfg, phase="valid", load_vid=False)

    def first_batch(host_shard):
        loader = PrefetchLoader(ds, 8, shuffle=True, num_workers=2, seed=7,
                                host_shard=host_shard)
        return next(iter(loader))

    full = first_batch(None)
    h0 = first_batch((0, 2))
    h1 = first_batch((1, 2))
    assert h0["img"].shape[0] == h1["img"].shape[0] == 4
    # device order puts process 0's rows first: global = concat(h0, h1),
    # which is the full batch reordered even-then-odd positions
    want = np.concatenate([full["img"][0::2], full["img"][1::2]])
    got = np.concatenate([h0["img"], h1["img"]])
    np.testing.assert_array_equal(got, want)


def test_host_sharded_loading_pads_uneven_dataset():
    """Dataset size not divisible by n_hosts: shards are wraparound-padded
    equal so every host yields the SAME batch count — a short shard would
    deadlock the cross-process collective in put_batch (the reference's
    DistributedSampler pads for the same reason, `tools/engine.py:87`)."""
    from ccvs_tpu.config import DataConfig
    from ccvs_tpu.data import PrefetchLoader
    from ccvs_tpu.data.base import SyntheticDataset

    cfg = DataConfig(dataset="synthetic", max_dim=16, true_dim=32,
                     batch_size_img=8, n_consecutive_img=1, img_out_of_n=4)
    ds = SyntheticDataset(cfg, phase="valid", n_videos=7)
    loaders = [PrefetchLoader(ds, 8, shuffle=True, num_workers=2, seed=7,
                              host_shard=(h, 2)) for h in range(2)]
    assert len(loaders[0]) == len(loaders[1]) == 1
    batches = [list(iter(ld)) for ld in loaders]
    assert [len(b) for b in batches] == [1, 1]
    assert all(b[0]["img"].shape[0] == 4 for b in batches)
    # the pad row wraps to the front of the shuffled index, so the 8
    # assembled rows cover all 7 items plus exactly one duplicate
    idx = np.arange(7)
    np.random.RandomState(7).shuffle(idx)
    rows = np.concatenate([ds[i]["img"] for i in np.concatenate([idx, idx[:1]])])
    got = np.concatenate([batches[0][0]["img"], batches[1][0]["img"]])
    np.testing.assert_array_equal(
        np.sort(got.reshape(8, -1), axis=0), np.sort(rows.reshape(8, -1), axis=0))


def test_shard_index_partitions_clips():
    """shard_index strides are disjoint and cover the full clip index."""
    from ccvs_tpu.data.clips import build_clip_index, shard_index

    index = build_clip_index([10, 7, 16], clip_len=4, skip=2)
    shards = [shard_index(index, h, 3) for h in range(3)]
    seen = sorted(
        (int(v), int(s)) for sh in shards
        for v, s in zip(sh.video_ids, sh.starts)
    )
    want = sorted((int(v), int(s)) for v, s in zip(index.video_ids, index.starts))
    assert seen == want
    assert sum(len(s) for s in shards) == len(index)


def test_download_kinetics_injected(tmp_path):
    """CSV-driven layout/skip/trim semantics with injected fetch/trim
    (`data/scripts/download_kinetics.py:22-129`; no network in this env)."""
    from ccvs_tpu.data.prep import download_kinetics

    csv_path = tmp_path / "links.csv"
    csv_path.write_text(
        "label,youtube_id,time_start,time_end,split,is_cc\n"
        "jump,aaa,2,5,train,0\n"
        "jump,bbb,0,3,train,0\n"
        "run,ccc,1,2,val,0\n"
    )
    out = tmp_path / "videos"
    fetched = []

    def fetch(vid, path):
        if vid == "bbb":
            raise KeyError("unavailable")
        fetched.append(vid)
        with open(path, "wb") as f:
            f.write(b"raw" + vid.encode())

    def trim(src, dst, start, dur):
        with open(src, "rb") as f, open(dst, "wb") as g:
            g.write(f.read() + f"|{start:g}+{dur:g}".encode())
        return True

    counts = download_kinetics(str(csv_path), str(out), trim=True, num_jobs=2,
                               fetch_fn=fetch, trim_fn=trim)
    assert counts == {"ok": 2, "failed": 1}
    assert (out / "jump" / "aaa_2_3.mp4").read_bytes() == b"rawaaa|2+3"
    assert (out / "run" / "ccc_1_1.mp4").read_bytes() == b"rawccc|1+1"
    assert not (out / ".tmp_download").exists()  # scratch cleaned up

    # second run: everything cached, nothing re-fetched
    fetched.clear()
    counts = download_kinetics(str(csv_path), str(out), trim=True, num_jobs=1,
                               fetch_fn=fetch, trim_fn=trim)
    assert counts["cached"] == 2 and fetched == []

    # a label literally named "tmp" must survive the scratch cleanup, and
    # trim=False publishes via atomic rename out of scratch
    csv2 = tmp_path / "links2.csv"
    csv2.write_text("label,youtube_id,time_start,time_end\ntmp,ddd,0,2\n")
    counts = download_kinetics(str(csv2), str(out), trim=False, num_jobs=1,
                               fetch_fn=fetch, trim_fn=trim)
    assert counts == {"ok": 1}
    assert (out / "tmp" / "ddd_0_2.mp4").read_bytes() == b"rawddd"


def test_download_kinetics_atomic_failures(tmp_path):
    """Interrupted fetches/trims must not poison the cache: a trim that
    fails after a partial write, or a fetch that dies mid-download, leaves
    no published/raw file, and a later healthy rerun completes the clip
    instead of reporting it 'cached' (matches the downloader's resume
    semantics, `data/scripts/download_kinetics.py`)."""
    from ccvs_tpu.data.prep import download_kinetics

    csv_path = tmp_path / "links.csv"
    csv_path.write_text("label,youtube_id,time_start,time_end\njump,aaa,2,5\n")
    out = tmp_path / "videos"

    def fetch(vid, path):
        with open(path, "wb") as f:
            f.write(b"raw" + vid.encode())

    def bad_trim(src, dst, start, dur):
        with open(dst, "wb") as g:
            g.write(b"PARTIAL")  # e.g. ffmpeg killed mid-encode
        return False

    counts = download_kinetics(str(csv_path), str(out), trim=True, num_jobs=1,
                               fetch_fn=fetch, trim_fn=bad_trim)
    assert counts == {"failed": 1}
    assert not (out / "jump" / "aaa_2_3.mp4").exists()  # no partial published

    def good_trim(src, dst, start, dur):
        with open(src, "rb") as f, open(dst, "wb") as g:
            g.write(f.read() + f"|{start:g}+{dur:g}".encode())
        return True

    counts = download_kinetics(str(csv_path), str(out), trim=True, num_jobs=1,
                               fetch_fn=fetch, trim_fn=good_trim)
    assert counts == {"ok": 1}
    assert (out / "jump" / "aaa_2_3.mp4").read_bytes() == b"rawaaa|2+3"

    # fetch dying mid-write leaves no raw: a sibling row with the same
    # youtube_id must re-fetch, not trim a truncated file
    csv2 = tmp_path / "links2.csv"
    csv2.write_text("label,youtube_id,time_start,time_end\n"
                    "jump,eee,0,2\njump,eee,3,5\n")
    calls = []

    def flaky_fetch(vid, path):
        calls.append(vid)
        with open(path, "wb") as f:
            f.write(b"trunc")
        if len(calls) == 1:
            raise OSError("network drop mid-download")
        with open(path, "wb") as f:
            f.write(b"raw" + vid.encode())

    counts = download_kinetics(str(csv2), str(out), trim=True, num_jobs=1,
                               fetch_fn=flaky_fetch, trim_fn=good_trim)
    assert counts == {"failed": 1, "ok": 1}
    assert (out / "jump" / "eee_3_2.mp4").read_bytes() == b"raweee|3+2"

    # a trim_fn that RAISES (e.g. no ffmpeg on PATH) counts that clip failed
    # instead of aborting the whole batch
    def raising_trim(src, dst, start, dur):
        raise FileNotFoundError("ffmpeg")

    counts = download_kinetics(str(csv_path), str(out), trim=True, num_jobs=1,
                               fetch_fn=fetch, trim_fn=raising_trim)
    assert counts == {"cached": 1}  # aaa_2_3 already published above
    (out / "jump" / "aaa_2_3.mp4").unlink()
    counts = download_kinetics(str(csv_path), str(out), trim=True, num_jobs=1,
                               fetch_fn=fetch, trim_fn=raising_trim)
    assert counts == {"failed": 1}

    # trim=False with several segments sharing one youtube_id: the raw
    # download must be fetched ONCE and published (copied) to every final —
    # moving it out of scratch would force a re-download per segment
    csv3 = tmp_path / "links3.csv"
    csv3.write_text("label,youtube_id,time_start,time_end\n"
                    "jump,fff,0,2\njump,fff,3,5\n")
    calls2 = []

    def counting_fetch(vid, path):
        calls2.append(vid)
        with open(path, "wb") as f:
            f.write(b"raw" + vid.encode())

    counts = download_kinetics(str(csv3), str(out), trim=False, num_jobs=2,
                               fetch_fn=counting_fetch, trim_fn=good_trim)
    assert counts == {"ok": 2}
    assert calls2 == ["fff"]  # one fetch for both segments
    assert (out / "jump" / "fff_0_2.mp4").read_bytes() == b"rawfff"
    assert (out / "jump" / "fff_3_2.mp4").read_bytes() == b"rawfff"


def test_load_frame_tolerates_truncated_jpeg(tmp_path):
    """Reference sets PIL LOAD_TRUNCATED_IMAGES (`data/base_dataset.py:8-9`);
    a frame file cut mid-write must decode, not kill a long training run."""
    import io

    from PIL import Image as PILImage

    from ccvs_tpu.data.base import load_frame

    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    PILImage.fromarray(rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)).save(
        buf, "JPEG")
    data = buf.getvalue()
    p = tmp_path / "trunc.jpg"
    p.write_bytes(data[: len(data) - len(data) // 4])  # drop the tail
    out = load_frame(str(p))
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


def test_fold_cycler_random_mode():
    """random_fold_train picks folds at random per cycle (reference
    `helpers/frame_autoencoder_trainer.py:108`, set by every shipped
    kinetics script); round-robin stays the default."""
    from ccvs_tpu.data import FoldCycler

    folds_seen = []

    def make_loader(fold):
        folds_seen.append(fold)
        return [fold]  # one batch per fold

    it = iter(FoldCycler(make_loader, num_folds=5, init_fold=0))
    seq = [next(it) for _ in range(10)]
    assert seq == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]  # round-robin default

    folds_seen.clear()
    it = iter(FoldCycler(make_loader, num_folds=5, random_fold=True, seed=0))
    seq = [next(it) for _ in range(25)]
    assert seq[0] == 0  # init fold honored
    assert set(seq) <= set(range(5)) and len(set(seq)) > 2  # spreads out
    it2 = iter(FoldCycler(make_loader, num_folds=5, random_fold=True, seed=0))
    assert [next(it2) for _ in range(25)] == seq  # seeded = reproducible
