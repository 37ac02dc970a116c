"""End-to-end data pipeline on a synthetic mini-KITTI tree."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from groomed_nms_tpu.config import ExperimentConfig, load_config
from groomed_nms_tpu.data.augment import preprocess_images
from groomed_nms_tpu.data.imdb import build_imdb
from groomed_nms_tpu.data.pipeline import TrainLoader, prepare_anchors


CAL = ("P2: 707.0 0.0 604.0 45.75 0.0 707.0 180.5 -0.34 "
       "0.0 0.0 1.0 0.005\n")


def _make_kitti_tree(root, n_images=4, im_h=96, im_w=320):
    from PIL import Image
    rng = np.random.default_rng(0)
    for split in ("training",):
        for sub in ("image_2", "calib", "label_2"):
            os.makedirs(os.path.join(root, split, sub), exist_ok=True)
        for i in range(n_images):
            iid = f"{i:06d}"
            img = rng.integers(0, 255, (im_h, im_w, 3), np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, split, "image_2", iid + ".png"))
            with open(os.path.join(root, split, "calib", iid + ".txt"),
                      "w") as f:
                f.write(CAL)
            lines = []
            for _ in range(3):
                x1, y1 = rng.uniform(0, im_w - 60), rng.uniform(20, im_h - 40)
                w, h = rng.uniform(30, 60), rng.uniform(25, 40)
                x, z = rng.uniform(-10, 10), rng.uniform(10, 40)
                ry = rng.uniform(-np.pi, np.pi)
                alpha = ry - np.arctan2(x, z)
                lines.append(
                    f"Car 0.0 0 {alpha:.2f} {x1:.2f} {y1:.2f} "
                    f"{x1 + w:.2f} {y1 + h:.2f} 1.5 1.6 3.9 "
                    f"{x:.2f} 1.65 {z:.2f} {ry:.2f}")
            with open(os.path.join(root, split, "label_2", iid + ".txt"),
                      "w") as f:
                f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti") / "kitti_split1")
    _make_kitti_tree(root)
    return root


def _tiny_cfg():
    return ExperimentConfig(
        backbone_tiny=True, batch_size=2, crop_size=(96, 320), test_scale=96,
        max_gts=16, max_igns=8, max_nms_boxes=32, max_ap_boxes=64,
        anchor_scales_count=4, min_gt_vis=0.0)


def test_build_imdb_and_cache(mini_kitti, tmp_path):
    cache = str(tmp_path / "imdb.pkl")
    imdb = build_imdb(mini_kitti, "training", cache_file=cache)
    assert len(imdb) == 4
    assert os.path.exists(cache)
    imdb2 = build_imdb(mini_kitti, "training", cache_file=cache)
    assert len(imdb2) == 4
    rec = imdb[0]
    assert rec.p2.shape == (4, 4)
    assert len(rec.gts["cls"]) == 3
    assert rec.im_h == 96 and rec.im_w == 320


def test_prepare_anchors(mini_kitti, tmp_path):
    cfg = _tiny_cfg()
    imdb = build_imdb(mini_kitti, "training")
    anchors, means, stds = prepare_anchors(cfg, imdb,
                                           cache_dir=str(tmp_path))
    # unused anchors pruned; survivors carry learned 3D priors
    assert 1 <= anchors.shape[0] <= 12
    assert anchors.shape[1] == 11     # 4 box + z w h l rot sin cos
    assert (anchors[:, 4] > 0).all()  # depth priors positive
    assert means.shape == (13,) and stds.shape == (13,)
    assert (stds > 0).all()
    # cached round trip
    a2, m2, s2 = prepare_anchors(cfg, imdb, cache_dir=str(tmp_path))
    np.testing.assert_allclose(a2, anchors)


def test_prepare_anchors_fg_buffer_overflow(mini_kitti, tmp_path,
                                            monkeypatch):
    """The single-compile stats pass compacts fg rows into a fixed
    device buffer; an undersized buffer must fail LOUDLY (silently
    dropping rows would skew the bbox means/stds every run consumes),
    with the env knob named in the message."""
    import dataclasses
    monkeypatch.setenv("GROOMED_STATS_MAX_FG", "1")
    # near-zero fg threshold so any overlap goes foreground; the fixture's
    # projected 2D boxes land outside its tiny image plane, so rewrite
    # them to cover it (only the fg COUNT matters to the guard)
    cfg = dataclasses.replace(_tiny_cfg(), fg_thresh=0.01, best_thresh=0.001,
                              bg_thresh_lo=0.0, bg_thresh_hi=0.005)
    imdb = build_imdb(mini_kitti, "training")
    for rec in imdb:
        n = len(rec.gts["cls"])
        rec.gts["bbox_full"] = np.tile(
            np.array([[8.0, 8.0, 200.0, 80.0]]), (n, 1))
    with pytest.raises(RuntimeError, match="GROOMED_STATS_MAX_FG"):
        prepare_anchors(cfg, imdb, cache_dir=str(tmp_path))


def test_prepare_anchors_empty_imdb_requires_cache(tmp_path):
    """Eval/export entry points pass an empty imdb: with no cached
    anchors.npz the priors would be learned from nothing (all-zero w3d
    priors -> exp(d)*0 boxes, a silently broken model), so prepare_anchors
    must refuse (review r3)."""
    with pytest.raises(ValueError, match="anchors.npz"):
        prepare_anchors(_tiny_cfg(), [], cache_dir=str(tmp_path))


def test_resolve_stats_dir_copy_stats(mini_kitti, tmp_path):
    """copy_stats configs (the flagship groomed_nms stage) keep their
    anchors/statistics in the pretrained (warmup) run's directory:
    resolve_stats_dir must route eval/export there when out_dir has none,
    but only when the cached layout matches this stage's columns."""
    import dataclasses

    from groomed_nms_tpu.data.pipeline import resolve_stats_dir

    pre = tmp_path / "warmup"
    out = tmp_path / "stage2"
    pre.mkdir(), out.mkdir()
    imdb = build_imdb(mini_kitti, "training")
    base = _tiny_cfg()
    prepare_anchors(base, imdb, cache_dir=str(pre))  # 11/13-col cache

    cfg = dataclasses.replace(base, copy_stats=True, pretrained=str(pre))
    # out_dir empty + matching pretrained cache -> pretrained
    assert resolve_stats_dir(cfg, str(out)) == str(pre)
    a, m, s = prepare_anchors(cfg, [], cache_dir=resolve_stats_dir(
        cfg, str(out)))
    assert a.shape[1] == 11 and m.shape == (13,)
    # an own out_dir cache wins (training recomputed there)
    prepare_anchors(cfg, imdb, cache_dir=str(out))
    assert resolve_stats_dir(cfg, str(out)) == str(out)
    # layout mismatch (has_vel stage vs still-image warmup cache): never
    # route to the pretrained dir
    vel_cfg = dataclasses.replace(base, copy_stats=True,
                                  pretrained=str(pre), has_vel=True)
    out2 = tmp_path / "video_stage"
    out2.mkdir()
    assert resolve_stats_dir(vel_cfg, str(out2)) == str(out2)
    # copy_stats off -> always out_dir
    assert resolve_stats_dir(base, str(out2)) == str(out2)


def test_train_loader_batches(mini_kitti):
    cfg = _tiny_cfg()
    imdb = build_imdb(mini_kitti, "training")
    loader = TrainLoader(imdb, cfg, seed=0, prefetch=1)
    batch = next(loader)
    assert batch["images_u8"].shape == (2, 96, 320, 3)
    gt = batch["gt"]
    assert gt.gts_2d.shape == (2, 16, 4)
    assert gt.gt_valid.sum() > 0
    assert gt.p2.shape == (2, 4, 4)
    loader.close()


def test_preprocess_images_device():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 96, 320, 3), np.uint8)
    out = preprocess_images(
        jnp.asarray(imgs), jnp.asarray([False, True]),
        jnp.asarray([0.485, 0.456, 0.406]), jnp.asarray([0.229, 0.224, 0.225]),
        target_h=64, crop_w=256)
    out = np.asarray(out)
    assert out.shape == (2, 64, 256, 3)
    assert np.isfinite(out).all()
    # mirrored image: re-running with mirror flipped on input equals flip
    out2 = preprocess_images(
        jnp.asarray(imgs[:, :, ::-1]), jnp.asarray([False, False]),
        jnp.asarray([0.485, 0.456, 0.406]), jnp.asarray([0.229, 0.224, 0.225]),
        target_h=64, crop_w=256)
    np.testing.assert_allclose(out[1], np.asarray(out2)[1], atol=1e-5)
    # crop_w wider than the scaled width -> zero padding on the right
    out3 = np.asarray(preprocess_images(
        jnp.asarray(imgs), jnp.asarray([False, False]),
        jnp.zeros(3), jnp.ones(3), target_h=64, crop_w=400))
    assert out3.shape[2] == 400
    np.testing.assert_allclose(out3[:, :, 214:], 0.0, atol=1e-6)


def test_preprocess_images_train_distort():
    import jax
    from groomed_nms_tpu.data.augment import preprocess_images_train
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (2, 96, 320, 3), np.uint8)
    means = jnp.asarray([0.485, 0.456, 0.406])
    stds = jnp.asarray([0.229, 0.224, 0.225])
    mirror = jnp.asarray([False, True])
    key = jax.random.PRNGKey(0)
    base = np.asarray(preprocess_images(jnp.asarray(imgs), mirror, means,
                                        stds, target_h=64, crop_w=256))
    # prob <= 0: bit-identical to the eval path
    off = np.asarray(preprocess_images_train(
        jnp.asarray(imgs), mirror, means, stds, key,
        target_h=64, crop_w=256, distort_prob=-1.0))
    np.testing.assert_array_equal(off, base)
    # prob = 1: every image jittered, still finite and bounded
    on = np.asarray(preprocess_images_train(
        jnp.asarray(imgs), mirror, means, stds, key,
        target_h=64, crop_w=256, distort_prob=1.0))
    assert on.shape == base.shape and np.isfinite(on).all()
    assert np.abs(on - base).max() > 1e-3
    # distortion clips to [0, 255] pre-normalisation
    un_norm = on * np.asarray(stds) + np.asarray(means)
    assert un_norm.min() >= -1e-5 and un_norm.max() <= 1.0 + 1e-5


def test_config_modules_load():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for name in ("groomed_nms", "kitti_3d_warmup", "self_balancing",
                 "kitti_3d_uncertainty", "kitti_3d_full",
                 "groomed_nms_full_train_2", "kitti_3d_warmup_full_train",
                 "kitti_3d_warmup_full_train_2",
                 "kitti_3d_uncertainty_split2"):
        cfg = load_config(name)
        assert cfg.name == name
        lc = cfg.loss_config()
        dc = cfg.detect_config()
        rc = cfg.rpn_config(36)
    # shipped groomed config flips the right knobs
    g = load_config("groomed_nms")
    assert g.use_nms_in_loss and g.predict_acceptance_prob
    w = load_config("kitti_3d_warmup")
    assert not w.use_nms_in_loss and w.max_iter == 80000
    # trainval warmups: full KITTI annotations, no validation stage;
    # the _2 variant doubles the schedule (reference
    # kitti_3d_warmup_full_train[_2].py)
    wf = load_config("kitti_3d_warmup_full_train")
    assert wf.dataset_train == "kitti" and not wf.do_test
    assert load_config("kitti_3d_warmup_full_train_2").max_iter == 160000
    us2 = load_config("kitti_3d_uncertainty_split2")
    assert us2.dataset_train == "kitti_split2" and us2.has_un
    assert us2.pretrained.endswith("kitti_3d_warmup_split2")
    # ablations flip exactly one knob each
    from configs.ablations import ALL
    base = g
    for key, fn in ALL.items():
        cfg = fn()
        assert cfg.name != base.name
        # factory variants resolve by full name through load_config, so the
        # reference's per-file config names all work on the script CLIs
        assert load_config(cfg.name).name == cfg.name
    assert load_config("groomed_nms_group_200").diff_nms_group_size == 200
    with pytest.raises(ModuleNotFoundError):
        load_config("groomed_nms_not_a_real_variant")


def test_config_cli_overrides():
    # --set KEY=VALUE parsing: literals, tuples, bare strings; bad keys
    # fail fast with suggestions (scripts/train.py --set)
    from groomed_nms_tpu.config import apply_overrides
    cfg = load_config("kitti_3d_warmup")
    out = apply_overrides(cfg, ["batch_size=8", "lr=0.008",
                                "lr_policy=step",
                                "crop_size=(256, 880)"])
    assert out.batch_size == 8 and out.lr == 0.008
    assert out.lr_policy == "step" and out.crop_size == (256, 880)
    assert cfg.batch_size == 2  # original untouched
    with pytest.raises(ValueError, match="unknown config field"):
        apply_overrides(cfg, ["learning_rate=1"])
    with pytest.raises(ValueError, match="KEY=VALUE"):
        apply_overrides(cfg, ["batch_size"])


def test_anchor_scales_formula():
    cfg = ExperimentConfig()
    scales = cfg.anchor_scales
    assert len(scales) == 12
    np.testing.assert_allclose(scales[0], 512 * 0.0625)
    np.testing.assert_allclose(scales[-1], 512 * 0.75)


def test_loader_worker_error_propagates(mini_kitti):
    """A poisoned record raises in __next__ instead of hanging forever."""
    from groomed_nms_tpu.data.pipeline import TrainLoader

    cfg = _tiny_cfg()
    imdb = build_imdb(mini_kitti, "training")
    import dataclasses
    bad = [dataclasses.replace(rec, image_path="/nonexistent/missing.png")
           for rec in imdb]
    loader = TrainLoader(bad, cfg, seed=0)
    with pytest.raises(RuntimeError, match="TrainLoader worker failed"):
        next(loader)
    loader.close()


def test_loader_raw_cache_and_determinism(mini_kitti, tmp_path):
    """Raw decoded-image cache: batches are bit-identical with the cache
    off, cold (populating), and warm (mmap reads); a warm cache never
    touches the PNGs again; wait-stat accounting pops."""
    cfg = _tiny_cfg()
    imdb = build_imdb(mini_kitti, "training")
    cache = str(tmp_path / "decoded")

    def pull(loader, n=3):
        out = [next(loader) for _ in range(n)]
        loader.close()
        return out

    plain = pull(TrainLoader(imdb, cfg, seed=7, prefetch=1))
    cold = pull(TrainLoader(imdb, cfg, seed=7, prefetch=1,
                            raw_cache_dir=cache))
    assert len(os.listdir(cache)) > 0, "cold pass must populate the cache"
    warm_loader = TrainLoader(imdb, cfg, seed=7, prefetch=1,
                              raw_cache_dir=cache)
    warm = pull(warm_loader)
    for a, b, c in zip(plain, cold, warm):
        np.testing.assert_array_equal(a["images_u8"], b["images_u8"])
        np.testing.assert_array_equal(a["images_u8"], c["images_u8"])
        np.testing.assert_array_equal(a["mirror"], b["mirror"])
        np.testing.assert_array_equal(a["gt"].gts_2d, c["gt"].gts_2d)

    # warm cache: PNGs are no longer needed (mmap path only)
    import dataclasses
    gone = [dataclasses.replace(rec, image_path="/nonexistent/x.png")
            for rec in imdb]
    loader = TrainLoader(gone, cfg, seed=7, prefetch=1,
                         raw_cache_dir=cache)
    batch = next(loader)
    assert batch["images_u8"].shape[0] == cfg.batch_size
    s, n = loader.pop_wait_stats()
    assert n == 1 and s >= 0.0
    assert loader.pop_wait_stats() == (0.0, 0)
    loader.close()


def test_load_image_cached_shared_helper(tmp_path):
    """The tester-facing helper: cold decode populates the cache file,
    warm read mmaps it, and a regenerated source image invalidates the
    stale entry (the cache key carries the source's size+mtime)."""
    from PIL import Image

    from groomed_nms_tpu.data.pipeline import load_image_cached

    rng = np.random.default_rng(3)
    path = str(tmp_path / "000042.png")
    old = rng.integers(0, 255, (24, 40, 3), dtype=np.uint8)
    Image.fromarray(old).save(path)
    cache = str(tmp_path / "raw")
    os.makedirs(cache)
    cold = load_image_cached(path, "000042", cache)
    cached = [f for f in os.listdir(cache) if f.endswith(".npy")]
    assert len(cached) == 1 and cached[0].startswith("000042-")
    warm = load_image_cached(path, "000042", cache)
    assert isinstance(warm, np.memmap)
    np.testing.assert_array_equal(np.asarray(cold), old)
    np.testing.assert_array_equal(np.asarray(warm), old)
    # regenerate the source (different pixels + forced different mtime):
    # the stale cache entry must NOT be served
    new = (old // 2 + 7).astype(np.uint8)
    Image.fromarray(new).save(path)
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 10**6))
    fresh = load_image_cached(path, "000042", cache)
    np.testing.assert_array_equal(np.asarray(fresh), new)
    # no cache dir: plain decode
    plain = load_image_cached(path, "000042", None)
    np.testing.assert_array_equal(plain, new)


def test_device_prefetch_close_stops_worker():
    """Closing the generator stops the worker thread: an infinite host
    iterator must not keep decoding/transferring after the consumer is
    done (it would pin batches in HBM and steal the host core)."""
    import threading
    import time

    from groomed_nms_tpu.data.pipeline import device_prefetch

    produced = []

    def infinite():
        i = 0
        while True:
            produced.append(i)
            yield np.full((4,), i, np.float32)
            i += 1

    gen = device_prefetch(infinite(), depth=2)
    first = np.asarray(next(gen))
    assert first[0] == 0.0
    gen.close()
    # the worker must wind down: production stops (allow the one batch a
    # blocked worker may finish after the drain unblocks it)
    time.sleep(0.2)
    high = len(produced)
    time.sleep(0.3)
    assert len(produced) == high, "worker kept producing after close()"
    assert not any(t.name == "device_prefetch" and t.is_alive()
                   for t in threading.enumerate())
