"""Video-model training pipeline: tracking imdb -> clip loader -> train step.

Covers the kitti_3d_full stage wiring (scripts/train.py model="kalman"):
velocity-aware anchors/stats, fixed-width GT padding across records with and
without tracking velocities, the clip loader, warm-start head widening, and
an end-to-end video train step.
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from groomed_nms_tpu.config import ExperimentConfig
from groomed_nms_tpu.data.pipeline import (ClipRecordView, VideoTrainLoader,
                                           prepare_anchors)
from groomed_nms_tpu.data.tracking import build_tracking_imdb

CAL = ("P2: 707.0 0.0 604.0 45.75 0.0 707.0 180.5 -0.34 "
       "0.0 0.0 1.0 0.005\n")


def _img(path, h=96, w=320, seed=0):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(path)


def _make_tracking_tree(root, n_prev=1):
    """Two training images: 000000 has raw-sequence tracks (velocities),
    000001 has only the still label (no velocity -> 16-col bbox_3d)."""
    split = os.path.join(root, "training")
    for sub in ("image_2", "calib", "label_2", "prev_2"):
        os.makedirs(os.path.join(split, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "devkit", "mapping"), exist_ok=True)
    seq = "2011_09_26_drive_0005_sync"
    raw = os.path.join(root, "raw_extra", seq)
    os.makedirs(os.path.join(raw, "label_2"), exist_ok=True)

    def label_row(z=15.0, tid=None):
        row = (f"Car 0.0 0 0.2 100 30 180 80 1.5 1.6 3.9 "
               f"2.0 1.65 {z:.1f} 0.3")
        return row + (f" {tid}" if tid is not None else "") + "\n"

    for idx, iid in enumerate(("000000", "000001")):
        _img(os.path.join(split, "image_2", iid + ".png"), seed=idx)
        for k in range(1, n_prev + 1):
            _img(os.path.join(split, "prev_2", f"{iid}_{k:02d}.png"),
                 seed=10 + idx * 4 + k)
        open(os.path.join(split, "calib", iid + ".txt"), "w").write(CAL)
        open(os.path.join(split, "label_2", iid + ".txt"),
             "w").write(label_row())

    # image 0 -> (seq, frame 5); image 1 -> a sequence with no pose file
    open(os.path.join(root, "devkit", "mapping", "train_mapping.txt"),
         "w").write(f"2011_09_26 {seq} 0000000005\n"
                    "2011_09_26 no_such_seq 0000000003\n")
    open(os.path.join(root, "devkit", "mapping", "train_rand.txt"),
         "w").write("1,2\n")

    pose_rows = []
    for i in range(8):
        p = np.eye(4)
        p[2, 3] = float(i)
        pose_rows.append(" ".join(str(v) for v in p[:3].reshape(-1)))
    open(os.path.join(raw, "pose.txt"), "w").write("\n".join(pose_rows) + "\n")
    # raw per-frame labels carry a persistent track id (last column)
    for fi in range(4, 6):
        open(os.path.join(raw, "label_2", f"{fi:06d}.txt"),
             "w").write(label_row(tid=7))
    return root


def _video_cfg():
    return ExperimentConfig(
        model="kalman", backbone_tiny=True, batch_size=2,
        crop_size=(96, 320), test_scale=96, max_gts=8, max_igns=4,
        max_nms_boxes=32, max_ap_boxes=64, anchor_scales_count=4,
        min_gt_vis=0.0, has_vel=True, has_un=True, bbox_un_dynamic=True,
        predict_acceptance_prob=False, use_nms_in_loss=False,
        after_nms_lambda=0.0, video_count=2, mirror_prob=0.5)


def test_tracking_pipeline_end_to_end(tmp_path):
    root = _make_tracking_tree(str(tmp_path / "kitti_split1"), n_prev=1)
    cfg = _video_cfg()
    imdb = [ClipRecordView(r)
            for r in build_tracking_imdb(root, "training", n_prev=1)]
    assert len(imdb) == 2
    # record 0 carries a velocity column, record 1 does not
    assert imdb[0].gts["bbox_3d"].shape[1] == 17
    assert imdb[1].gts["bbox_3d"].shape[1] == 16
    # ego advances 1 m/frame while the object's camera-frame z is constant
    # -> world velocity 1 m/frame
    assert math.isclose(float(imdb[0].gts["bbox_3d"][0, 16]), 1.0,
                        rel_tol=1e-6)

    # velocity-aware anchors (12 cols) + stats (14 cols)
    anchors, means, stds = prepare_anchors(cfg, imdb)
    assert anchors.shape[1] == 12
    assert means.shape == (14,) and stds.shape == (14,)
    assert np.isfinite(means).all() and (stds > 0).all()

    # clip loader: fixed 17-col GTs; the no-velocity record pads with -inf
    loader = VideoTrainLoader(imdb, cfg, seed=0, prefetch=1)
    batch = next(loader)
    assert batch["images_u8"].shape == (2, 2, 96, 320, 3)
    gt = batch["gt"]
    assert gt.gts_3d.shape == (2, 8, 17)
    assert gt.gt_valid.sum() > 0
    vel = gt.gts_3d[..., 16][np.asarray(gt.gt_valid)]
    assert ((vel == -np.inf) | np.isfinite(vel)).all()

    # end-to-end: video model + has_vel loss trains on the loader batch
    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.data.augment import preprocess_images
    from groomed_nms_tpu.models.video import VideoConfig, VideoRPN3D
    from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                          create_train_state,
                                          make_video_train_step)

    rois = np.asarray(locate_anchors(anchors, (6, 20), 16))
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]
    rpn_cfg = cfg.rpn_config(anchors.shape[0])
    assert rpn_cfg.predict_velocity
    model = VideoRPN3D(VideoConfig(rpn=rpn_cfg))
    tx = build_optimizer("sgd", build_lr_schedule(0.004, 10))
    state = create_train_state(model, (1, 2, 64, 64, 3), tx)
    step = jax.jit(make_video_train_step(
        cfg.loss_config(), jnp.asarray(rois), jnp.asarray(rois_3d),
        means.astype(np.float32), stds.astype(np.float32)))

    u8 = batch["images_u8"]
    b, f = u8.shape[:2]
    flat = preprocess_images(
        jnp.asarray(u8.reshape((b * f,) + u8.shape[2:])),
        jnp.asarray(np.repeat(batch["mirror"], f)),
        jnp.asarray(cfg.image_means), jnp.asarray(cfg.image_stds),
        target_h=cfg.crop_size[0], crop_w=cfg.crop_size[1])
    device_batch = dict(
        images=flat.reshape(b, f, cfg.crop_size[0], cfg.crop_size[1], 3),
        **batch["gt"]._asdict())
    for _ in range(2):
        state, stats = step(state, device_batch)
        assert np.isfinite(float(stats["total"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    loader.close()


def test_widen_fused_head_for_velocity():
    """Channel scatter: widened head reproduces every original channel with
    a zero vel channel inserted at position C+4+10 of each anchor block."""
    from groomed_nms_tpu.utils.torch_weights import \
        widen_fused_head_for_velocity

    rng = np.random.default_rng(0)
    a, c = 3, 4
    per = c + 4 + 10 + 1        # _un layout: cls 2d 3d unc
    kernel = rng.normal(size=(1, 1, 8, a * per)).astype(np.float32)
    bias = rng.normal(size=(a * per,)).astype(np.float32)
    out = widen_fused_head_for_velocity({"head": {"kernel": kernel,
                                                  "bias": bias}}, a, c)
    nk, nb = out["head"]["kernel"], out["head"]["bias"]
    new_per = per + 1
    assert nk.shape[-1] == a * new_per
    vel_pos = c + 4 + 10
    for ai in range(a):
        src, dst = ai * per, ai * new_per
        np.testing.assert_array_equal(nk[..., dst:dst + vel_pos],
                                      kernel[..., src:src + vel_pos])
        np.testing.assert_array_equal(nk[..., dst + vel_pos], 0.0)
        np.testing.assert_array_equal(nb[dst + vel_pos], 0.0)
        np.testing.assert_array_equal(
            nk[..., dst + vel_pos + 1:dst + new_per],
            kernel[..., src + vel_pos:src + per])
        np.testing.assert_array_equal(nb[dst:dst + vel_pos],
                                      bias[src:src + vel_pos])


def test_stale_anchor_cache_recomputed(tmp_path):
    """A copied warmup anchors.npz (11-col anchors / 13-col stats, no
    velocity column) must not poison a has_vel stage: prepare_anchors
    detects the layout mismatch and recomputes (ADVICE r2 high)."""
    import pytest
    root = _make_tracking_tree(str(tmp_path / "kitti_split1"), n_prev=1)
    cfg = _video_cfg()
    imdb = [ClipRecordView(r)
            for r in build_tracking_imdb(root, "training", n_prev=1)]
    cache_dir = str(tmp_path / "stats")
    os.makedirs(cache_dir)
    np.savez(os.path.join(cache_dir, "anchors.npz"),
             anchors=np.zeros((4, 11), np.float32),
             bbox_means=np.zeros(13), bbox_stds=np.ones(13))
    anchors, means, stds = prepare_anchors(cfg, imdb, cache_dir=cache_dir)
    assert anchors.shape[1] == 12 and means.shape == (14,)
    # cache now holds the corrected layout
    z = np.load(os.path.join(cache_dir, "anchors.npz"))
    assert z["anchors"].shape[1] == 12
    # stale cache + nothing to recompute from -> clear error, not a
    # trace-time slice failure
    np.savez(os.path.join(cache_dir, "anchors.npz"),
             anchors=np.zeros((4, 11), np.float32),
             bbox_means=np.zeros(13), bbox_stds=np.ones(13))
    with pytest.raises(ValueError, match="has_vel"):
        prepare_anchors(cfg, [], cache_dir=cache_dir)


def test_clip_loader_fills_missing_history(tmp_path):
    """A sequence start without prev_2 frames must not kill training:
    the loader repeats the nearest newer frame (zero apparent motion,
    matching the -inf no-velocity label sentinel). ADVICE r2 low."""
    root = _make_tracking_tree(str(tmp_path / "kitti_split1"), n_prev=1)
    os.remove(os.path.join(root, "training", "prev_2", "000000_01.png"))
    os.remove(os.path.join(root, "training", "prev_2", "000001_01.png"))
    cfg = _video_cfg()
    imdb = [ClipRecordView(r)
            for r in build_tracking_imdb(root, "training", n_prev=1)]
    loader = VideoTrainLoader(imdb, cfg, seed=0, prefetch=1)
    batch = next(loader)
    assert batch["images_u8"].shape == (2, 2, 96, 320, 3)
    # history frame == current frame when prev is missing
    np.testing.assert_array_equal(batch["images_u8"][:, 0],
                                  batch["images_u8"][:, 1])
    loader.close()


def test_has_vel_requires_decomp_alpha():
    """Unsupported knob combo fails with a clear message (ADVICE r2 low):
    the velocity column only exists in the decomp_alpha layout."""
    import pytest
    from groomed_nms_tpu.losses import LossConfig
    with pytest.raises(ValueError, match="decomp_alpha"):
        LossConfig(has_vel=True, decomp_alpha=False)


def test_video_loader_raw_cache(tmp_path):
    """Clip batches are bit-identical with the raw decoded-frame cache off,
    cold (populating), and warm; history frames cache under distinct keys
    (stem '000000_01' vs current '000000')."""
    root = _make_tracking_tree(str(tmp_path / "kitti_split1"), n_prev=1)
    cfg = _video_cfg()
    imdb = [ClipRecordView(r)
            for r in build_tracking_imdb(root, "training", n_prev=1)]
    cache = str(tmp_path / "decoded")

    def pull(loader, n=3):
        out = [next(loader) for _ in range(n)]
        loader.close()
        return out

    plain = pull(VideoTrainLoader(imdb, cfg, seed=5, prefetch=1))
    cold = pull(VideoTrainLoader(imdb, cfg, seed=5, prefetch=1,
                                 raw_cache_dir=cache))
    names = sorted(os.listdir(cache))
    assert any("_01" in n for n in names), names   # history frames cached
    warm = pull(VideoTrainLoader(imdb, cfg, seed=5, prefetch=1,
                                 raw_cache_dir=cache))
    for a, b, c in zip(plain, cold, warm):
        np.testing.assert_array_equal(a["images_u8"], b["images_u8"])
        np.testing.assert_array_equal(a["images_u8"], c["images_u8"])
        np.testing.assert_array_equal(a["gt"].gts_3d, c["gt"].gts_3d)
