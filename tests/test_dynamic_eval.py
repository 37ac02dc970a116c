"""Single-program multi-size eval (cfg.eval_single_program).

The grouped tester compiles one XLA program per distinct val image size
(multi-minute remote compiles on the TPU tunnel, VERDICT r2 weak #4);
``preprocess_images_dynamic`` resamples each image by its own traced scale
so ONE program covers every size. These tests pin the dynamic path to the
per-size path: numerically at the preprocess level, then end-to-end through
``test_kitti_3d`` on a mixed-size synthetic val split.
"""

import dataclasses
import os

import numpy as np
import pytest

from groomed_nms_tpu.data.augment import (pad_image_edge, preprocess_images,
                                          preprocess_images_dynamic)

MEANS = (0.485, 0.456, 0.406)
STDS = (0.229, 0.224, 0.225)


def test_pad_image_edge_replicates():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    out = pad_image_edge(img, 4, 5)
    np.testing.assert_array_equal(out[:2, :3], img)
    # bottom pad rows replicate the last row, right pad cols the last col
    np.testing.assert_array_equal(out[2], out[1])
    np.testing.assert_array_equal(out[3], out[1])
    np.testing.assert_array_equal(out[:, 3], out[:, 2])
    np.testing.assert_array_equal(out[:, 4], out[:, 2])


def test_pad_image_edge_rejects_oversize():
    img = np.zeros((5, 3, 3), np.uint8)
    with pytest.raises(ValueError, match="exceeds"):
        pad_image_edge(img, 4, 5)


def test_fit_image_to_plane(rng):
    from groomed_nms_tpu.data.augment import fit_image_to_plane

    # exact fit: unchanged, no rescale
    img = rng.integers(0, 256, (4, 5, 3), np.uint8)
    out, r = fit_image_to_plane(img, 4, 5)
    assert r == 1.0
    np.testing.assert_array_equal(out, img)

    # smaller: edge-padded, no rescale
    img = rng.integers(0, 256, (2, 3, 3), np.uint8)
    out, r = fit_image_to_plane(img, 4, 5)
    assert r == 1.0 and out.shape == (4, 5, 3)
    np.testing.assert_array_equal(out[:2, :3], img)

    # oversized: downscaled (aspect preserved) until it fits, then padded;
    # r reports the applied ratio so consumers can fold it into their scale
    img = rng.integers(0, 256, (8, 20, 3), np.uint8)
    out, r = fit_image_to_plane(img, 4, 5)
    assert out.shape == (4, 5, 3)
    assert r == pytest.approx(0.25)  # width-limited: 5/20


def test_tester_raises_on_stale_imdb_metadata(tmp_path):
    """Grouped (static-resize) eval must fail LOUDLY when an image's
    decoded size contradicts its imdb metadata: the batch plane and the
    static resize factor come from the metadata while ``scale`` uses the
    true height, so proceeding would silently shift every box of that
    image (review r3).  The error fires during the first chunk load --
    before any compile."""
    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.imdb import build_imdb
    from groomed_nms_tpu.data.pipeline import prepare_anchors
    from groomed_nms_tpu.eval.tester import test_kitti_3d
    from groomed_nms_tpu.models import RPN3D
    from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                          create_train_state)

    cfg = load_config("tiny_synthetic")
    root = str(tmp_path / "kitti")
    _make_mixed_tree(root, "validation", [(96, 320), (96, 320)])
    imdb = build_imdb(root, "validation", use_3d_for_2d=cfg.use_3d_for_2d,
                      cache_file=None)
    # stale metadata: claims 120 rows, the file on disk has 96
    imdb[0].im_h = 120

    anchors, means, stds = prepare_anchors(cfg, imdb)
    feat_hw = (cfg.crop_size[0] // cfg.feat_stride,
               cfg.crop_size[1] // cfg.feat_stride)
    rois = np.asarray(locate_anchors(anchors, feat_hw, cfg.feat_stride))
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]
    model = RPN3D(cfg.rpn_config(anchors.shape[0]))
    tx = build_optimizer(cfg.solver_type,
                         build_lr_schedule(cfg.lr, cfg.max_iter))
    state = create_train_state(model, (1, 64, 64, 3), tx)

    with pytest.raises(ValueError, match="stale imdb"):
        test_kitti_3d(cfg, model, state.params, state.batch_stats, rois,
                      rois_3d, means, stds, imdb,
                      str(tmp_path / "res"), gt_dir=None, batch_size=2,
                      skip_eval=True)


def _static(imgs, target_h, crop_w):
    import jax.numpy as jnp
    return np.asarray(preprocess_images(
        jnp.asarray(imgs), jnp.zeros((imgs.shape[0],), bool),
        jnp.asarray(MEANS), jnp.asarray(STDS), target_h=target_h,
        crop_w=crop_w))


def _dynamic(imgs, hw, target_h, crop_w):
    import jax.numpy as jnp
    return np.asarray(preprocess_images_dynamic(
        jnp.asarray(imgs), jnp.asarray(hw, np.float32), jnp.asarray(MEANS),
        jnp.asarray(STDS), target_h=target_h, crop_w=crop_w))


def test_dynamic_matches_static_full_buffer(rng):
    """Unpadded batch (every image fills the buffer): same convention as
    jax.image.resize (scale_and_translate, translation 0), so the dynamic
    path must agree to float tolerance."""
    imgs = rng.integers(0, 256, (2, 128, 416, 3), np.uint8)
    want = _static(imgs, 64, 224)  # s=0.5, new_w=208 -> zero-pad to 224
    got = _dynamic(imgs, [[128, 416]] * 2, 64, 224)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_dynamic_mixed_sizes_match_per_size_groups(rng):
    """Images of three different sizes, edge-padded into one max buffer,
    each match their own size-group's static preprocess."""
    target_h, crop_w = 64, 224
    # new_w = 208 (pad), 236 (crop), 160 (pad), 213 (non-integer w*s: the
    # static path resizes to round(w*s) columns -- the dynamic weights
    # reproduce that rounding exactly)
    sizes = [(128, 416), (96, 354), (112, 280), (100, 333)]
    h0max, w0max = 128, 416
    raws = [rng.integers(0, 256, (h, w, 3), np.uint8) for h, w in sizes]
    buf = np.stack([pad_image_edge(r, h0max, w0max) for r in raws])
    got = _dynamic(buf, sizes, target_h, crop_w)
    for bi, ((h, w), raw) in enumerate(zip(sizes, raws)):
        want = _static(raw[None], target_h, crop_w)[0]
        np.testing.assert_allclose(got[bi], want, atol=5e-4,
                                   err_msg=f"size {(h, w)}")


def _make_mixed_tree(root, split, specs, seed=0):
    """Synthetic KITTI split with per-image sizes ``specs = [(h, w), ...]``
    (the e2e helper writes one fixed size)."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    for sub in ("image_2", "calib", "label_2"):
        os.makedirs(os.path.join(root, split, sub), exist_ok=True)
    for i, (im_h, im_w) in enumerate(specs):
        iid = f"{i:06d}"
        f = im_h * 300.0 / 96.0  # keep focal proportional to image height
        cu, cv = im_w / 2.0, im_h / 2.0
        img = rng.integers(0, 80, (im_h, im_w, 3), np.uint8)
        lines = []
        for _ in range(3):
            x, z = rng.uniform(-8, 8), rng.uniform(8, 30)
            ry = rng.uniform(-np.pi, np.pi)
            alpha = ry - np.arctan2(x, z)
            u = f * x / z + cu
            v = f * 1.65 / z + cv
            w2, h2 = f * 1.8 / z, f * 1.6 / z
            x1 = np.clip(u - w2 / 2, 0, im_w - 10)
            y1 = np.clip(v - h2, 0, im_h - 10)
            x2, y2 = min(x1 + w2, im_w - 1), min(y1 + h2, im_h - 1)
            img[int(y1):int(y2) + 1, int(x1):int(x2) + 1] = \
                rng.integers(170, 255, 3)
            lines.append(f"Car 0.0 0 {alpha:.3f} {x1:.2f} {y1:.2f} "
                         f"{x2:.2f} {y2:.2f} "
                         f"1.5 1.6 3.9 {x:.2f} 1.65 {z:.2f} {ry:.3f}")
        Image.fromarray(img).save(
            os.path.join(root, split, "image_2", iid + ".png"))
        with open(os.path.join(root, split, "calib", iid + ".txt"),
                  "w") as fh:
            fh.write(f"P2: {f} 0.0 {cu} 0.0 0.0 {f} {cv} 0.0 "
                     "0.0 0.0 1.0 0.0\n")
        with open(os.path.join(root, split, "label_2", iid + ".txt"),
                  "w") as fh:
            fh.write("\n".join(lines) + "\n")


def _read_rows(path):
    rows = []
    with open(path) as f:
        for ln in f.read().splitlines():
            p = ln.split()
            rows.append((p[0], np.array([float(v) for v in p[1:]])))
    return rows


@pytest.mark.slow
def test_tester_single_program_matches_grouped(tmp_path):
    """End-to-end ``test_kitti_3d``: eval_single_program=True must write
    (near-)identical KITTI txt to the per-size grouped mode on a val split
    with two image sizes.

    Full-buffer images go through a bit-identical identity resample, so
    their rows must match tightly; smaller images take the dynamic-scale
    resample (<=0.5 px sampling shift vs the static path) so their rows are
    matched by box proximity."""
    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.imdb import build_imdb
    from groomed_nms_tpu.data.pipeline import prepare_anchors
    from groomed_nms_tpu.eval.tester import test_kitti_3d
    from groomed_nms_tpu.models import RPN3D
    from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                          create_train_state)

    cfg = load_config("tiny_synthetic")  # crop (96, 320)
    # two sizes: (96, 320) is the full buffer (identity resample); (72, 240)
    # upscales by 4/3 (240 * 4/3 = 320 exactly, so no round(w*s) divergence)
    specs = [(96, 320), (72, 240), (96, 320), (72, 240)]
    root = str(tmp_path / "kitti")
    _make_mixed_tree(root, "validation", specs)
    imdb = build_imdb(root, "validation", use_3d_for_2d=cfg.use_3d_for_2d,
                      cache_file=None)

    anchors, means, stds = prepare_anchors(cfg, imdb)
    feat_hw = (cfg.crop_size[0] // cfg.feat_stride,
               cfg.crop_size[1] // cfg.feat_stride)
    rois = np.asarray(locate_anchors(anchors, feat_hw, cfg.feat_stride))
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]
    model = RPN3D(cfg.rpn_config(anchors.shape[0]))
    tx = build_optimizer(cfg.solver_type,
                         build_lr_schedule(cfg.lr, cfg.max_iter))
    state = create_train_state(model, (1, 64, 64, 3), tx)

    outs = {}
    for single in (False, True):
        rdir = str(tmp_path / ("single" if single else "grouped"))
        c = dataclasses.replace(cfg, eval_single_program=single)
        test_kitti_3d(c, model, state.params, state.batch_stats, rois,
                      rois_3d, means, stds, imdb, rdir, gt_dir=None,
                      batch_size=2, skip_eval=True)
        outs[single] = {
            rec.id: _read_rows(os.path.join(rdir, "data", rec.id + ".txt"))
            for rec in imdb}

    for i, (h, w) in enumerate(specs):
        a, b = outs[False][f"{i:06d}"], outs[True][f"{i:06d}"]
        if (h, w) == (96, 320):
            # identity resample in both modes: rows match to txt precision
            assert len(a) == len(b)
            for (cls_a, va), (cls_b, vb) in zip(a, b):
                assert cls_a == cls_b
                np.testing.assert_allclose(vb, va, atol=1e-3)
        else:
            # dynamic resample: sub-pixel input shift; match by 2D box
            assert abs(len(a) - len(b)) <= 2
            assert a and b
            boxes_a = np.stack([v[3:7] for _, v in a])
            n_match = 0
            for _, vb in b:
                d = np.abs(boxes_a - vb[3:7]).max(axis=1)
                if d.min() < 3.0:
                    n_match += 1
            assert n_match >= max(1, len(b) // 2)
