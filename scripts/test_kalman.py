"""Evaluate the video model: per-frame detections + Kalman smoothing.

Capability match for the reference's scripts/test_kalman.py: extract boxes
per frame, run the tracker over the clip (forward_boxes), write the final
frame's smoothed detections in KITTI format, evaluate.

Usage:
  python scripts/test_kalman.py --config kitti_3d_full [--data-root data] \
      [--output output] [--limit N]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--output", default="output")
    ap.add_argument("--restore", type=int, default=None)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    from groomed_nms_tpu.platform import (enable_compilation_cache,
                                          ensure_requested_platform)
    ensure_requested_platform()  # honour JAX_PLATFORMS=cpu despite plugins
    enable_compilation_cache()   # reuse compiled programs across runs

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.augment import preprocess_images
    from groomed_nms_tpu.data.pipeline import prepare_anchors
    from groomed_nms_tpu.data.tracking import build_tracking_imdb
    from groomed_nms_tpu.eval import evaluate_kitti_results_verbose
    from groomed_nms_tpu.models.video import (VideoConfig, VideoRPN3D,
                                              extract_measurements,
                                              video_track)
    from groomed_nms_tpu.inference import write_kitti_tracks

    cfg = load_config(args.config)
    out_dir = os.path.join(args.output, cfg.name)
    results_dir = os.path.join(out_dir, "results", "results_kalman")
    os.makedirs(os.path.join(results_dir, "data"), exist_ok=True)
    logging.basicConfig(
        force=True, level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger(__name__)
    log.info("jax backend=%s devices=%d", jax.default_backend(),
             jax.local_device_count())

    root = os.path.join(args.data_root, cfg.dataset_test)
    imdb = build_tracking_imdb(root, "validation",
                               use_3d_for_2d=cfg.use_3d_for_2d,
                               im_ext=cfg.im_ext)
    if args.limit:
        imdb = imdb[:args.limit]

    from groomed_nms_tpu.data.pipeline import resolve_stats_dir
    anchors, means, stds = prepare_anchors(
        cfg, [], cache_dir=resolve_stats_dir(cfg, out_dir))
    feat_hw = (cfg.crop_size[0] // cfg.feat_stride,
               cfg.crop_size[1] // cfg.feat_stride)
    rois = np.asarray(locate_anchors(anchors, feat_hw, cfg.feat_stride))
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]

    vcfg = VideoConfig(rpn=cfg.rpn_config(anchors.shape[0]),
                       score_thres=cfg.score_thres, nms_thres=cfg.nms_thres,
                       best_thresh=cfg.best_thresh)
    model = VideoRPN3D(vcfg)
    # shared loading rule (utils/torch_weights.py): video-stage checkpoint
    # restores the full VideoRPN3D; otherwise RPN trunk/heads come from the
    # single-frame checkpoint + the scripts/train_pose.py pose branch
    from groomed_nms_tpu.utils.torch_weights import load_video_variables
    variables, pose_means, pose_stds, _ = load_video_variables(
        model, cfg, out_dir, args.restore, log)

    means_img = jnp.asarray(cfg.image_means)
    stds_img = jnp.asarray(cfg.image_stds)

    @jax.jit
    def run_clip(images, p2, scale):
        out = model.apply(variables, images[None], train=False)
        fo = out.frame_outputs
        f = images.shape[0]
        meas, valid = extract_measurements(
            fo, jnp.asarray(rois), jnp.asarray(rois_3d),
            jnp.tile(p2[None], (f, 1, 1)),
            jnp.full((f,), scale), means.astype(np.float32),
            stds.astype(np.float32), vcfg)
        poses_n = out.poses[0]
        poses_dn = poses_n * jnp.asarray(pose_stds) + jnp.asarray(pose_means)
        poses_dn = jnp.concatenate([jnp.zeros((1, 6)), poses_dn], axis=0)
        final, _ = video_track(meas, valid, poses_dn, p2, vcfg)
        return final

    n_done = 0
    for rec in imdb:
        frames = []
        # oldest -> newest (reference iterates reversed frame offsets)
        for path in reversed(rec.image_paths):
            if not os.path.exists(path):
                continue
            with Image.open(path) as im:
                frames.append(np.asarray(im.convert("RGB"), np.uint8))
        if not frames:
            continue
        stack = np.stack(frames)
        f, h0, w0, _ = stack.shape
        scale = cfg.crop_size[0] / h0
        flat = preprocess_images(
            jnp.asarray(stack), jnp.zeros((f,), bool), means_img, stds_img,
            target_h=cfg.crop_size[0], crop_w=cfg.crop_size[1])
        tracks = run_clip(flat, jnp.asarray(rec.p2, jnp.float32), scale)

        write_kitti_tracks(
            os.path.join(results_dir, "data", rec.id + ".txt"), tracks,
            score_thres=cfg.score_thres)
        n_done += 1
        if n_done % 200 == 0:
            log.info("tracked %d/%d", n_done, len(imdb))

    gt_dir = os.path.join(root, "validation", "label_2")
    if os.path.isdir(gt_dir):
        evaluate_kitti_results_verbose(results_dir, gt_dir, fast_eval=True,
                                       log_fn=log.info)


if __name__ == "__main__":
    main()
