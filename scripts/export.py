"""Export a trained model as a single AOT serving artifact.

Usage:
  python scripts/export.py --config groomed_nms [--restore N] \
      [--batch 8] [--src-h 375] [--src-w 1242] [--out model.ghlo] \
      [--platforms tpu,cpu] [--verify]

Stages the full serving pipeline (uint8 preprocess -> bf16 trunk -> decode
-> NMS -> top-k) out with jax.export, baking weights/anchors/statistics in
as constants, and writes one serialized StableHLO artifact plus a small
meta json.  ``--verify`` deserializes the artifact and checks it reproduces
the live pipeline on random input.  (Beyond-parity serving feature; the
reference has no deployment path beyond the python tree + torch pickles.)
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--output", default="output")
    ap.add_argument("--restore", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--src-h", type=int, default=375)
    ap.add_argument("--src-w", type=int, default=1242)
    ap.add_argument("--out", default=None,
                    help="artifact path (default <out_dir>/model.ghlo)")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu,cpu (default: current backend)")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--video", action="store_true",
                    help="export the video/kalman model instead "
                         "(clip-in/Tracks-out; --frames sets clip length)")
    ap.add_argument("--frames", type=int, default=None,
                    help="video clip length (default cfg.video_count)")
    args = ap.parse_args()

    from groomed_nms_tpu.platform import ensure_requested_platform
    ensure_requested_platform()

    import jax
    import numpy as np

    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.pipeline import prepare_anchors
    from groomed_nms_tpu.export import (build_serving_fn,
                                        build_video_serving_fn,
                                        export_serving, export_video_serving,
                                        load_serving)
    from groomed_nms_tpu.models import RPN3D
    from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                          create_train_state,
                                          restore_checkpoint)

    logging.basicConfig(
        force=True, level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger(__name__)
    log.info("jax backend=%s", jax.default_backend())

    cfg = load_config(args.config)
    out_dir = os.path.join(args.output, cfg.name)
    # anchors/stats must come from the training run (or its copy_stats
    # pretrained source); prepare_anchors raises rather than fabricating
    # zero priors from the empty imdb
    from groomed_nms_tpu.data.pipeline import resolve_stats_dir
    anchors, means, stds = prepare_anchors(
        cfg, [], cache_dir=resolve_stats_dir(cfg, out_dir))
    feat_hw = (cfg.crop_size[0] // cfg.feat_stride,
               cfg.crop_size[1] // cfg.feat_stride)
    rois = np.asarray(locate_anchors(anchors, feat_hw, cfg.feat_stride))
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]

    tx = build_optimizer(cfg.solver_type,
                         build_lr_schedule(cfg.lr, cfg.max_iter))
    platforms = args.platforms.split(",") if args.platforms else None
    bf16_input = cfg.compute_dtype == "bfloat16"

    if args.video:
        # shared loading rule with scripts/test_kalman.py: a video-stage
        # checkpoint restores the full VideoRPN3D; otherwise assemble
        # trunk/heads from the single-frame checkpoint + the train_pose.py
        # pose branch (warns on random init -- never a silent untrained
        # artifact)
        from groomed_nms_tpu.models.video import VideoConfig, VideoRPN3D
        from groomed_nms_tpu.utils.torch_weights import load_video_variables

        vcfg = VideoConfig(rpn=cfg.rpn_config(anchors.shape[0]),
                           score_thres=cfg.score_thres,
                           nms_thres=cfg.nms_thres,
                           best_thresh=cfg.best_thresh)
        model = VideoRPN3D(vcfg)
        n_frames = args.frames or max(2, cfg.video_count)
        variables, pose_means, pose_stds, step = load_video_variables(
            model, cfg, out_dir, args.restore, log)
        log.info("video model ready (iter %d, %d frames)", step, n_frames)

        serve = build_video_serving_fn(
            model, variables, rois, rois_3d, means, stds,
            np.asarray(cfg.image_means), np.asarray(cfg.image_stds), vcfg,
            pose_means, pose_stds, target_h=cfg.crop_size[0],
            crop_w=cfg.crop_size[1], bf16_input=bf16_input)
        blob = export_video_serving(serve, n_frames=n_frames,
                                    src_h=args.src_h, src_w=args.src_w,
                                    platforms=platforms)
        out_path = args.out or os.path.join(out_dir, "video_model.ghlo")
        meta_io = {
            "inputs": "clip_u8 [F,H0,W0,3] u8; p2 [4,4] f32; "
                      "p2_inv [4,4] f32; scale [F] f32",
            "outputs": "Tracks pytree (fixed-slot kalman state + validity)",
            "frames": n_frames,
        }
    else:
        model = RPN3D(cfg.rpn_config(anchors.shape[0]))
        state = create_train_state(model, (1, 64, 64, 3), tx)
        state = restore_checkpoint(out_dir, state, args.restore,
                                   restore_optimizer=False)
        step = int(state.step)
        log.info("restored iter %d", step)

        serve = build_serving_fn(
            model, {"params": state.params, "batch_stats": state.batch_stats},
            rois, rois_3d, means, stds, np.asarray(cfg.image_means),
            np.asarray(cfg.image_stds), cfg.detect_config(),
            target_h=cfg.crop_size[0], crop_w=cfg.crop_size[1],
            bf16_input=bf16_input)
        blob = export_serving(serve, batch=args.batch, src_h=args.src_h,
                              src_w=args.src_w, platforms=platforms)
        out_path = args.out or os.path.join(out_dir, "model.ghlo")
        meta_io = {
            "inputs": "images_u8 [B,H0,W0,3] u8; p2 [B,4,4] f32; "
                      "p2_inv [B,4,4] f32; scale [B] f32",
            "outputs": "dets [B,topN_post,17] f32; valid [B,topN_post] bool",
            "batch": args.batch,
        }

    with open(out_path, "wb") as f:
        f.write(blob)
    meta = {
        "config": cfg.name, "iter": step,
        "src_hw": [args.src_h, args.src_w],
        "crop_size": list(cfg.crop_size),
        "class_names": list(cfg.lbls), "score_thres": cfg.score_thres,
        "platforms": platforms or [jax.default_backend()],
        "bytes": len(blob), **meta_io,
    }
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    log.info("wrote %s (%.1f MB)", out_path, len(blob) / 1e6)

    if args.verify:
        rs = np.random.default_rng(0)
        loaded = load_serving(open(out_path, "rb").read())
        # compare against the JITTED live pipeline: the artifact is a
        # compiled program, and eager dispatch legitimately differs in
        # f32 reduction order on TPU
        jserve = jax.jit(serve)
        if args.video:
            n_frames = meta["frames"]
            clip = rs.integers(0, 256, (n_frames, args.src_h, args.src_w, 3),
                               dtype=np.uint8)
            p2 = np.eye(4, dtype=np.float32)
            p2[0, 0] = p2[1, 1] = 707.0
            p2[0, 2], p2[1, 2] = 604.0, 180.0
            p2_inv = np.linalg.inv(p2)
            scale = np.full((n_frames,), cfg.crop_size[0] / args.src_h,
                            np.float32)
            want = jax.block_until_ready(jserve(clip, p2, p2_inv, scale))
            got = jax.block_until_ready(loaded(clip, p2, p2_inv, scale))
            for name, g, w in zip(want._fields, got, want):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           atol=1e-4, err_msg=name)
            log.info("verify OK: video artifact reproduces the live "
                     "pipeline (%d tracks)", int(np.sum(want.valid)))
        else:
            imgs = rs.integers(0, 256,
                               (args.batch, args.src_h, args.src_w, 3),
                               dtype=np.uint8)
            p2 = np.tile(np.eye(4, dtype=np.float32)[None],
                         (args.batch, 1, 1))
            p2[:, 0, 0] = p2[:, 1, 1] = 707.0
            p2[:, 0, 2], p2[:, 1, 2] = 604.0, 180.0
            p2_inv = np.linalg.inv(p2)
            scale = np.full((args.batch,),
                            cfg.crop_size[0] / args.src_h, np.float32)
            want_d, want_v = jax.block_until_ready(
                jserve(imgs, p2, p2_inv, scale))
            got_d, got_v = jax.block_until_ready(
                loaded(imgs, p2, p2_inv, scale))
            np.testing.assert_array_equal(np.asarray(got_v),
                                          np.asarray(want_v))
            np.testing.assert_allclose(np.asarray(got_d),
                                       np.asarray(want_d), atol=1e-4)
            log.info("verify OK: artifact reproduces the live pipeline "
                     "(%d valid dets on random input)", int(np.sum(want_v)))


if __name__ == "__main__":
    main()
