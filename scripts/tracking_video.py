"""Demo-video generation on KITTI tracking sequences.

Capability match for the reference's scripts/tracking_video.py: run the
video model frame by frame over a raw sequence, draw 2D/3D boxes + BEV with
per-track speed (MPH from the Kalman velocity state, reference
tracking_video.py:52), and stitch the rendered frames into a video.

Usage:
  python scripts/tracking_video.py --config kitti_3d_full \
      --sequence <dir with image_2/*.png + calib.txt> [--out demo.mp4]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

MS_TO_MPH = 2.23694
KITTI_FPS = 10.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--sequence", required=True)
    ap.add_argument("--out", default="tracking_demo.mp4")
    ap.add_argument("--output", default="output",
                    help="experiment output root (anchors.npz + weights)")
    ap.add_argument("--restore", type=int, default=None)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    from groomed_nms_tpu.platform import ensure_requested_platform
    ensure_requested_platform()  # honour JAX_PLATFORMS=cpu despite plugins

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.augment import preprocess_images
    from groomed_nms_tpu.data.kitti import read_kitti_calib
    from groomed_nms_tpu.data.pipeline import prepare_anchors
    from groomed_nms_tpu.models.kalman import Tracks, track_step
    from groomed_nms_tpu.models.video import (VideoConfig, VideoRPN3D,
                                              extract_measurements)
    from groomed_nms_tpu.utils.vis import draw_2d_box, draw_3d_box, draw_bev

    logging.basicConfig(
        force=True, level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger(__name__)
    log.info("jax backend=%s devices=%d", jax.default_backend(),
             jax.local_device_count())
    cfg = load_config(args.config)

    image_dir = os.path.join(args.sequence, "image_2")
    frames = sorted(os.listdir(image_dir))
    if args.limit:
        frames = frames[:args.limit]
    p2 = read_kitti_calib(os.path.join(args.sequence, "calib.txt"))

    out_dir = os.path.join(args.output, cfg.name)
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
    # shared loading rule (utils/torch_weights.py): trained weights when
    # available (video-stage checkpoint, else single-frame + pose branch);
    # random init keeps the demo runnable without a training run
    from groomed_nms_tpu.utils.torch_weights import load_video_variables
    variables, _, _, _ = load_video_variables(
        model, cfg, out_dir, args.restore, log)

    means_img = jnp.asarray(cfg.image_means)
    stds_img = jnp.asarray(cfg.image_stds)
    p2j = jnp.asarray(p2, jnp.float32)

    @jax.jit
    def detect(images, scale):
        out = model.apply(variables, images[None, None], train=False)
        meas, valid = extract_measurements(
            out.frame_outputs, jnp.asarray(rois), jnp.asarray(rois_3d),
            p2j[None], jnp.full((1,), scale),
            means.astype(np.float32), stds.astype(np.float32), vcfg)
        return meas[0], valid[0]

    # same association knobs as test_kalman.py's evaluated tracker, so the
    # rendered demo and the scored tracker agree for a given config
    step_jit = jax.jit(lambda t, m, v: track_step(
        t, m, v, jnp.zeros(6), p2j, best_thresh=vcfg.best_thresh,
        apply_pose=False, match_dist=vcfg.match_dist))

    tracks = Tracks.empty(vcfg.max_tracks)
    render_dir = os.path.splitext(args.out)[0] + "_frames"
    os.makedirs(render_dir, exist_ok=True)

    for fi, name in enumerate(frames):
        with Image.open(os.path.join(image_dir, name)) as im:
            img = np.asarray(im.convert("RGB"), np.uint8)
        scale = cfg.crop_size[0] / img.shape[0]
        proc = preprocess_images(
            jnp.asarray(img[None]), jnp.zeros((1,), bool), means_img,
            stds_img, target_h=cfg.crop_size[0], crop_w=cfg.crop_size[1])[0]
        meas, mvalid = detect(proc, scale)
        tracks = step_jit(tracks, meas, mvalid)

        fig, (ax_im, ax_bev) = plt.subplots(
            2, 1, figsize=(12, 9), gridspec_kw={"height_ratios": [1, 1.4]})
        ax_im.imshow(img)
        valid = np.asarray(tracks.valid)
        xs = np.asarray(tracks.X)
        box2d = np.asarray(tracks.box2d)
        for ti in np.flatnonzero(valid):
            mph = abs(xs[ti, 8]) * KITTI_FPS * MS_TO_MPH
            # box2d is already in original-image pixels (the measurement
            # decode descales by /scale; the 3D overlay below uses the
            # original-resolution P2 for the same reason)
            draw_2d_box(ax_im, box2d[ti, :4],
                        text=f"id{int(tracks.ids[ti])} {mph:.0f}mph")
            draw_3d_box(ax_im, p2, xs[ti, 0], xs[ti, 1], xs[ti, 2],
                        xs[ti, 3], xs[ti, 4], xs[ti, 5], xs[ti, 6])
        ax_im.set_axis_off()
        dets17 = np.zeros((len(xs), 17))
        dets17[:, 13], dets17[:, 15] = xs[:, 0], xs[:, 2]
        dets17[:, 9], dets17[:, 11], dets17[:, 16] = \
            xs[:, 3], xs[:, 5], xs[:, 6]
        draw_bev(ax_bev, dets17, valid)
        fig.tight_layout()
        fig.savefig(os.path.join(render_dir, f"{fi:06d}.png"), dpi=90)
        plt.close(fig)
        if (fi + 1) % 20 == 0:
            log.info("rendered %d/%d", fi + 1, len(frames))

    # stitch with ffmpeg when available, else leave the frame directory
    # (argument list, not a shell string: paths may contain spaces)
    import subprocess
    try:
        rc = subprocess.run(
            ["ffmpeg", "-y", "-loglevel", "error", "-framerate", "10",
             "-i", os.path.join(render_dir, "%06d.png"),
             "-pix_fmt", "yuv420p", args.out]).returncode
    except FileNotFoundError:
        rc = 127
    log.info("frames in %s%s", render_dir,
             f", video at {args.out}" if rc == 0 else " (ffmpeg unavailable)")


if __name__ == "__main__":
    main()
