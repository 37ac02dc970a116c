"""Serve a deployed AOT artifact over a directory of images -- NO model code.

Usage:
  python scripts/serve.py --artifact model.ghlo --images <dir> \
      [--calib <dir>] [--out results/data] [--score-thres T]

Loads the serialized StableHLO artifact written by scripts/export.py (plus
its sibling meta json), batches the images, runs the artifact, and writes
KITTI-format txt detections.  The only imports from this package are the
artifact loader and the txt writers -- the model/config/anchor code paths
are not touched, demonstrating that the artifact is a self-contained
deployment unit (weights, anchors, statistics and the full preprocess ->
trunk -> decode -> NMS program are baked in).

A video artifact (scripts/export.py --video; meta json carries "frames")
is served over the SAME image directory treated as one ordered sequence:
for every frame a clip of the trailing F frames (oldest repeated at the
start of the sequence, the reference's no-history convention) runs through
the clip-in/tracks-out program and the frame's smoothed tracks are written
-- the deployment form of scripts/test_kalman.py's eval loop.
"""

import argparse
import glob
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def _default_p2(src_h, src_w):
    import numpy as np
    p2 = np.eye(4, dtype=np.float32)
    p2[0, 0] = p2[1, 1] = 707.0493
    p2[0, 2], p2[1, 2] = src_w / 2.0, src_h / 2.0
    return p2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--images", required=True)
    ap.add_argument("--calib", default=None,
                    help="dir of KITTI calib txts named like the images")
    ap.add_argument("--out", default="serve_out")
    ap.add_argument("--score-thres", type=float, default=None)
    args = ap.parse_args()

    from groomed_nms_tpu.platform import ensure_requested_platform
    ensure_requested_platform()

    import numpy as np
    from PIL import Image

    from groomed_nms_tpu.data.augment import fit_image_to_plane
    from groomed_nms_tpu.data.kitti import read_kitti_calib
    from groomed_nms_tpu.export import load_serving
    from groomed_nms_tpu.inference import (write_kitti_detections,
                                           write_kitti_tracks)

    logging.basicConfig(
        force=True, level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger(__name__)

    with open(args.artifact + ".json") as f:
        meta = json.load(f)
    src_h, src_w = meta["src_hw"]
    crop_h = meta["crop_size"][0]
    class_names = meta.get("class_names", ["Car", "Pedestrian", "Cyclist"])
    score_thres = (args.score_thres if args.score_thres is not None
                   else meta.get("score_thres", 0.6))
    loaded = load_serving(open(args.artifact, "rb").read())

    paths = sorted(p for ext in ("png", "jpg", "jpeg")
                   for p in glob.glob(os.path.join(args.images, f"*.{ext}")))
    if not paths:
        raise FileNotFoundError(f"no images under {args.images}")
    os.makedirs(args.out, exist_ok=True)

    def load_frame(path):
        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.uint8)
        # fit into the artifact's fixed input plane: oversized images are
        # host-downscaled (ratio r), smaller ones edge-padded.  The staged
        # program's preprocess resizes the WHOLE plane by the static
        # factor crop_h/src_h (it cannot see the true extent), so the
        # network->original mapping the decode divides by is
        # (crop_h/src_h) * r -- NOT crop_h/true_h, which would shift
        # every box for any image smaller than the plane.
        fitted, r = fit_image_to_plane(arr, src_h, src_w)
        return fitted, float(crop_h) / src_h * r

    def calib_for(path):
        if args.calib:
            stem = os.path.splitext(os.path.basename(path))[0]
            cal = os.path.join(args.calib, stem + ".txt")
            if os.path.exists(cal):
                return read_kitti_calib(cal)
        return _default_p2(src_h, src_w)

    if "frames" in meta:  # video artifact: clip in, tracks out
        n_frames = meta["frames"]
        log.info("video artifact %s: frames=%d src=%dx%d",
                 args.artifact, n_frames, src_h, src_w)
        # each source frame appears in up to n_frames consecutive windows;
        # memoize the trailing window's decodes instead of re-reading and
        # re-fitting from disk every output frame
        frame_cache = {}

        def cached_frame(path):
            if path not in frame_cache:
                frame_cache[path] = load_frame(path)
                while len(frame_cache) > n_frames + 1:
                    frame_cache.pop(next(iter(frame_cache)))
            return frame_cache[path]

        for i, path in enumerate(paths):
            window = paths[max(0, i - n_frames + 1):i + 1]
            window = [window[0]] * (n_frames - len(window)) + window
            frames, scales = zip(*(cached_frame(p) for p in window))
            p2 = calib_for(path)
            # per-frame scales: history frames may have been host-fitted
            # at a different ratio (mixed-size inputs)
            tracks = loaded(np.stack(frames), p2,
                            np.linalg.inv(p2).astype(np.float32),
                            np.asarray(scales, np.float32))
            stem = os.path.splitext(os.path.basename(path))[0]
            write_kitti_tracks(
                os.path.join(args.out, stem + ".txt"),
                tracks, score_thres=score_thres,
                class_name=class_names[0])
        log.info("wrote %d track files to %s", len(paths), args.out)
        return

    batch = meta["batch"]
    log.info("artifact %s: batch=%d src=%dx%d classes=%s",
             args.artifact, batch, src_h, src_w, class_names)

    n_done = 0
    for i in range(0, len(paths), batch):
        chunk = paths[i:i + batch]
        imgs = np.zeros((batch, src_h, src_w, 3), np.uint8)
        p2 = np.tile(_default_p2(src_h, src_w)[None], (batch, 1, 1))
        scale = np.full((batch,), float(crop_h) / src_h, np.float32)
        for bi, path in enumerate(chunk):
            imgs[bi], scale[bi] = load_frame(path)
            p2[bi] = calib_for(path)
        p2_inv = np.linalg.inv(p2)

        dets, valid = loaded(imgs, p2, p2_inv, scale)
        dets, valid = np.asarray(dets), np.asarray(valid)
        for bi, path in enumerate(chunk):
            stem = os.path.splitext(os.path.basename(path))[0]
            write_kitti_detections(
                os.path.join(args.out, stem + ".txt"), dets[bi], valid[bi],
                class_names, score_thres=score_thres)
            n_done += 1
    log.info("wrote %d result files to %s", n_done, args.out)


if __name__ == "__main__":
    main()
