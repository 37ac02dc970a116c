"""Evaluate a trained model on KITTI val -- test_rpn_3d.py equivalent.

Usage:
  python scripts/test.py --config groomed_nms [--restore N] \
      [--data-root data] [--output output] [--batch 8]

Batched device inference (the reference runs batch 1 with host round
trips; here images of identical size are grouped into device batches),
KITTI txt writing, then the parameterized C++ evaluator.
"""

import argparse
import logging
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--output", default="output")
    ap.add_argument("--restore", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--split", default="validation")
    ap.add_argument("--limit", type=int, default=None)
    # embarrassingly-parallel eval fan-out: shard the val images across
    # processes/hosts, gather txt files, run the evaluator once on shard 0
    # (SURVEY.md section 2.10's multi-host eval design)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--shard-index", type=int, default=0)
    ap.add_argument("--skip-eval", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.augment import preprocess_images
    from groomed_nms_tpu.data.imdb import build_imdb
    from groomed_nms_tpu.data.pipeline import prepare_anchors
    from groomed_nms_tpu.eval import evaluate_kitti_results_verbose
    from groomed_nms_tpu.inference import (decode_detections, nms_and_topk,
                                           write_kitti_detections)
    from groomed_nms_tpu.models import RPN3D
    from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                          create_train_state,
                                          restore_checkpoint)

    cfg = load_config(args.config)
    batch_size = args.batch or cfg.test_batch_size
    out_dir = os.path.join(args.output, cfg.name)
    results_dir = os.path.join(out_dir, "results",
                               f"results_{args.restore or 'latest'}")
    os.makedirs(os.path.join(results_dir, "data"), exist_ok=True)
    logging.basicConfig(
        force=True, level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger(__name__)

    root = os.path.join(args.data_root, cfg.dataset_test)
    imdb = build_imdb(root, args.split, use_3d_for_2d=cfg.use_3d_for_2d,
                      cache_file=None, im_ext=cfg.im_ext)
    if args.limit:
        imdb = imdb[:args.limit]
    if args.num_shards > 1:
        imdb = imdb[args.shard_index::args.num_shards]
    log.info("val imdb: %d images (shard %d/%d)", len(imdb),
             args.shard_index, args.num_shards)

    if not os.path.exists(os.path.join(out_dir, "anchors.npz")):
        raise FileNotFoundError(
            f"{out_dir}/anchors.npz missing -- run scripts/train.py first "
            "(anchor priors + bbox statistics are learned from the train set)")
    anchors, means, stds = prepare_anchors(cfg, [], cache_dir=out_dir)
    feat_hw = (cfg.crop_size[0] // cfg.feat_stride,
               cfg.crop_size[1] // cfg.feat_stride)
    rois = np.asarray(locate_anchors(anchors, feat_hw, cfg.feat_stride))
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]

    model = RPN3D(cfg.rpn_config(anchors.shape[0]))
    schedule = build_lr_schedule(cfg.lr, cfg.max_iter)
    tx = build_optimizer(cfg.solver_type, schedule)
    # tiny-size init: param shapes are H/W-free (skips a full-size compile)
    state = create_train_state(model, (1, 64, 64, 3), tx)
    state = restore_checkpoint(out_dir, state, args.restore,
                               restore_optimizer=False)
    log.info("restored iter %d", int(state.step))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dcfg = cfg.detect_config()
    means_img = jnp.asarray(cfg.image_means)
    stds_img = jnp.asarray(cfg.image_stds)
    rois_j, rois_3d_j = jnp.asarray(rois), jnp.asarray(rois_3d)

    # multi-chip: shard the image batch over the mesh data axis; XLA
    # replicates the params and keeps each image's pipeline chip-local
    from groomed_nms_tpu.parallel import batch_sharding, create_mesh
    n_dev = len(jax.devices())
    mesh = create_mesh() if n_dev > 1 else None
    if mesh is not None and batch_size % n_dev != 0:
        batch_size = max(n_dev, (batch_size // n_dev) * n_dev)
        log.info("batch rounded to %d for %d devices", batch_size, n_dev)

    @jax.jit
    def infer(images_u8, p2, p2_inv, scale):
        images = preprocess_images(
            images_u8, jnp.zeros((images_u8.shape[0],), bool), means_img,
            stds_img, target_h=cfg.crop_size[0], crop_w=cfg.crop_size[1])
        out = model.apply(variables, images, train=False)
        outputs = {"prob": out.prob, "bbox_2d": out.bbox_2d,
                   "bbox_3d": out.bbox_3d, "accept_prob": out.accept_prob,
                   "uncertainty": out.uncertainty}
        dets, scores = decode_detections(
            outputs, rois_j, rois_3d_j, p2, p2_inv, scale,
            jnp.asarray(means, jnp.float32), jnp.asarray(stds, jnp.float32),
            dcfg)
        return nms_and_topk(dets, scores, dcfg)

    # group same-sized images into device batches (one compile per size);
    # decode images in a thread pool and keep transfers in flight so the
    # host IO hides behind device compute
    from concurrent.futures import ThreadPoolExecutor
    from PIL import Image
    by_size = defaultdict(list)
    for rec in imdb:
        by_size[(rec.im_h, rec.im_w)].append(rec)

    def load_chunk(chunk, h0, w0):
        imgs = np.zeros((batch_size, h0, w0, 3), np.uint8)
        p2 = np.tile(np.eye(4, dtype=np.float32)[None], (batch_size, 1, 1))

        def read(bi_rec):
            bi, rec = bi_rec
            with Image.open(rec.image_path) as im:
                imgs[bi] = np.asarray(im.convert("RGB"), np.uint8)
            p2[bi] = rec.p2

        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(read, enumerate(chunk)))
        return imgs, p2

    def chunk_iter():
        for (h0, w0), recs in by_size.items():
            for i in range(0, len(recs), batch_size):
                chunk = recs[i:i + batch_size]
                imgs, p2 = load_chunk(chunk, h0, w0)
                scale = np.full((batch_size,), cfg.crop_size[0] / h0,
                                np.float32)
                yield chunk, (jnp.asarray(imgs), jnp.asarray(p2),
                              jnp.asarray(np.linalg.inv(p2)),
                              jnp.asarray(scale))

    if mesh is not None:
        sharding = batch_sharding(mesh)
        put = lambda t: jax.device_put(t, sharding)
    else:
        put = jax.device_put

    t0 = time.time()
    n_done = 0
    from groomed_nms_tpu.data.pipeline import device_prefetch
    for chunk, (imgs_d, p2_d, p2i_d, scale_d) in device_prefetch(
            chunk_iter(),
            transform=lambda x: (x[0], tuple(put(t) for t in x[1]))):
        n = len(chunk)
        dets, valid = infer(imgs_d, p2_d, p2i_d, scale_d)
        dets = np.asarray(dets)
        valid = np.asarray(valid)
        for bi, rec in enumerate(chunk):
            d = dets[bi]
            if cfg.clip_boxes:
                from groomed_nms_tpu.inference import clip_detections
                d = clip_detections(d, rec.im_w, rec.im_h)
            write_kitti_detections(
                os.path.join(results_dir, "data", rec.id + ".txt"),
                d, valid[bi], list(cfg.lbls),
                score_thres=cfg.score_thres)
        n_done += n
        if n_done % 500 < batch_size:
            dt = (time.time() - t0) / max(n_done, 1)
            log.info("tested %d/%d, %.1f img/s", n_done, len(imdb),
                     1.0 / max(dt, 1e-9))

    log.info("inference done: %.1f img/s end-to-end",
             n_done / (time.time() - t0))
    gt_dir = os.path.join(root, args.split, "label_2")
    if args.skip_eval or args.shard_index != 0:
        return
    if os.path.isdir(gt_dir):
        evaluate_kitti_results_verbose(results_dir, gt_dir,
                                       fast_eval=cfg.fast_eval,
                                       log_fn=log.info)


if __name__ == "__main__":
    main()
