"""Batched KITTI val inference + evaluation, callable from any entry point.

Capability match for the reference's ``test_kitti_3d_old``
(lib/rpn_util.py:1052-1356): run the model over the val split, write
KITTI-format txt detections, run the C++ evaluator. Used both by
scripts/test.py and by scripts/train.py at snapshot time (the reference
evaluates at every snapshot, scripts/train_rpn_3d.py:162-189).

TPU-first divergences from the reference loop: images of identical size are
grouped into fixed-shape device batches (one XLA program per size instead of
per-image host round trips), host JPEG/PNG decode runs in a thread pool, and
device transfers are prefetched so IO hides behind compute.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from collections import defaultdict

import numpy as np


def _make_infer(model, dcfg, target_h, crop_w, bf16_input=False,
                dynamic=False):
    """Jitted preprocess+forward+detect, cached per (model, cfg, size).

    ``model`` (a frozen flax dataclass) and the detect config are hashable,
    so repeated ``test_kitti_3d`` calls -- e.g. snapshot-time eval at every
    ``snapshot_iter`` -- reuse the compiled graph instead of paying the
    multi-minute remote recompile per call (CLAUDE.md: one jitted graph per
    benchmark).

    ``dynamic=True`` takes edge-padded buffers + per-image true sizes and
    resamples each by its own scale (one program for every val size)."""
    import jax
    import jax.numpy as jnp

    from ..data.augment import preprocess_images, preprocess_images_dynamic
    from ..inference import im_detect_3d, rpn_outputs_dict

    @jax.jit
    def infer(variables, images_u8, src_hw, means_img, stds_img, rois,
              rois_3d, p2, p2_inv, scale, bbox_means, bbox_stds):
        out_dtype = jnp.bfloat16 if bf16_input else None
        if dynamic:
            images = preprocess_images_dynamic(
                images_u8, src_hw, means_img, stds_img, target_h=target_h,
                crop_w=crop_w, out_dtype=out_dtype)
        else:
            images = preprocess_images(
                images_u8, jnp.zeros((images_u8.shape[0],), bool),
                means_img, stds_img, target_h=target_h, crop_w=crop_w,
                out_dtype=out_dtype)
        out = model.apply(variables, images, train=False)
        return im_detect_3d(rpn_outputs_dict(out), rois, rois_3d, p2,
                            p2_inv, scale, bbox_means, bbox_stds, dcfg)

    return infer


@functools.lru_cache(maxsize=4)
def _cached_infer(model, dcfg, target_h, crop_w, bf16_input=False,
                  dynamic=False):
    return _make_infer(model, dcfg, target_h, crop_w, bf16_input, dynamic)


def test_kitti_3d(cfg, model, params, batch_stats, rois, rois_3d, bbox_means,
                  bbox_stds, imdb, results_dir, gt_dir=None, batch_size=None,
                  log_fn=None, skip_eval=False, render=0, refine=False,
                  raw_cache_dir=None):
    """Run inference over ``imdb`` into ``results_dir``; evaluate if
    ``gt_dir`` exists.

    Returns the evaluator's AP dict (see ``evaluate_kitti_results_verbose``)
    or None when evaluation was skipped. ``render`` > 0 saves qualitative
    image+BEV figures for the first N val images (reference
    test_rpn_3d.py:200-290) under ``results_dir``/vis.  ``refine`` runs the
    batched z/ry projection-consistency hill-climb on the final detections
    (see :func:`~groomed_nms_tpu.inference.refine_detections`).  With
    ``raw_cache_dir``, decoded images mmap-cache as ``<id>.npy`` there
    (``data.pipeline.load_image_cached``) -- repeated evals (snapshot-time
    do_test) stop re-decoding the whole val split.
    """
    import jax
    import jax.numpy as jnp

    from ..data.pipeline import device_prefetch, load_image_cached
    from ..inference import (clip_detections, refine_detections,
                             write_kitti_detections)
    from ..parallel import batch_sharding, create_mesh
    from .kitti_eval import evaluate_kitti_results_verbose

    log_fn = log_fn or logging.getLogger(__name__).info
    batch_size = batch_size or cfg.test_batch_size
    os.makedirs(os.path.join(results_dir, "data"), exist_ok=True)
    if raw_cache_dir:
        os.makedirs(raw_cache_dir, exist_ok=True)

    variables = {"params": params, "batch_stats": batch_stats}
    dcfg = cfg.detect_config()
    means_img = jnp.asarray(cfg.image_means)
    stds_img = jnp.asarray(cfg.image_stds)
    rois_j, rois_3d_j = jnp.asarray(rois), jnp.asarray(rois_3d)
    bbox_means_j = jnp.asarray(np.asarray(bbox_means, np.float32))
    bbox_stds_j = jnp.asarray(np.asarray(bbox_stds, np.float32))

    # multi-chip: shard the image batch over the mesh data axis; XLA
    # replicates the params and keeps each image's pipeline chip-local
    n_dev = len(jax.devices())
    mesh = create_mesh() if n_dev > 1 else None
    if mesh is not None and batch_size % n_dev != 0:
        batch_size = max(n_dev, (batch_size // n_dev) * n_dev)
        log_fn(f"batch rounded to {batch_size} for {n_dev} devices")

    # bf16 trunks take their (pre-retile) input in bf16: halves the HBM
    # traffic of the 3-channel-minor layout copy (docs/BENCHMARKS.md r3)
    single = bool(getattr(cfg, "eval_single_program", False))
    _infer = _cached_infer(model, dcfg, cfg.crop_size[0], cfg.crop_size[1],
                           bf16_input=cfg.compute_dtype == "bfloat16",
                           dynamic=single)

    def infer(images_u8, src_hw, p2, p2_inv, scale):
        return _infer(variables, images_u8, src_hw, means_img, stds_img,
                      rois_j, rois_3d_j, p2, p2_inv, scale, bbox_means_j,
                      bbox_stds_j)

    # group same-sized images into device batches (one compile per size) --
    # or, with eval_single_program, ONE max-size group whose per-image
    # dynamic-scale resample covers every size in a single program;
    # decode images in a thread pool so host IO hides behind device compute
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from ..data.augment import pad_image_edge
    by_size = defaultdict(list)
    if single and imdb:
        h0max = max(r.im_h for r in imdb)
        w0max = max(r.im_w for r in imdb)
        by_size[(h0max, w0max)] = list(imdb)
    else:
        for rec in imdb:
            by_size[(rec.im_h, rec.im_w)].append(rec)

    def load_chunk(chunk, h0, w0):
        imgs = np.zeros((batch_size, h0, w0, 3), np.uint8)
        hw = np.tile(np.array([[h0, w0]], np.float32), (batch_size, 1))
        p2 = np.tile(np.eye(4, dtype=np.float32)[None], (batch_size, 1, 1))

        def read(bi_rec):
            bi, rec = bi_rec
            arr = load_image_cached(rec.image_path, rec.id, raw_cache_dir)
            if arr.shape[:2] == (h0, w0):
                imgs[bi] = arr
            elif single and arr.shape[0] <= h0 and arr.shape[1] <= w0:
                # single-program mode: smaller-than-plane stragglers are
                # edge-padded; the dynamic resample masks to hw[bi] and
                # scale uses the true height, so this is exact
                imgs[bi] = pad_image_edge(arr, h0, w0)
            else:
                # static mode resizes the whole plane by crop/h0 while
                # scale would use the true height -- silently wrong boxes;
                # oversized images cannot fit the plane in either mode
                raise ValueError(
                    f"{rec.image_path}: decoded size {arr.shape[:2]} does "
                    f"not match the imdb metadata ({rec.im_h}, {rec.im_w})"
                    f" / batch plane ({h0}, {w0}) -- stale imdb cache? "
                    "Rebuild it or use eval_single_program for mixed sizes")
            hw[bi] = arr.shape[:2]
            p2[bi] = rec.p2

        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(read, enumerate(chunk)))
        return imgs, hw, p2

    def chunk_iter():
        for (h0, w0), recs in by_size.items():
            for i in range(0, len(recs), batch_size):
                chunk = recs[i:i + batch_size]
                imgs, hw, p2 = load_chunk(chunk, h0, w0)
                scale = (cfg.crop_size[0] / hw[:, 0]).astype(np.float32)
                yield chunk, (jnp.asarray(imgs), jnp.asarray(hw),
                              jnp.asarray(p2),
                              jnp.asarray(np.linalg.inv(p2)),
                              jnp.asarray(scale))

    if mesh is not None:
        sharding = batch_sharding(mesh)
        put = lambda t: jax.device_put(t, sharding)
    else:
        put = jax.device_put

    t0 = time.time()
    n_done = 0
    n_rendered = 0

    def flush(chunk, dets, valid):
        nonlocal n_done, n_rendered
        dets = np.asarray(dets)
        valid = np.asarray(valid)
        n = len(chunk)
        for bi, rec in enumerate(chunk):
            d = dets[bi]
            if cfg.clip_boxes:
                d = clip_detections(d, rec.im_w, rec.im_h)
            write_kitti_detections(
                os.path.join(results_dir, "data", rec.id + ".txt"),
                d, valid[bi], list(cfg.lbls), score_thres=cfg.score_thres)
            if n_rendered < render:
                from ..utils.vis import render_detections
                vis_dir = os.path.join(results_dir, "vis")
                os.makedirs(vis_dir, exist_ok=True)
                with Image.open(rec.image_path) as im:
                    img = np.asarray(im.convert("RGB"), np.uint8)
                render_detections(
                    img, d, valid[bi], rec.p2, list(cfg.lbls),
                    score_thres=cfg.score_thres,
                    out_path=os.path.join(vis_dir, rec.id + ".png"))
                n_rendered += 1
        n_done += n
        if n_done % 500 < batch_size:
            dt = (time.time() - t0) / max(n_done, 1)
            log_fn(f"tested {n_done}/{len(imdb)}, "
                   f"{1.0 / max(dt, 1e-9):.1f} img/s")

    # keep a few batches in flight: converting a batch's detections to
    # numpy blocks on its result, so doing it immediately serialises
    # dispatch -> compute -> pull per batch (one round trip each on
    # remote-dispatch platforms). A 3-deep deque lets later dispatches
    # queue while earlier results stream back. (On the tunneled dev TPU a
    # 100-image eval is still dominated by the one-time compiled-graph
    # load, ~60 s even on a cache hit -- the deque matters for real-size
    # val sets where the loop rate, not the load, is the bill.)
    from collections import deque
    inflight = deque()
    for chunk, (imgs_d, hw_d, p2_d, p2i_d, scale_d) in device_prefetch(
            chunk_iter(),
            transform=lambda x: (x[0], tuple(put(t) for t in x[1]))):
        dets, valid = infer(imgs_d, hw_d, p2_d, p2i_d, scale_d)
        if refine:
            dets = refine_detections(dets, valid, p2_d, p2i_d)
        inflight.append((chunk, dets, valid))
        if len(inflight) > 3:
            flush(*inflight.popleft())
    while inflight:
        flush(*inflight.popleft())

    log_fn(f"inference done: {n_done / max(time.time() - t0, 1e-9):.1f} "
           "img/s end-to-end")
    if skip_eval or not gt_dir or not os.path.isdir(gt_dir):
        return None
    return evaluate_kitti_results_verbose(results_dir, gt_dir,
                                          fast_eval=cfg.fast_eval,
                                          log_fn=log_fn)
