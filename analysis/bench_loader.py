"""Loader-only throughput microbench (no device in the loop).

Measures the sustained host input-pipeline rate of ``TrainLoader`` -- PNG
decode fan-out + label sampling + GT padding -- in img/s, the number that
must comfortably exceed the device train-step rate (69.5 img/s at batch 8 on
v5e-1) for training to never be host-starved.  Role match: the reference
relies on torch DataLoader ``num_workers`` (lib/imdb_util.py:424-433) and
never measures it.

Usage:
  python analysis/bench_loader.py [--data-root data] [--config groomed_nms]
      [--batch-size 8] [--iters 40] [--workers 8] [--synthetic N]

With --synthetic N a real-resolution synthetic tree of N images is generated
into a temp dir first (no KITTI needed).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--config", default="groomed_nms")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate an N-image synthetic tree instead of "
                         "reading --data-root")
    ap.add_argument("--cache", action="store_true",
                    help="use the raw decoded-image cache (scripts/train.py "
                         "--cache-images path); first epoch populates it")
    args = ap.parse_args()
    if args.iters < 1:
        ap.error("--iters must be >= 1")

    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.imdb import build_imdb
    from groomed_nms_tpu.data.pipeline import TrainLoader

    cfg = load_config(args.config).replace(batch_size=args.batch_size)
    if args.synthetic:
        from groomed_nms_tpu.data.synthetic import make_synthetic_kitti
        tmp = tempfile.mkdtemp(prefix="bench_loader_")
        root = os.path.join(tmp, cfg.dataset_train)
        print(f"generating {args.synthetic} synthetic images...", flush=True)
        make_synthetic_kitti(root, "training", args.synthetic)
    else:
        root = os.path.join(args.data_root, cfg.dataset_train)
    imdb = build_imdb(root, "training", use_3d_for_2d=cfg.use_3d_for_2d,
                      cache_file=None, im_ext=cfg.im_ext)
    print(f"imdb: {len(imdb)} images "
          f"({imdb[0].im_h}x{imdb[0].im_w})", flush=True)

    cache_dir = os.path.join(root, "training", ".decoded_cache") \
        if args.cache else None
    # prefetch=2: a deep queue pre-filled during warmup would credit the
    # measured window with batches produced before t0 (rate inflation)
    loader = TrainLoader(imdb, cfg, seed=0, prefetch=2,
                         decode_workers=args.workers,
                         raw_cache_dir=cache_dir)
    try:
        if args.cache:  # populate: one pass over every image
            for rec in imdb:
                loader._load_image(rec)
        for _ in range(args.warmup):
            next(loader)
        loader.pop_wait_stats()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            b = next(loader)
        dt = time.perf_counter() - t0
    finally:
        loader.close()

    n_img = args.iters * args.batch_size
    rate = n_img / dt
    print(f"batch {b['images_u8'].shape}, {args.iters} batches "
          f"in {dt:.2f}s")
    print(json.dumps({
        "metric": "train_loader_throughput",
        "value": round(rate, 2), "unit": "img/s",
        "batch_size": args.batch_size, "workers": args.workers,
        "cache": bool(args.cache),
        "ms_per_batch": round(1000 * dt / args.iters, 2)}))


if __name__ == "__main__":
    main()
