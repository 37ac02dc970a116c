"""End-to-end script integration: train 4 iters + test on synthetic KITTI."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAL = ("P2: 300.0 0.0 160.0 10.0 0.0 300.0 48.0 -0.1 "
       "0.0 0.0 1.0 0.002\n")


def _subprocess_env(n_devices=2):
    """Hermetic CPU env for script subprocesses.

    Strips any ambient TPU-plugin site dir (e.g. /root/.axon_site, whose
    sitecustomize force-registers a platform that overrides
    JAX_PLATFORMS=cpu) from PYTHONPATH, on top of the scripts' own
    ensure_requested_platform() pin -- belt and braces, because a child
    that silently lands on a remote-compile tunnel turns a 2-minute test
    into a 20-minute timeout."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + parts)
    return env


def _make_tree(root, split, n_images, im_h=96, im_w=320, seed=0,
               paint_objects=True):
    """Synthetic KITTI tree. With ``paint_objects`` the object boxes are
    drawn as bright rectangles so the detector has visual evidence to learn
    from (pure-noise images make learning impossible by construction)."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    for sub in ("image_2", "calib", "label_2"):
        os.makedirs(os.path.join(root, split, sub), exist_ok=True)
    for i in range(n_images):
        iid = f"{i:06d}"
        img = rng.integers(0, 80, (im_h, im_w, 3), np.uint8)
        lines = []
        for _ in range(3):
            x, z = rng.uniform(-8, 8), rng.uniform(8, 30)
            ry = rng.uniform(-np.pi, np.pi)
            alpha = ry - np.arctan2(x, z)
            u = 300 * x / z + 160
            v = 300 * 1.65 / z + 48
            w2 = 300 * 1.8 / z
            h2 = 300 * 1.6 / z
            x1, y1 = np.clip(u - w2 / 2, 0, im_w - 10), \
                np.clip(v - h2, 0, im_h - 10)
            x2 = min(x1 + w2, im_w - 1)
            y2 = min(y1 + h2, im_h - 1)
            if paint_objects:
                img[int(y1):int(y2) + 1, int(x1):int(x2) + 1] = \
                    rng.integers(170, 255, 3)
            lines.append(
                f"Car 0.0 0 {alpha:.3f} {x1:.2f} {y1:.2f} "
                f"{x2:.2f} {y2:.2f} "
                f"1.5 1.6 3.9 {x:.2f} 1.65 {z:.2f} {ry:.3f}")
        Image.fromarray(img).save(
            os.path.join(root, split, "image_2", iid + ".png"))
        open(os.path.join(root, split, "calib", iid + ".txt"),
             "w").write(CAL)
        open(os.path.join(root, split, "label_2", iid + ".txt"),
             "w").write("\n".join(lines) + "\n")


@pytest.mark.slow
def test_train_then_test_scripts(tmp_path):
    data_root = tmp_path / "data"
    out_root = tmp_path / "output"
    kitti = data_root / "kitti_split1"
    _make_tree(str(kitti), "training", 6)
    _make_tree(str(kitti), "validation", 4, seed=1)

    env = _subprocess_env()

    train = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train.py"),
         "--config", "tiny_synthetic", "--data-root", str(data_root),
         "--output", str(out_root)],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert train.returncode == 0, train.stderr[-3000:]
    assert "backend=cpu" in (out_root / "tiny_synthetic" /
                             "train.log").read_text(), \
        "train.py must run hermetically on CPU when JAX_PLATFORMS=cpu"
    weights = out_root / "tiny_synthetic" / "weights"
    assert weights.is_dir() and any(weights.iterdir()), \
        "no checkpoints written"
    # snapshot-time eval (do_test): training itself must have produced val
    # detections + evaluator stats (reference train_rpn_3d.py:162-189)
    snap_results = out_root / "tiny_synthetic" / "results" / "results_4"
    snap_txts = list((snap_results / "data").glob("*.txt"))
    assert len(snap_txts) == 4, "snapshot eval must write per-image txt"
    # evaluator stats appear whenever any class had detections; with an
    # untrained net all-empty txts are the only legitimate absence
    if any(t.stat().st_size for t in snap_txts):
        assert list(snap_results.glob("stats_*")), \
            "snapshot eval must run the evaluator"

    # crash/requeue recovery: re-running the SAME command with a higher
    # max_iter must auto-resume from our own latest checkpoint, not
    # restart or warm-start over it
    resume = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train.py"),
         "--config", "tiny_synthetic", "--data-root", str(data_root),
         "--output", str(out_root), "--max-iter", "6",
         "--steps-per-dispatch", "2"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert resume.returncode == 0, resume.stderr[-3000:]
    log_text = (out_root / "tiny_synthetic" / "train.log").read_text()
    assert "auto-resumed own checkpoint at iter 4" in log_text
    assert "multi-step dispatch: 2 steps per runtime call" in log_text
    assert (weights / "checkpoint_6").is_dir(), "resume must continue to 6"

    test = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "test.py"),
         "--config", "tiny_synthetic", "--data-root", str(data_root),
         "--output", str(out_root)],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert test.returncode == 0, test.stderr[-3000:]
    results = out_root / "tiny_synthetic" / "results" / "results_latest" / \
        "data"
    txts = sorted(results.iterdir())
    assert len(txts) == 4, "one result file per val image"
    # the evaluator ran (random weights -> APs may be 0; files must exist)
    stats = list((results.parent).glob("stats_*"))
    assert train.stdout or True  # logs captured
    assert stats or "evaluated" in test.stdout + test.stderr

    # --refine: the projection-consistency hill-climb path end to end
    # (value-level guarantees are unit-tested in test_refine_roialign.py)
    before = {p.name: p.read_text() for p in txts}
    refine = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "test.py"),
         "--config", "tiny_synthetic", "--data-root", str(data_root),
         "--output", str(out_root), "--refine", "--skip-eval"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert refine.returncode == 0, refine.stderr[-3000:]
    after = {p.name: p.read_text() for p in sorted(results.iterdir())}
    assert set(after) == set(before), "refine must write every image's txt"
    for name, txt in after.items():
        for ln_a, ln_b in zip(txt.splitlines(), before[name].splitlines()):
            fa, fb = ln_a.split(), ln_b.split()
            # class/2D box/score untouched; only 3D columns may move
            assert fa[0] == fb[0] and fa[4:8] == fb[4:8] and fa[-1] == fb[-1]

    # sharded eval fan-out: two CONCURRENT shard processes into one
    # results dir; shard 0 must wait for shard 1's completion marker
    # before scoring (never evaluate a partial detection set)
    shard_common = [sys.executable, os.path.join(REPO, "scripts", "test.py"),
                    "--config", "tiny_synthetic",
                    "--data-root", str(data_root), "--output", str(out_root),
                    "--num-shards", "2"]
    p1 = subprocess.Popen(shard_common + ["--shard-index", "1"],
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True, env=env, cwd=str(tmp_path))
    p0 = subprocess.Popen(shard_common + ["--shard-index", "0"],
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True, env=env, cwd=str(tmp_path))
    _, e1 = p1.communicate(timeout=1200)
    _, e0 = p0.communicate(timeout=1200)
    assert p1.returncode == 0, e1[-3000:]
    assert p0.returncode == 0, e0[-3000:]
    shard_res = out_root / "tiny_synthetic" / "results" / "results_latest"
    assert len(list((shard_res / "data").iterdir())) == 4, \
        "all shards' txts must be present"
    assert (shard_res / ".shard_done_0").is_file()
    assert (shard_res / ".shard_done_1").is_file()

    # deployment tail: export the trained checkpoint as an AOT artifact
    # (self-verified), then serve it over the val images with no model code
    exp = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export.py"),
         "--config", "tiny_synthetic", "--output", str(out_root),
         "--batch", "2", "--src-h", "96", "--src-w", "320", "--verify"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert exp.returncode == 0, exp.stderr[-3000:]
    artifact = out_root / "tiny_synthetic" / "model.ghlo"
    assert artifact.is_file() and (artifact.parent /
                                   "model.ghlo.json").is_file()
    serve = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--artifact", str(artifact),
         "--images", str(kitti / "validation" / "image_2"),
         "--calib", str(kitti / "validation" / "calib"),
         "--out", str(tmp_path / "served")],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert serve.returncode == 0, serve.stderr[-3000:]
    served = sorted(os.listdir(tmp_path / "served"))
    assert len(served) == 4, "serve.py must write one txt per val image"


def test_dashboard_renders_from_metrics_csv(tmp_path):
    """analysis/dashboard.py turns a metrics.csv into a self-contained HTML
    (the reference's visdom display_stats equivalent, lib/core.py:730-780)."""
    import json
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from analysis.dashboard import main as dash_main

    run = tmp_path / "exp"
    run.mkdir()
    keys = ["acc_fg", "bbox_3d", "cls", "total", "lr"]
    with open(run / "metrics.csv", "w") as f:
        f.write("iter," + ",".join(keys) + "\n")
        for i in range(1, 6):
            f.write(f"{i * 100}," + ",".join(
                f"{1.0 / i + j:.4f}" for j in range(len(keys))) + "\n")
    (run / "conf.json").write_text(json.dumps({"name": "exp", "lr": 4e-3}))
    out = dash_main(["--run", str(run)])
    html_text = open(out).read()
    for k in keys:
        assert f'data-key="{k}"' in html_text
    assert "<h2>loss</h2>" in html_text
    assert "<h2>accuracy</h2>" in html_text
    assert "Configuration" in html_text
    assert "__DATA__" in html_text


@pytest.mark.slow
def test_train_script_video_dispatch(tmp_path):
    """scripts/train.py --config <model=kalman> trains VideoRPN3D on a
    synthetic tracking tree through the real CLI path (tracking imdb ->
    clip loader -> video step with the trunk frozen)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_video_pipeline import _make_tracking_tree

    data_root = tmp_path / "data"
    _make_tracking_tree(str(data_root / "kitti_split1"), n_prev=1)
    out_root = tmp_path / "output"

    env = _subprocess_env()

    train = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train.py"),
         "--config", "tiny_video_synthetic", "--data-root", str(data_root),
         "--output", str(out_root)],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert train.returncode == 0, train.stderr[-3000:]
    out_dir = out_root / "tiny_video_synthetic"
    weights = out_dir / "weights"
    assert weights.is_dir() and any(weights.iterdir())
    # velocity-aware artifacts: 12-col anchors, 14-col stats
    z = np.load(out_dir / "anchors.npz")
    assert z["anchors"].shape[1] == 12
    assert z["bbox_means"].shape == (14,)
    log_text = (out_dir / "train.log").read_text()
    assert "backend=cpu" in log_text, \
        "video train must run hermetically on CPU"
    assert "freezing" in log_text

    # ---- pose-branch training (reference scripts/train_pose.py): frozen
    # trunk, L1 pose loss on consecutive-frame pairs with ego labels
    pose = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_pose.py"),
         "--config", "tiny_video_synthetic", "--data-root", str(data_root),
         "--output", str(out_root), "--max-iter", "2"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert pose.returncode == 0, pose.stderr[-3000:]
    assert "backend=cpu" in pose.stderr + pose.stdout
    pose_dir = out_root / "tiny_video_synthetic_pose"
    assert (pose_dir / "pose_net_params.npz").exists()
    assert (pose_dir / "pose_stats.npz").exists()
    z = np.load(pose_dir / "pose_stats.npz")
    assert z["means"].shape == (6,) and np.isfinite(z["means"]).all()

    # ---- video eval tail (reference scripts/test_kalman.py): per-frame
    # detections + Kalman smoothing over the clip -> KITTI txt + evaluator
    kitti = data_root / "kitti_split1"
    os.symlink(str(kitti / "training"), str(kitti / "validation"))
    kal = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "test_kalman.py"),
         "--config", "tiny_video_synthetic", "--data-root", str(data_root),
         "--output", str(out_root)],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert kal.returncode == 0, kal.stderr[-3000:]
    assert "backend=cpu" in kal.stderr + kal.stdout
    kal_txts = sorted((out_dir / "results" / "results_kalman" / "data")
                      .glob("*.txt"))
    assert len(kal_txts) == 2, "one txt per tracking record"

    # ---- demo-video generation (reference scripts/tracking_video.py):
    # frame-by-frame tracker over a raw sequence + rendered frames
    seq = tmp_path / "seq"
    os.makedirs(seq / "image_2")
    for k, src in enumerate(sorted((kitti / "training" / "image_2")
                                   .iterdir())):
        os.symlink(str(src), str(seq / "image_2" / f"{k:06d}.png"))
    (seq / "calib.txt").write_text(
        open(kitti / "training" / "calib" / "000000.txt").read())
    demo = tmp_path / "demo.mp4"
    vid = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tracking_video.py"),
         "--config", "tiny_video_synthetic", "--sequence", str(seq),
         "--output", str(out_root), "--out", str(demo), "--limit", "2"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert vid.returncode == 0, vid.stderr[-3000:]
    frames_dir = tmp_path / "demo_frames"
    rendered = list(frames_dir.glob("*.png"))
    assert len(rendered) == 2, "one rendered frame per input frame"
    assert "weights restored" in vid.stderr + vid.stdout

    # ---- video deployment tail: clip-in/tracks-out AOT artifact
    # (self-verified against the live jitted pipeline), then served over
    # the raw frame sequence with no model code
    exp = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export.py"),
         "--config", "tiny_video_synthetic", "--output", str(out_root),
         "--video", "--src-h", "96", "--src-w", "320", "--verify"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert exp.returncode == 0, exp.stderr[-3000:]
    artifact = out_dir / "video_model.ghlo"
    assert artifact.is_file()
    import json
    meta = json.loads((out_dir / "video_model.ghlo.json").read_text())
    assert meta["frames"] == 2
    serve = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--artifact", str(artifact), "--images", str(seq / "image_2"),
         "--out", str(tmp_path / "served_tracks")],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(tmp_path))
    assert serve.returncode == 0, serve.stderr[-3000:]
    served = sorted(os.listdir(tmp_path / "served_tracks"))
    assert len(served) == 2, "serve.py must write one txt per frame"
