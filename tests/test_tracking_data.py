"""Tracking dataset: pose math, velocity computation, video imdb build."""

import math
import os

import numpy as np
import pytest

from groomed_nms_tpu.data.tracking import (build_tracking_imdb,
                                           compute_rel_pose,
                                           compute_track_velocity, euler2mat,
                                           inverse_rel_pose, mat2euler,
                                           map_image_to_raw,
                                           read_train_mapping,
                                           read_train_rand)


def test_euler_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        rx, ry, rz = rng.uniform(-1.2, 1.2, 3)
        m = euler2mat(rx, ry, rz)
        rx2, ry2, rz2 = mat2euler(m)
        np.testing.assert_allclose([rx2, ry2, rz2], [rx, ry, rz], atol=1e-9)


def test_rel_pose_inverse():
    rng = np.random.default_rng(1)
    a, b = np.eye(4), np.eye(4)
    a[:3, :3] = euler2mat(*rng.uniform(-0.5, 0.5, 3))
    a[:3, 3] = rng.uniform(-5, 5, 3)
    b[:3, :3] = euler2mat(*rng.uniform(-0.5, 0.5, 3))
    b[:3, 3] = rng.uniform(-5, 5, 3)
    rel = compute_rel_pose(a, b)
    rel_mat = np.eye(4)
    rel_mat[:3, :3] = euler2mat(rel[3], rel[4], rel[5])
    rel_mat[:3, 3] = rel[:3]
    # pose_pre = pose @ rel  (definition: rel = inv(pose) @ pose_pre)
    np.testing.assert_allclose(b @ rel_mat, a, atol=1e-9)
    np.testing.assert_allclose(inverse_rel_pose(a, rel_mat), b, atol=1e-9)


def test_track_velocity():
    gts_prev = {
        "cls": np.array(["Car"], object),
        "track": np.array([7]),
        "center_3d": np.array([[0.0, 1.5, 10.0]]),
    }
    gts_cur = {
        "cls": np.array(["Car", "Car"], object),
        "track": np.array([7, 9]),
        "center_3d": np.array([[1.0, 1.5, 10.0], [5.0, 1.5, 20.0]]),
        "bbox_3d": np.zeros((2, 16)),
    }
    out = compute_track_velocity((0, 0, 0, 0, 0, 0), gts_prev, gts_cur)
    np.testing.assert_allclose(out["vel"][0], 1.0)      # moved 1m in x
    assert out["vel"][1] == -np.inf                     # unmatched track
    assert out["bbox_3d"].shape == (2, 17)
    # ego moving forward 2m: same world point appears 2m closer
    out2 = compute_track_velocity((0, 0, -2.0, 0, 0, 0), gts_prev, gts_cur)
    np.testing.assert_allclose(out2["vel"][0], math.hypot(1.0, 2.0))


CAL = "P2: 700.0 0.0 300.0 0.0 0.0 700.0 100.0 0.0 0.0 0.0 1.0 0.0\n"


def _write_img(path, h=48, w=96):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


def test_build_tracking_imdb(tmp_path):
    root = str(tmp_path / "kitti_split1")
    split = os.path.join(root, "training")
    for sub in ("image_2", "calib", "label_2", "prev_2"):
        os.makedirs(os.path.join(split, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "devkit", "mapping"), exist_ok=True)
    seq = "2011_09_26_drive_0005_sync"
    raw = os.path.join(root, "raw_extra", seq)
    os.makedirs(os.path.join(raw, "label_2"), exist_ok=True)

    # one training image mapped to raw frame 5 of the sequence
    iid = "000000"
    _write_img(os.path.join(split, "image_2", iid + ".png"))
    for k in (1, 2, 3):
        _write_img(os.path.join(split, "prev_2", f"{iid}_{k:02d}.png"))
    open(os.path.join(split, "calib", iid + ".txt"), "w").write(CAL)
    gt = ("Car 0.0 0 0.2 10 10 60 40 1.5 1.6 3.9 2.0 1.65 15.0 0.3 7\n")
    open(os.path.join(split, "label_2", iid + ".txt"), "w").write(gt)

    # mapping: image 0 -> (seq, frame 5) via rand_map[0]=1 -> mapping[0]
    open(os.path.join(root, "devkit", "mapping", "train_mapping.txt"),
         "w").write(f"2011_09_26 {seq} 0000000005\n")
    open(os.path.join(root, "devkit", "mapping", "train_rand.txt"),
         "w").write("1\n")

    # raw poses: ego drives +z at 1 m/frame
    pose_rows = []
    for i in range(8):
        p = np.eye(4)
        p[2, 3] = float(i)
        pose_rows.append(" ".join(str(v) for v in p[:3].reshape(-1)))
    open(os.path.join(raw, "pose.txt"), "w").write("\n".join(pose_rows) + "\n")

    # raw per-frame labels for frames 2..5 with a persistent track id
    for fi in range(2, 6):
        row = (f"Car 0.0 0 0.2 10 10 60 40 1.5 1.6 3.9 "
               f"{2.0 + 0.5 * fi} 1.65 15.0 0.3 7\n")
        open(os.path.join(raw, "label_2", f"{fi:06d}.txt"), "w").write(row)

    imdb = build_tracking_imdb(root, "training")
    assert len(imdb) == 1
    rec = imdb[0]
    assert rec.raw_seq == seq and rec.raw_frame == 5
    assert rec.has_track
    assert set(rec.egos) == {"32", "31", "30", "21", "20", "10"}
    # ego 10: moved +1 in z between consecutive frames; relative pose of the
    # earlier frame expressed in the newer frame => dz = -1
    np.testing.assert_allclose(rec.egos["10"][2], -1.0, atol=1e-9)
    # velocity: labels keep camera-frame z fixed while the ego advances
    # 1 m/frame, so in world the object moves (+0.5 x, +1.0 z) per frame
    cur = rec.gts_frames[0]
    assert cur["bbox_3d"].shape[1] == 17
    np.testing.assert_allclose(cur["vel"][0], math.hypot(0.5, 1.0),
                               atol=1e-6)


def test_mapping_parsers(tmp_path):
    mf = tmp_path / "train_mapping.txt"
    rf = tmp_path / "train_rand.txt"
    mf.write_text("2011_09_26 drive_a 0000000001\n2011_09_26 drive_b 0000000009\n")
    rf.write_text("2,1\n")
    mapping = read_train_mapping(str(mf))
    rand = read_train_rand(str(rf))
    assert map_image_to_raw(0, mapping, rand) == ("drive_b", "0000000009")
    assert map_image_to_raw(1, mapping, rand) == ("drive_a", "0000000001")


def test_synthetic_video_tree_through_imdb(tmp_path):
    """make_synthetic_kitti_video's geometry conventions must survive the
    library's OWN pose/velocity math: parked cars get ~0 velocity, movers
    their world speed, egos ~forward motion, and consecutive records
    share frames (record i's prev_1 == record i-1's image)."""
    from groomed_nms_tpu.data.synthetic import make_synthetic_kitti_video

    root = str(tmp_path / "kitti_split1")
    make_synthetic_kitti_video(root, n_train=8, n_val=3, n_prev=2,
                               im_h=112, im_w=372, seed=3)
    imdb = build_tracking_imdb(root, "training", n_prev=2)
    assert len(imdb) == 8

    vels_parked, vels_moving = [], []
    for rec in imdb:
        assert rec.has_track and "10" in rec.egos and "21" in rec.egos
        dx, dy, dz = rec.egos["10"][:3]
        # prev camera origin in the current frame: ~1.1 m behind
        assert -1.45 < dz < -0.75 and abs(dx) < 0.3 and abs(dy) < 1e-6
        cur = rec.gts_frames[0]
        if cur is None or "vel" not in cur:
            continue
        for v in cur["vel"]:
            if not np.isfinite(v):
                continue
            (vels_moving if v > 0.15 else vels_parked).append(float(v))
    assert vels_parked, "no parked cars matched across frames"
    assert max(vels_parked) < 0.06      # label rounding only
    for v in vels_moving:
        assert 0.2 < v < 1.8            # spawned mover speed range

    # frame overlap: record i's prev_1 bytes == record i-1's current image
    img1 = open(os.path.join(root, "training", "prev_2",
                             "000001_01.png"), "rb").read()
    img0 = open(os.path.join(root, "training", "image_2",
                             "000000.png"), "rb").read()
    assert img1 == img0

    # validation split resolves through the same global rand/mapping
    val = build_tracking_imdb(root, "validation", n_prev=2)
    assert len(val) == 3 and all(r.raw_seq != imdb[0].raw_seq for r in val)
    assert all(r.has_track for r in val)
