"""StatTracker / MetricsCSV / setup_split behavior (reference
lib/core.py:670-825 stat protocol; data/kitti_split*/setup_split.py)."""

import os
import subprocess
import sys

import numpy as np

from groomed_nms_tpu.training.stats import MetricsCSV, StatTracker

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stat_tracker_means_and_reset():
    t = StatTracker(max_iter=100, display=2)
    t.update({"loss": 2.0, "acc": 1.0})
    t.update({"loss": 4.0})
    m = t.means()
    assert m["loss"] == 3.0 and m["acc"] == 1.0
    t.reset()
    assert t.means() == {}


def test_stat_tracker_update_is_lazy():
    """update() must NOT force conversion (a float() on a device scalar
    would block the dispatch queue every step); conversion happens in
    means()."""

    class Scalar:
        def __init__(self):
            self.converted = False

        def __float__(self):
            self.converted = True
            return 1.5

    s = Scalar()
    t = StatTracker(max_iter=10)
    t.update({"loss": s})
    assert not s.converted
    assert t.means()["loss"] == 1.5
    assert s.converted


def test_stat_tracker_resume_eta():
    """dt measures THIS process's progress: a run resumed at iter 30000
    must not divide elapsed wall-clock by 30100."""
    t0 = StatTracker(max_iter=200, start_iter=100)
    t0.start -= 10.0          # pretend 10s elapsed
    _, dt = t0.eta(110)       # 10 iterations in 10s
    assert abs(dt - 1.0) < 0.1
    fresh = StatTracker(max_iter=200)
    fresh.start -= 10.0
    _, dt_fresh = fresh.eta(110)
    assert abs(dt_fresh - 10.0 / 110) < 0.01


def test_metrics_csv_resume_same_keys(tmp_path):
    p = str(tmp_path / "metrics.csv")
    m = MetricsCSV(p)
    m.append(1, {"b": 2.0, "a": 1.0})
    # new process, same stat set -> appends under the existing header
    m2 = MetricsCSV(p)
    m2.append(2, {"a": 3.0, "b": 4.0})
    lines = open(p).read().splitlines()
    assert lines[0] == "iter,a,b"
    assert lines[1] == "1,1.000000,2.000000"
    assert lines[2] == "2,3.000000,4.000000"


def test_metrics_csv_rotates_on_key_change(tmp_path):
    """A changed stat set (e.g. enabling a loss term) must never append
    rows under a header with different columns."""
    p = str(tmp_path / "metrics.csv")
    MetricsCSV(p).append(1, {"a": 1.0})
    m2 = MetricsCSV(p)
    m2.append(2, {"a": 1.0, "un": 0.5})
    assert os.path.exists(p + ".1")
    assert open(p + ".1").read().splitlines()[0] == "iter,a"
    lines = open(p).read().splitlines()
    assert lines[0] == "iter,a,un"
    assert lines[1].startswith("2,")
    # missing keys in a later window leave the column empty
    m2.append(3, {"a": 2.0})
    assert open(p).read().splitlines()[2] == "3,2.000000,"


def _fake_kitti(root, ids):
    train = os.path.join(root, "training")
    for sub, ext in (("image_2", ".png"), ("calib", ".txt"),
                     ("label_2", ".txt")):
        os.makedirs(os.path.join(train, sub), exist_ok=True)
        for iid in ids:
            with open(os.path.join(train, sub, iid + ext), "w") as f:
                f.write("x")
    return train


def _run_setup_split(kitti, split_dir):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "setup_split.py"),
         "--kitti", kitti, "--split-dir", split_dir],
        capture_output=True, text=True, timeout=120)


def test_setup_split_repairs_dangling_links(tmp_path):
    ids = ["000000", "000001"]
    kitti_a = str(tmp_path / "kitti_a")
    _fake_kitti(kitti_a, ids)
    split = str(tmp_path / "split")
    os.makedirs(split)
    with open(os.path.join(split, "train.txt"), "w") as f:
        f.write("\n".join(ids))
    r = _run_setup_split(kitti_a, split)
    assert r.returncode == 0, r.stderr
    img = os.path.join(split, "training", "image_2", "000000.png")
    assert os.path.islink(img) and os.path.exists(img)

    # move the KITTI tree: old links dangle; a re-run must REPAIR them,
    # not crash (os.path.exists follows symlinks -> FileExistsError bug)
    kitti_b = str(tmp_path / "kitti_b")
    os.rename(kitti_a, kitti_b)
    assert not os.path.exists(img)
    r = _run_setup_split(kitti_b, split)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(img)
    assert os.readlink(img).startswith(kitti_b)


def test_setup_split_fails_loudly_on_wrong_kitti(tmp_path):
    split = str(tmp_path / "split")
    os.makedirs(split)
    with open(os.path.join(split, "train.txt"), "w") as f:
        f.write("000000\n")
    r = _run_setup_split(str(tmp_path / "nowhere"), split)
    assert r.returncode != 0
    assert "wrong --kitti" in (r.stdout + r.stderr)
