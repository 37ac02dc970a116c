"""Host-side analysis tooling: KITTI txt parsing conventions + matching.

Regression coverage for the analysis-suite review findings: GT label files
have 15 tokens (no score) while detection files have 16; oracle rescoring
must actually see the GT; calibration-curve matching is against visible
ground truth only.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "analysis"))

GT_LINE = ("Car 0.00 {occ} -1.55 100.0 120.0 200.0 180.0 "
           "1.50 1.60 3.90 {x} 1.65 {z} -1.60")
DET_LINE = ("Car -1 -1 -1.55 100.0 120.0 200.0 180.0 "
            "1.50 1.60 3.90 {x} 1.65 {z} -1.60 {score}")


def _write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_oracle_nms_parses_15_token_gt(tmp_path):
    """KITTI GT lines carry 15 tokens; the oracle must not drop them (the
    bug zeroed every rescored detection)."""
    from oracle_nms import _load_rows, oracle_rescore

    gt = tmp_path / "label_2"
    res = tmp_path / "results"
    _write(str(gt / "000000.txt"),
           [GT_LINE.format(occ=0, x=2.0, z=20.0)])
    _write(str(res / "data" / "000000.txt"),
           [DET_LINE.format(x=2.0, z=20.0, score=0.9)])

    assert len(_load_rows(str(gt / "000000.txt"), min_cols=15)) == 1
    assert _load_rows(str(gt / "000000.txt"))== []  # 16-token default

    out = tmp_path / "oracle"
    oracle_rescore(str(res), str(gt), str(out), mode="2d")
    row = open(str(out / "data" / "000000.txt")).read().split()
    # identical 2D box -> oracle score 1.0, NOT the 0.0 of dropped GT
    assert abs(float(row[15]) - 1.0) < 1e-6


def test_detection_stats_rows_min_cols(tmp_path):
    from detection_stats import _rows

    p = str(tmp_path / "d.txt")
    _write(p, [GT_LINE.format(occ=0, x=0.0, z=10.0)])       # 15 tokens
    assert len(_rows(p)) == 1
    assert _rows(p, min_cols=16) == []   # GT file is not a results file


def test_compare_vis_matches_visible_gt_only(tmp_path):
    """Occlusion filter applies to the GT pool BEFORE matching: a det over
    an occluded GT scores against its best visible GT (possibly 0)."""
    from compare_performance_on_vis import collect_matches

    gt = tmp_path / "label_2"
    res = tmp_path / "data"
    # one heavily-occluded GT exactly at the detection, one visible far GT
    _write(str(gt / "000000.txt"),
           [GT_LINE.format(occ=3, x=2.0, z=20.0),
            GT_LINE.format(occ=1, x=-5.0, z=40.0)])
    _write(str(res / "000000.txt"),
           [DET_LINE.format(x=2.0, z=20.0, score=0.8)])
    scores, ious = collect_matches(str(res), str(gt))
    # the detection is KEPT (not dropped for overlapping occluded GT) and
    # its IoU is vs the visible GT only -> 0
    assert len(scores) == 1 and scores[0] == 0.8
    assert ious[0] == 0.0

    # same det with the occluded GT now visible -> near-perfect match
    _write(str(gt / "000000.txt"),
           [GT_LINE.format(occ=1, x=2.0, z=20.0)])
    scores, ious = collect_matches(str(res), str(gt))
    assert ious[0] > 0.95


def test_plot_prediction_error_collection(tmp_path):
    """plot_prediction_with_ground_truth matching semantics: DontCare GTs
    (z3d == -1000) are dropped before matching, matches need IoU2D > 0.4,
    and the exact IoU3D of the matched pair is recorded.  A second call hits
    the npz cache."""
    from plot_prediction_with_ground_truth import binned_curve, collect_errors

    gt = tmp_path / "results" / "label_2"
    res = tmp_path / "results" / "data"
    dontcare = ("DontCare -1 -1 -10 300.0 120.0 400.0 180.0 "
                "-1 -1 -1 -1000 -1000 -1000 -10")
    _write(str(gt / "000000.txt"),
           [GT_LINE.format(occ=0, x=2.0, z=20.0), dontcare])
    _write(str(res / "000000.txt"),
           [DET_LINE.format(x=2.0, z=20.0, score=0.9),
            # overlaps only the DontCare box -> no valid match
            "Car -1 -1 -1.55 300.0 120.0 400.0 180.0 "
            "1.50 1.60 3.90 8.0 1.65 30.0 -1.60 0.5"])
    e = collect_errors(str(res), str(gt))
    assert e["score"].shape == (1,) and e["score"][0] == 0.9
    assert e["iou2d"][0] > 0.99 and e["iou3d"][0] > 0.99
    assert e["z_err"][0] == 0.0

    # cache: rewrite the det file with garbage; cached arrays still served
    # for the same parameters (documented reference-like staleness) ...
    _write(str(res / "000000.txt"), [DET_LINE.format(x=9.0, z=90.0,
                                                     score=0.1)])
    e2 = collect_errors(str(res), str(gt))
    assert e2["score"][0] == 0.9
    # ... but a different min_iou2d / max_boxes invalidates the cache
    e3 = collect_errors(str(res), str(gt), min_iou2d=0.1)
    assert e3["score"].size == 0 or e3["score"][0] == 0.1

    # binning: per-bin mean of x and y, empty bins skipped
    x = np.array([0.05, 0.15, 0.95])
    y = np.array([0.2, 0.4, 1.0])
    xs, ys = binned_curve(x, y, np.array([0.0, 0.1, 0.2, 1.01]))
    assert np.allclose(xs, [0.05, 0.15, 0.95])
    assert np.allclose(ys, [0.2, 0.4, 1.0])


def test_gt_distribution_depths(tmp_path):
    """plot_gt_distribution filters like training (ignore/remove) and reads
    bbox_3d col 9 (cz3d)."""
    from plot_gt_distribution import split_depths

    from groomed_nms_tpu.config import ExperimentConfig

    root = str(tmp_path)
    for sub in ("image_2", "calib", "label_2"):
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)
    from PIL import Image
    Image.fromarray(np.zeros((370, 1224, 3), np.uint8)).save(
        os.path.join(root, "training", "image_2", "000000.png"))
    with open(os.path.join(root, "training", "calib", "000000.txt"),
              "w") as f:
        f.write("P2: 721.5 0.0 609.5 44.85 0.0 721.5 172.8 0.2163 "
                "0.0 0.0 1.0 0.002745\n")
    _write(os.path.join(root, "training", "label_2", "000000.txt"),
           [GT_LINE.format(occ=0, x=2.0, z=20.0),      # kept
            GT_LINE.format(occ=0, x=2.0, z=35.0),      # kept
            # Van is an ignore class -> excluded from the histogram
            GT_LINE.format(occ=0, x=0.0, z=50.0).replace("Car", "Van")])
    cfg = ExperimentConfig(min_gt_vis=0.0, percent_anc_h=(0.0, 10.0))
    d = split_depths(root, "training", cfg)
    assert sorted(d.tolist()) == [20.0, 35.0]


def test_dashboard_tolerates_empty_cells(tmp_path):
    """MetricsCSV writes empty cells for stats missing from a window; the
    dashboard must keep the row's other columns (per-cell tolerance) and
    carry per-series x axes for the gapped key."""
    from dashboard import _last, read_metrics

    p = tmp_path / "metrics.csv"
    with open(p, "w") as f:
        f.write("iter,a,b\n")
        f.write("100,1.0,2.0\n")
        f.write("200,1.5,\n")          # b missing this window
        f.write("300,2.0,4.0\n")
    header, cols = read_metrics(str(p))
    assert cols["iter"] == [100.0, 200.0, 300.0]
    assert cols["a"] == [1.0, 1.5, 2.0]
    assert cols["b"] == [2.0, None, 4.0]
    assert _last(cols["b"]) == 4.0


def test_dashboard_serve_live_updates(tmp_path):
    """--serve mode: the page re-renders from metrics.csv on every request
    (watching a run update live, the reference's visdom role), carries a
    meta-refresh poll tag, and shows a waiting page before the first row."""
    import threading
    import urllib.request

    from dashboard import serve

    run = tmp_path / "run"
    run.mkdir()

    got_port = []
    ev = threading.Event()

    def ready(port):
        got_port.append(port)
        ev.set()

    t = threading.Thread(target=serve, args=(str(run), 0),
                         kwargs=dict(refresh=3, ready_cb=ready), daemon=True)
    t.start()
    assert ev.wait(timeout=10), "server never bound"
    url = f"http://127.0.0.1:{got_port[0]}/"

    def fetch():
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.read().decode()

    page = fetch()
    assert "waiting for the first metrics window" in page
    assert 'http-equiv="refresh" content="3"' in page

    with open(run / "metrics.csv", "w") as f:
        f.write("iter,total\n100,5.0\n")
    page = fetch()
    assert "100" in page and "waiting" not in page

    with open(run / "metrics.csv", "a") as f:
        f.write("200,4.0\n")
    page = fetch()
    assert '"iter": [100.0, 200.0]' in page.replace("\n", "")


def test_oracle_3d_substitution_modes(tmp_path):
    """oracle_3d substitutes matched-GT 3D fields per mode and leaves
    unmatched detections untouched."""
    from oracle_3d import _write_oracle

    gt = tmp_path / "gt"
    res = tmp_path / "res"
    out = tmp_path / "out"
    _write(str(gt / "000000.txt"),
           [GT_LINE.format(occ=0, x=1.0, z=20.0)])
    # det 1 overlaps the GT box but carries wrong 3D fields; det 2 is far
    # away in 2D (no match) and must pass through unchanged
    _write(str(res / "000000.txt"),
           ["Car -1 -1 -1.55 102.0 121.0 198.0 179.0 "
            "1.10 1.20 3.00 5.00 1.00 28.00 0.40 0.90",
            DET_LINE.format(x=-5.0, z=9.0, score=0.5).replace(
                "100.0 120.0 200.0 180.0", "400.0 20.0 460.0 60.0")])

    for mode, want in [
            ("center", (1.0, 1.65, 20.0)),       # x y z from GT
            ("dims", (1.50, 1.60, 3.90)),        # h w l from GT
    ]:
        matched, total = _write_oracle(str(res), str(gt),
                                       str(out / mode), mode, 0.3)
        assert (matched, total) == (1, 2)
        rows = [l.split() for l in
                open(out / mode / "000000.txt").read().splitlines()]
        v = [float(x) for x in rows[0][1:]]
        if mode == "center":
            assert tuple(round(x, 2) for x in v[10:13]) == want
            assert v[7:10] == [1.10, 1.20, 3.00]   # dims untouched
        else:
            assert tuple(round(x, 2) for x in v[7:10]) == want
            assert v[10:13] == [5.00, 1.00, 28.00]
        # unmatched det unchanged (same 3D center as written)
        v2 = [float(x) for x in rows[1][1:]]
        assert v2[10:13] == [-5.0, 1.65, 9.0]

    # rymirror: ry' = 2*atan2(x, z) - ry with GT center/dims
    _write_oracle(str(res), str(gt), str(out / "rym"), "rymirror", 0.3)
    v = [float(x) for x in
         open(out / "rym" / "000000.txt").read().splitlines()[0].split()[1:]]
    assert abs(v[13] - (2 * np.arctan2(1.0, 20.0) - (-1.60))) < 1e-5
    assert [round(x, 2) for x in v[10:13]] == [1.0, 1.65, 20.0]
