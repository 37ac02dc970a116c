"""Kalman tracker: transition, association, update, full scan over frames."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groomed_nms_tpu.models.kalman import (PoseNet, Tracks,
                                           add_unused_measurements,
                                           associate_tracks, forecast_tracks,
                                           make_covariance,
                                           make_transition_matrix,
                                           project_ego, track_step,
                                           update_tracks)

T, M = 8, 4
P2 = np.eye(4, dtype=np.float32)
P2[0, 0] = 700.0
P2[1, 1] = 700.0
P2[0, 2] = 300.0
P2[1, 2] = 100.0


def _meas(rows):
    """rows: list of (x, y, z, theta, vel, score, un). -> [M, 16] padded."""
    m = np.zeros((M, 16), np.float32)
    valid = np.zeros((M,), bool)
    for i, (x, y, z, theta, vel, score, un) in enumerate(rows):
        u = 700 * x / z + 300
        v = 700 * y / z + 100
        m[i] = [u - 40, v - 30, u + 40, v + 30, score, 1,
                x, y, z, 1.6, 1.5, 3.9, theta, 0.0, un, vel]
        valid[i] = True
    return jnp.asarray(m), jnp.asarray(valid)


def test_transition_matrix_moves_along_heading():
    a = make_transition_matrix(jnp.asarray([0.0]), jnp.asarray([0.0]))
    x = jnp.asarray([[0, 0, 10, 1.6, 1.5, 3.9, 0.0, 0.0, 2.0]])
    x_new = jnp.einsum("tij,tj->ti", a, x)
    # theta=0 -> velocity moves +x (cos) and -z*sin(0)=0
    np.testing.assert_allclose(x_new[0, 0], 2.0, atol=1e-6)
    np.testing.assert_allclose(x_new[0, 2], 10.0, atol=1e-6)
    # head >= 0.5 flips by pi
    a2 = make_transition_matrix(jnp.asarray([0.0]), jnp.asarray([1.0]))
    x_new2 = jnp.einsum("tij,tj->ti", a2, x)
    np.testing.assert_allclose(x_new2[0, 0], -2.0, atol=1e-5)


def test_covariance_broadcast_semantics():
    """Reference builds covariances from an [N, 8] broadcast: ALL first-8
    diagonal entries carry the value, (8, 8) stays 1 (differentially
    verified in tests/test_kalman_differential.py)."""
    c = make_covariance(jnp.asarray([0.3, 0.7]))
    assert c.shape == (2, 9, 9)
    for d in range(8):
        np.testing.assert_allclose(c[0, d, d], 0.3)
        np.testing.assert_allclose(c[1, d, d], 0.7)
    np.testing.assert_allclose(c[0, 8, 8], 1.0)
    r = make_covariance(jnp.asarray([0.2]), size=8)
    for d in range(8):
        np.testing.assert_allclose(r[0, d, d], 0.2)


def test_first_frame_spawns_tracks():
    tracks = Tracks.empty(T)
    meas, valid = _meas([(0, 1.5, 10, 0.1, 1.0, 0.9, 0.8),
                         (3, 1.5, 20, -0.2, 0.5, 0.8, 0.7)])
    tracks = track_step(tracks, meas, valid, jnp.zeros(6),
                        jnp.asarray(P2), apply_pose=False)
    assert int(tracks.valid.sum()) == 2
    xs = np.asarray(tracks.X[np.asarray(tracks.valid)])
    assert set(np.round(xs[:, 2]).astype(int)) <= {10, 20}
    assert int(tracks.next_id) == 2


def test_track_continuity_and_update():
    tracks = Tracks.empty(T)
    m0, v0 = _meas([(0.0, 1.5, 10.0, 0.0, 1.0, 0.9, 0.9)])
    tracks = track_step(tracks, m0, v0, jnp.zeros(6), jnp.asarray(P2),
                        apply_pose=False)
    id0 = int(tracks.ids[np.argmax(np.asarray(tracks.valid))])
    # spawned state has vel=0 (reference pads it, kalman.py:354), so the
    # object may move at most MATCH_DIST between frames to re-associate
    m1, v1 = _meas([(0.3, 1.5, 10.0, 0.0, 1.0, 0.9, 0.9)])
    tracks = track_step(tracks, m1, v1, jnp.zeros(6), jnp.asarray(P2),
                        apply_pose=False)
    assert int(tracks.valid.sum()) == 1, "should re-associate, not spawn"
    ti = np.argmax(np.asarray(tracks.valid))
    assert int(tracks.ids[ti]) == id0
    x = np.asarray(tracks.X[ti])
    assert abs(x[0] - 0.3) < 0.3 and abs(x[2] - 10.0) < 0.5


def test_missed_track_decays_and_dies():
    tracks = Tracks.empty(T)
    m0, v0 = _meas([(0.0, 1.5, 10.0, 0.0, 0.0, 0.9, 0.9)])
    tracks = track_step(tracks, m0, v0, jnp.zeros(6), jnp.asarray(P2),
                        apply_pose=False)
    un0 = float(tracks.un[np.argmax(np.asarray(tracks.valid))])
    empty_m = jnp.zeros((M, 16))
    empty_v = jnp.zeros((M,), bool)
    alive = []
    for _ in range(12):
        tracks = track_step(tracks, empty_m, empty_v, jnp.zeros(6),
                            jnp.asarray(P2), apply_pose=False)
        alive.append(int(tracks.valid.sum()))
    assert alive[0] <= 1
    assert alive[-1] == 0, "unmatched track must die after confidence decay"


def test_ego_projection_moves_tracks():
    tracks = Tracks.empty(T)
    m0, v0 = _meas([(0.0, 1.5, 10.0, 0.0, 0.0, 0.9, 0.9)])
    tracks = track_step(tracks, m0, v0, jnp.zeros(6), jnp.asarray(P2),
                        apply_pose=False)
    # ego moves forward 2m -> object apparent z decreases by 2
    pose = jnp.asarray([0.0, 0.0, -2.0, 0.0, 0.0, 0.0])
    moved = project_ego(tracks, pose, jnp.asarray(P2))
    ti = np.argmax(np.asarray(tracks.valid))
    np.testing.assert_allclose(float(moved.X[ti, 2]),
                               float(tracks.X[ti, 2]) - 2.0, atol=1e-5)


def test_association_prefers_distance_then_iou():
    tracks = Tracks.empty(T)
    m0, v0 = _meas([(0.0, 1.5, 10.0, 0.0, 0.0, 0.9, 0.9),
                    (5.0, 1.5, 30.0, 0.0, 0.0, 0.8, 0.8)])
    tracks = track_step(tracks, m0, v0, jnp.zeros(6), jnp.asarray(P2),
                        apply_pose=False)
    match_t, used_m = associate_tracks(tracks, m0, v0)
    mt = np.asarray(match_t)
    tv = np.asarray(tracks.valid)
    xs = np.asarray(tracks.X)
    for ti in np.flatnonzero(tv):
        mi = mt[ti]
        assert mi >= 0
        np.testing.assert_allclose(xs[ti, 2], np.asarray(m0)[mi, 8], atol=0.5)


def test_full_video_scan_jits():
    """The whole tracker over F frames compiles as one lax.scan."""
    def run(frames_meas, frames_valid):
        def step(tracks, inp):
            meas, valid = inp
            tracks = track_step(tracks, meas, valid, jnp.zeros(6),
                                jnp.asarray(P2), apply_pose=False)
            return tracks, tracks.valid.sum()

        tracks = Tracks.empty(T)
        _, counts = jax.lax.scan(step, tracks, (frames_meas, frames_valid))
        return counts

    f = 4
    meas_list, valid_list = [], []
    for fi in range(f):
        m, v = _meas([(0.5 * fi, 1.5, 10.0, 0.0, 0.5, 0.9, 0.9)])
        meas_list.append(m)
        valid_list.append(v)
    counts = jax.jit(run)(jnp.stack(meas_list), jnp.stack(valid_list))
    assert list(np.asarray(counts)) == [1, 1, 1, 1]


def test_pose_net_shapes():
    net = PoseNet(features=32)
    feats = jnp.zeros((2, 4, 8, 64))
    variables = net.init(jax.random.PRNGKey(0), feats)
    pose = net.apply(variables, feats)
    assert pose.shape == (2, 6)


def test_pose_loss():
    from groomed_nms_tpu.losses.pose import pose_loss
    pred = jnp.asarray([[0.1, 0.0, 0.0, 0.0, 0.0, 0.0]])
    tar = jnp.zeros((1, 6))
    loss, stats = pose_loss(pred, tar, np.zeros(6), np.ones(6) * 2.0)
    # 0.1 normalised error in tx -> 0.2 denormalised; t mean over 3 dims,
    # r term zero (reference Pose_loss semantics, lambdas default to 1)
    np.testing.assert_allclose(float(loss), 0.2 / 3, atol=1e-6)
    assert "t_err" in stats and "r_err" in stats


def test_write_kitti_tracks_reference_semantics(tmp_path):
    """The track writer must mirror the reference's video writer
    (lib/rpn_util.py:1690-1812 with use_un_for_score): score = tracks.un
    RAW (un already folds the 2D score, = the reference's bbox_un), gate
    un > score_thres, and box2d written UNDIVIDED (it is already in
    original-image pixels).  Review r3 caught the writer dividing by
    scale again and multiplying the score back in."""
    from groomed_nms_tpu.inference import write_kitti_tracks
    from groomed_nms_tpu.ops.geometry import rot_y_to_alpha

    t = 4
    tr = Tracks.empty(t)
    x = jnp.zeros((t, 9))
    x = x.at[0].set(jnp.asarray([2.0, 1.0, 20.0, 1.6, 1.5, 3.9, 0.3, 0.0,
                                 4.0]))
    x = x.at[1].set(jnp.asarray([-3.0, 1.1, 30.0, 1.5, 1.4, 3.5, -0.2, 1.0,
                                 2.0]))
    box2d = jnp.zeros((t, 6))
    box2d = box2d.at[0, :5].set(jnp.asarray([100.0, 80.0, 220.0, 160.0,
                                             0.8]))
    box2d = box2d.at[1, :5].set(jnp.asarray([400.0, 90.0, 500.0, 150.0,
                                             0.9]))
    tr = tr._replace(
        valid=jnp.asarray([True, True, True, False]),
        X=x, box2d=box2d,
        # track 0 passes the gate; track 1 is exactly at the 0.65
        # threshold (reference gate is strict >); track 2 is valid but
        # below; track 3 has high un but is an empty slot
        un=jnp.asarray([0.7, 0.65, 0.2, 0.99]))

    path = tmp_path / "000000.txt"
    write_kitti_tracks(str(path), tr, score_thres=0.65)
    rows = [ln.split() for ln in path.read_text().splitlines()]
    assert len(rows) == 1, rows

    vals = np.array([float(v) for v in rows[0][1:]])
    # score column = un raw (NOT un * 2D score = 0.56)
    np.testing.assert_allclose(vals[-1], 0.7, atol=1e-6)
    # 2D box written in original pixels, undivided
    np.testing.assert_allclose(vals[3:7], [100.0, 80.0, 220.0, 160.0],
                               atol=1e-6)
    # 3D tail: ry = theta (head < 0.5), y re-grounded by h3d/2
    np.testing.assert_allclose(vals[7:10], [1.5, 1.6, 3.9], atol=1e-6)
    np.testing.assert_allclose(vals[10:13], [2.0, 1.0 + 1.5 / 2, 20.0],
                               atol=1e-6)
    np.testing.assert_allclose(vals[13], 0.3, atol=1e-6)
    np.testing.assert_allclose(
        vals[2], float(rot_y_to_alpha(0.3, 20.0, 2.0)), atol=1e-5)
