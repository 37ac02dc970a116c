"""Differentiable Kalman video tracker + ego-pose network (TPU-native).

Capability match for the reference's video model
(models/densenet121_3d_dilate_decomp_alpha_un_kalman.py, 1131 LoC): a shared
RPN backbone over stacked frames, a spatially-attended 6-DoF ego-pose head,
and a per-object Kalman filter over the state
``[x, y, z, w3d, h3d, l3d, theta, head, vel]`` whose covariances are driven
by the predicted box confidence.

TPU-first re-design (vs. the reference's per-image python lists + dicts):

* **Fixed slots.** Tracks live in ``T`` fixed slots with a validity mask;
  measurements in ``M`` fixed slots.  Every op is fixed-shape, so the whole
  video forward is one ``lax.scan`` over frames.
* **No separate init step.** The reference special-cases frame 0
  (initialize_tracks, kalman.py:330); here frame 0 is the generic path --
  association against an all-invalid track set matches nothing and
  ``add_unused_measurements`` fills the empty slots.
* **Greedy association as a masked fori_loop** (reference loops numpy argmax
  + inf-poisoning, kalman.py:455-538): identical two-phase semantics --
  3D-center distance <= 0.5 m first, then 2D IoU >= best_thresh.
* **Kalman gain without matrix inverse**: H selects the first 8 state rows,
  so ``K = C[:, :8] (C[:8, :8] + R)^{-1}`` is one batched 8x8 solve.

Covariance semantics (differentially verified, round 3): the reference
builds every covariance from an [N, 8] broadcast -- zeroed Q/R plus
``lambda_o * (1 - un)`` over all 8 measured-state columns -- so the first
8 diagonal entries all carry the confidence-driven value and (8, 8) stays
1 (kalman.py:356, 625, 704 call sites into make_covariance_matrix
:363-374).  Also reproduced: a frame with tracks but ZERO associations
drops ALL tracks (reference update_tracks:612-614 sets the batch entry to
None; new tracks then respawn from that frame's measurements).  Track ids
here stay globally monotone where the reference restarts numbering after
such a reset -- a cosmetic divergence (ids only label the demo overlay).
Both behaviors are pinned against the reference's own torch code in
tests/test_kalman_differential.py.

State layout (V = 9): [x, y, z, w3d, h3d, l3d, theta, head, vel]
Measurement layout (16 cols, reference clean_and_denorm kalman.py:314-317):
  [x1, y1, x2, y2, score, cls, x, y, z, w3d, h3d, l3d, theta, head, un, vel]
"""

from __future__ import annotations

import math
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import project_3d_box
from ..ops.iou import pairwise_iou

NUM_VARS = 9
MEAS_COLS = 16

LAMBDA_O = 0.2   # confidence -> covariance scale (reference kalman.py:64)
K_P = 0.75       # missing-track confidence decay (kalman.py:65)
K_M = 0.05       # track kill threshold (kalman.py:66)
MATCH_DIST = 0.5


class Tracks(NamedTuple):
    """Fixed-slot track state for one batch element (leading dim T)."""

    valid: jnp.ndarray    # [T] bool
    ids: jnp.ndarray      # [T] int32 (-1 for empty)
    next_id: jnp.ndarray  # scalar int32
    X: jnp.ndarray        # [T, 9] state
    C: jnp.ndarray        # [T, 9, 9] covariance
    A: jnp.ndarray        # [T, 9, 9] transition
    box2d: jnp.ndarray    # [T, 6] x1 y1 x2 y2 score cls
    un: jnp.ndarray       # [T] confidence

    @staticmethod
    def empty(t: int) -> "Tracks":
        return Tracks(
            valid=jnp.zeros((t,), bool),
            ids=jnp.full((t,), -1, jnp.int32),
            next_id=jnp.zeros((), jnp.int32),
            X=jnp.zeros((t, NUM_VARS)),
            C=jnp.tile(jnp.eye(NUM_VARS)[None], (t, 1, 1)),
            A=jnp.tile(jnp.eye(NUM_VARS)[None], (t, 1, 1)),
            box2d=jnp.zeros((t, 6)),
            un=jnp.zeros((t,)),
        )


def make_transition_matrix(theta, head):
    """Velocity-along-heading transition (reference kalman.py:376-392)."""
    ry = theta + jnp.where(head >= 0.5, math.pi, 0.0)
    n = ry.shape[0]
    a = jnp.tile(jnp.eye(NUM_VARS)[None], (n, 1, 1))
    a = a.at[:, 0, 8].set(jnp.cos(ry))
    a = a.at[:, 2, 8].set(-jnp.sin(ry))
    return jax.lax.stop_gradient(a)


def make_covariance(vals, size=NUM_VARS, n_diag=8):
    """eye(size) with the first ``min(n_diag, size)`` diagonal entries set
    to ``vals`` [N].

    The reference's make_covariance_matrix (..._un_kalman.py:363-374)
    receives a broadcast [N, K] argument whose width K depends on the call
    site: K=8 for the initial covariance (``Q_cov[:-1]``, :356) and the
    measurement noise R (``R_cov``, :625) -- so the first 8 diagonal
    entries carry ``lambda_o * (1 - un)`` and (8, 8) stays 1 -- but K=9
    for the per-update process noise (full ``Q_cov``, :633), where ALL
    nine entries get ``1 - un_pre``.  Verified entry-for-entry against the
    reference's own torch code in tests/test_kalman_differential.py
    (round 3; rounds 1-2 set only the (0, 0) entry -- a transcription
    blind spot the differential caught).
    """
    n = vals.shape[0]
    k = min(n_diag, size)
    c = jnp.tile(jnp.eye(size)[None], (n, 1, 1))
    idx = jnp.arange(k)
    return c.at[:, idx, idx].set(vals[:, None])


def project_ego(tracks: Tracks, pose_dn, p2) -> Tracks:
    """Rigid-transform track states by the relative ego pose.

    pose_dn: [6] denormalised (tx, ty, tz, rx, ry, rz), euler angles;
    reference project_ego (kalman.py:407-453).
    """
    tx, ty, tz, rx, ry, rz = [pose_dn[i] for i in range(6)]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    rot_x = jnp.array([[1.0, 0, 0], [0, cx, -sx], [0, sx, cx]])
    rot_y = jnp.array([[cy, 0.0, sy], [0, 1, 0], [-sy, 0, cy]])
    rot_z = jnp.array([[cz, -sz, 0.0], [sz, cz, 0], [0, 0, 1]])
    rot = rot_z @ rot_y @ rot_x

    xyz = tracks.X[:, :3] @ rot.T + jnp.array([tx, ty, tz])
    x_new = tracks.X.at[:, :3].set(xyz).at[:, 6].add(ry)

    box2d = tracks.box2d.at[:, :4].set(
        project_3d_box(p2, x_new[:, 0], x_new[:, 1], x_new[:, 2],
                       x_new[:, 3], x_new[:, 4], x_new[:, 5], x_new[:, 6]))
    return tracks._replace(X=x_new, box2d=box2d)


def forecast_tracks(tracks: Tracks, p2) -> Tracks:
    """X <- A X; C <- A C A^T; refresh projected 2D boxes (kalman.py:541-596)."""
    x_new = jnp.einsum("tij,tj->ti", tracks.A, tracks.X)
    c_new = jnp.einsum("tij,tjk,tlk->til", tracks.A, tracks.C, tracks.A)
    box2d = tracks.box2d.at[:, :4].set(
        project_3d_box(p2, x_new[:, 0], x_new[:, 1], x_new[:, 2],
                       x_new[:, 3], x_new[:, 4], x_new[:, 5], x_new[:, 6]))
    return tracks._replace(X=x_new, C=c_new, box2d=box2d)


def _greedy_match(cost, pair_ok, thresh, minimize, match_t, used_m):
    """Greedy bipartite matching over a [T, M] cost with masking.

    Repeats (find global best pair, record, poison row+col) like the
    reference's double while loops (kalman.py:484-538).
    """
    t, m = cost.shape
    bad = jnp.inf if minimize else -jnp.inf
    cost = jnp.where(pair_ok, cost, bad)
    # poison already-matched rows/cols from a previous phase
    cost = jnp.where((match_t >= 0)[:, None] | used_m[None, :], bad, cost)

    def body(_, state):
        cost, match_t, used_m = state
        flat = cost.reshape(-1)
        best = jnp.argmin(flat) if minimize else jnp.argmax(flat)
        val = flat[best]
        ti, mi = best // m, best % m
        ok = (val <= thresh) if minimize else (val >= thresh)
        match_t = jnp.where(ok, match_t.at[ti].set(mi.astype(jnp.int32)),
                            match_t)
        used_m = jnp.where(ok, used_m.at[mi].set(True), used_m)
        row_poison = jnp.where(ok & (jnp.arange(t) == ti)[:, None], bad, cost)
        cost = jnp.where(ok & (jnp.arange(m) == mi)[None, :], bad, row_poison)
        return cost, match_t, used_m

    _, match_t, used_m = jax.lax.fori_loop(0, min(t, m), body,
                                           (cost, match_t, used_m))
    return match_t, used_m


def associate_tracks(tracks: Tracks, meas, meas_valid, best_thresh=0.35,
                     match_dist=MATCH_DIST):
    """Two-phase greedy association. Returns (match_t [T] int, used_m [M]).

    ``match_dist`` gates phase 1 (3D-center distance).  NOTE a reference
    quirk this port deliberately does NOT reproduce: the reference
    initialises ``match_thres = 0.5`` once per ``associate_tracks`` call
    but overwrites it with ``best_thresh`` before the IoU phase INSIDE its
    per-batch-element loop (kalman.py:457-515), so every element after the
    first runs the distance phase at ``best_thresh`` (0.35) -- in its
    batched eval that is almost every record.  Here every clip uses the
    intended 0.5 (= the reference's first element); pass
    ``match_dist=best_thresh`` to reproduce the leaked behaviour."""
    t = tracks.valid.shape[0]
    m = meas.shape[0]
    pair_ok = tracks.valid[:, None] & meas_valid[None, :]

    dist = jnp.sqrt(jnp.sum(
        (meas[None, :, 6:9] - tracks.X[:, None, :3]) ** 2, axis=-1))
    match_t = jnp.full((t,), -1, jnp.int32)
    used_m = jnp.zeros((m,), bool)
    match_t, used_m = _greedy_match(dist, pair_ok, match_dist, True,
                                    match_t, used_m)

    ols = pairwise_iou(tracks.box2d[:, :4], meas[:, :4])
    ols = jnp.nan_to_num(ols, nan=0.0)
    match_t, used_m = _greedy_match(ols, pair_ok, best_thresh, False,
                                    match_t, used_m)
    return match_t, used_m


def update_tracks(tracks: Tracks, meas, meas_valid, match_t) -> Tracks:
    """Kalman measurement update + track health bookkeeping.

    Reference update_tracks (kalman.py:599-672): gain from the blended
    confidences, 0.5/0.5 confidence mix, K_P decay for missed tracks, prune
    tracks with z <= 1 or confidence <= K_M.
    """
    matched = match_t >= 0
    mi = jnp.clip(match_t, 0)
    z_meas = meas[mi]                                 # [T, 16]
    un_meas = z_meas[:, 14] * z_meas[:, 4]
    un_pre = tracks.un

    # process-noise add: C_pre += diag(1 - un_pre) over ALL 9 state vars
    # (reference kalman.py:632; pinned by the round-3 kalman differential
    # -- see make_covariance's docstring for the transcription history)
    c_pre = tracks.C + make_covariance(1.0 - un_pre, n_diag=9)
    r = make_covariance(LAMBDA_O * (1.0 - un_meas), size=8)

    # H = I[:8], so HCH^T = C[:8,:8], C H^T = C[:, :8]
    s = c_pre[:, :8, :8] + r                          # innovation covariance
    k_gain = jnp.linalg.solve(
        jnp.swapaxes(s, 1, 2), jnp.swapaxes(c_pre[:, :, :8], 1, 2))
    k_gain = jnp.swapaxes(k_gain, 1, 2)               # [T, 9, 8]

    x_mea = z_meas[:, 6:14]                           # 8 measured state vars
    innov = x_mea - tracks.X[:, :8]
    x_final = tracks.X + jnp.einsum("tij,tj->ti", k_gain, innov)
    c_final = jnp.einsum(
        "tij,tjk->tik",
        jnp.eye(NUM_VARS)[None] - jnp.pad(k_gain, ((0, 0), (0, 0), (0, 1))),
        c_pre)

    upd = matched & tracks.valid
    x_new = jnp.where(upd[:, None], x_final, tracks.X)
    c_new = jnp.where(upd[:, None, None], c_final, tracks.C)
    un_new = jnp.where(upd, 0.5 * un_meas + 0.5 * un_pre,
                       tracks.un * jnp.where(tracks.valid, K_P, 1.0))
    box_new = jnp.where(upd[:, None], z_meas[:, :6], tracks.box2d)
    a_new = jnp.where(upd[:, None, None],
                      make_transition_matrix(x_new[:, 6], x_new[:, 7]),
                      tracks.A)

    # reference quirk (update_tracks:612-614): a frame with existing tracks
    # but NO associations sets the whole track batch to None -- every track
    # dies and this frame's measurements respawn fresh ones
    any_match = jnp.any(upd)
    healthy = tracks.valid & any_match & (x_new[:, 2] > 1.0) & (un_new > K_M)
    return tracks._replace(valid=healthy, X=x_new, C=c_new, A=a_new,
                           box2d=box_new, un=un_new)


def add_unused_measurements(tracks: Tracks, meas, meas_valid,
                            used_m) -> Tracks:
    """Start new tracks from unmatched measurements in free slots
    (kalman.py:675-761)."""
    t = tracks.valid.shape[0]
    new_mask = meas_valid & ~used_m                   # [M]
    # rank free slots and new measurements; assign k-th new meas to k-th slot
    free_rank = jnp.cumsum(~tracks.valid) - 1         # [T] rank among free
    new_rank = jnp.cumsum(new_mask) - 1               # [M]
    n_new = jnp.sum(new_mask)

    # slot t takes the measurement whose new_rank equals its free_rank
    want = jnp.where(~tracks.valid & (free_rank < n_new), free_rank, -1)
    order = jnp.argsort(jnp.where(new_mask, new_rank, meas.shape[0] + 1))
    m_sorted = order[:t] if t <= meas.shape[0] else jnp.pad(
        order, (0, t - meas.shape[0]))
    take = jnp.where(want >= 0, m_sorted[jnp.clip(want, 0)], 0)
    z = meas[take]

    fill = want >= 0
    un0 = z[:, 14] * z[:, 4]
    x0 = jnp.pad(z[:, 6:14], ((0, 0), (0, 1)))        # vel = 0
    a0 = make_transition_matrix(z[:, 12], z[:, 13])
    c0 = make_covariance(LAMBDA_O * (1.0 - un0))
    ids0 = tracks.next_id + jnp.where(fill, jnp.clip(want, 0), 0)

    return tracks._replace(
        valid=tracks.valid | fill,
        ids=jnp.where(fill, ids0.astype(jnp.int32), tracks.ids),
        next_id=tracks.next_id + n_new.astype(jnp.int32),
        X=jnp.where(fill[:, None], x0, tracks.X),
        C=jnp.where(fill[:, None, None], c0, tracks.C),
        A=jnp.where(fill[:, None, None], a0, tracks.A),
        box2d=jnp.where(fill[:, None], z[:, :6], tracks.box2d),
        un=jnp.where(fill, un0, tracks.un),
    )


def track_step(tracks: Tracks, meas, meas_valid, pose_dn, p2,
               best_thresh=0.35, apply_pose=True,
               match_dist=MATCH_DIST) -> Tracks:
    """One full tracker step: ego-project -> forecast -> associate ->
    update -> spawn.  Uniform across frames (frame 0 = empty tracks)."""
    if apply_pose:
        tracks = project_ego(tracks, pose_dn, p2)
    tracks = forecast_tracks(tracks, p2)
    match_t, used_m = associate_tracks(tracks, meas, meas_valid, best_thresh,
                                       match_dist)
    tracks = update_tracks(tracks, meas, meas_valid, match_t)
    tracks = add_unused_measurements(tracks, meas, meas_valid, used_m)
    return tracks


class PoseNet(nn.Module):
    """Spatially-attended 6-DoF relative ego pose from stacked trunk feats.

    Reference pose_forward (kalman.py:130-152): 3x3 conv on the channel-
    concat of two frames' trunk features, 1x1 pose + confidence heads,
    spatial softmax attention, weighted sum.
    """

    features: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats_pair):
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="pose_feats")(feats_pair)
        h = nn.relu(h)
        pose = nn.Conv(6, (1, 1), dtype=self.dtype, name="pose")(h)
        conf = nn.Conv(1, (1, 1), dtype=self.dtype, name="conf")(h)
        b, fh, fw, _ = conf.shape
        attn = jax.nn.softmax(conf.reshape(b, fh * fw), axis=-1)
        pose = pose.reshape(b, fh * fw, 6).astype(jnp.float32)
        return jnp.einsum("bs,bsc->bc", attn.astype(jnp.float32), pose)
