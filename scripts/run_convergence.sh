#!/bin/bash
# Long-run training driver with OOM babysitting for remote-TPU clients.
#
# Motivation (measured, round 5): the axon jax client pins host bytes for
# every `jax.device_put` until process exit -- a training loop feeding
# uint8 KITTI batches leaks ~21 MB/s of anonymous heap at batch 8 and
# would OOM a 125 GB host mid-run.  Upstream never hits this (torch
# DataLoader owns its pinned pool, reference lib/core.py), so the
# TPU-native rebuild carries the operational fix instead: run each stage
# under a restart loop that watches RSS and relaunches the trainer, which
# auto-resumes from the run dir's latest checkpoint (scripts/train.py).
#
# Kill policy:
#   RSS > SOFT_GB : arm -- wait until the run writes its NEXT snapshot,
#                   then kill+relaunch (a restart loses ~nothing).
#   RSS > HARD_GB : kill immediately (backstop before the kernel OOMs us).
#
# Usage:
#   scripts/run_convergence.sh <stage-log> <run-dir> -- <train.py args...>
# e.g.
#   scripts/run_convergence.sh /tmp/warmup.log output/kitti_3d_warmup -- \
#     --config kitti_3d_warmup --data-root data --output output
set -u

SOFT_GB=${SOFT_GB:-70}
HARD_GB=${HARD_GB:-95}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-10}
SOFT_KB=$((SOFT_GB * 1024 * 1024))
HARD_KB=$((HARD_GB * 1024 * 1024))

SLOG=$1; shift
RUN_DIR=$1; shift
[ "${1:-}" = "--" ] && shift
WDIR="$RUN_DIR/weights"

latest_ckpt () {
  ls "$WDIR" 2>/dev/null | sed -n 's/^checkpoint_//p' | sort -n | tail -1
}

watch_pid () {
  local pid=$1
  local armed=0 armed_ckpt=
  while kill -0 "$pid" 2>/dev/null; do
    sleep 20
    local rss
    rss=$(awk '/VmRSS/{print $2}' "/proc/$pid/status" 2>/dev/null || echo 0)
    rss=${rss:-0}
    if [ "$rss" -gt "$HARD_KB" ]; then
      echo "$(date) babysitter: rss ${rss}kB > ${HARD_GB}GB hard cap, killing" >&2
      kill "$pid"; sleep 10; kill -9 "$pid" 2>/dev/null
    elif [ "$rss" -gt "$SOFT_KB" ]; then
      local ck
      ck=$(latest_ckpt)
      if [ "$armed" = 0 ]; then
        armed=1; armed_ckpt=$ck
        echo "$(date) babysitter: rss ${rss}kB > ${SOFT_GB}GB soft cap," \
             "waiting for next snapshot (have ${ck:-none})" >&2
      elif [ "${ck:-0}" != "${armed_ckpt:-0}" ]; then
        echo "$(date) babysitter: snapshot ${ck} landed, restarting" >&2
        kill "$pid"; sleep 10; kill -9 "$pid" 2>/dev/null
      fi
    fi
  done
}

attempt=0
while true; do
  attempt=$((attempt + 1))
  echo "$(date) babysitter: attempt $attempt: python scripts/train.py $*" >&2
  python -u scripts/train.py "$@" >> "$SLOG" 2>&1 &
  pid=$!
  watch_pid "$pid"
  wait "$pid"
  rc=$?
  if grep -aq "training done at iter" "$SLOG"; then
    echo "$(date) babysitter: stage complete (rc=$rc)" >&2
    exit 0
  fi
  if [ "$attempt" -ge "$MAX_ATTEMPTS" ]; then
    echo "$(date) babysitter: FAILED after $attempt attempts (rc=$rc)" >&2
    exit 1
  fi
  echo "$(date) babysitter: attempt $attempt exited rc=$rc, resuming" >&2
  sleep 5
done
