"""Experiment runtime: train state, schedules, steps, checkpoints, logging.

Capability match for the reference's lib/core.py + lib/train_test.py
(init_training_model, adjust_lr, loss_backprop, save/resume_checkpoint,
log_stats/compute_stats), re-built around a functional TrainState and a
single jitted train step.
"""

from .schedules import build_lr_schedule
from .trainer import TrainState, build_optimizer, create_train_state, \
    fuse_preprocess, make_train_step, make_video_train_step, scan_steps
from .checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint
from .stats import StatTracker

__all__ = ["build_lr_schedule", "TrainState", "build_optimizer",
           "create_train_state", "fuse_preprocess", "make_train_step",
           "make_video_train_step", "scan_steps",
           "save_checkpoint",
           "restore_checkpoint", "latest_checkpoint", "StatTracker"]
