"""Host-side stat tracker + log line rendering.

Capability match for the reference's stat-tracker protocol
(lib/core.py:670-825): per-display-window mean aggregation of named scalar
groups plus wall-clock ETA, rendered as one log line.
"""

from __future__ import annotations

import time
from collections import defaultdict


class StatTracker:
    def __init__(self, max_iter, display=100):
        self.max_iter = max_iter
        self.display = display
        self.start = time.time()
        self.reset()

    def reset(self):
        self.sums = defaultdict(float)
        self.counts = defaultdict(int)

    def update(self, stats: dict):
        for k, v in stats.items():
            self.sums[k] += float(v)
            self.counts[k] += 1

    def means(self):
        return {k: self.sums[k] / max(self.counts[k], 1) for k in self.sums}

    def eta(self, iteration):
        dt = (time.time() - self.start) / max(iteration, 1)
        remaining = dt * (self.max_iter - iteration)
        h, rem = divmod(int(remaining), 3600)
        m, s = divmod(rem, 60)
        return f"{h}h{m}m{s}s", dt

    def log_line(self, iteration, lr=None):
        means = self.means()
        eta, dt = self.eta(iteration)
        parts = [f"iter: {iteration}"]
        for k in sorted(means):
            parts.append(f"{k}: {means[k]:.4f}")
        if lr is not None:
            parts.append(f"lr: {lr:.6f}")
        parts.append(f"dt: {dt:.3f}")
        parts.append(f"eta: {eta}")
        return ", ".join(parts)
