"""Host-side stat tracker + log line rendering.

Capability match for the reference's stat-tracker protocol
(lib/core.py:670-825): per-display-window mean aggregation of named scalar
groups plus wall-clock ETA, rendered as one log line.
"""

from __future__ import annotations

import time
from collections import defaultdict


class StatTracker:
    def __init__(self, max_iter, display=100, start_iter=0):
        self.max_iter = max_iter
        self.display = display
        # dt/ETA measure THIS process's progress: a resumed run starts its
        # clock at start_iter, not 0 (else dt is off by resumed/elapsed)
        self.start_iter = start_iter
        self.start = time.time()
        self.reset()

    def reset(self):
        self._pending = defaultdict(list)

    def update(self, stats: dict):
        # stash raw values WITHOUT float(): converting a device scalar
        # blocks until the step's results are ready, serialising host
        # dispatch against device compute every iteration (the remote-
        # tunnel dispatch latency only amortises with a deep async
        # queue); conversion happens once per display window in means()
        for k, v in stats.items():
            self._pending[k].append(v)

    def means(self):
        # ONE bulk device_get of the whole stash: jax issues the host
        # copies for every leaf asynchronously before blocking, so the
        # display pays ~one round trip total. Per-value float() here would
        # be display*n_stats SEQUENTIAL round trips -- measured 40+ s per
        # 100-iter window over the remote-dispatch tunnel, silently
        # dominating the training loop's wall clock.
        import jax

        import numpy as np

        pend = jax.device_get({k: list(vs)
                               for k, vs in self._pending.items()})
        # values may be scalars (one step per update) or [K] vectors
        # (multi-step dispatch, training.scan_steps): mean over every
        # recorded inner step either way
        return {k: float(np.mean(np.concatenate(
                    [np.atleast_1d(np.asarray(v, np.float64)) for v in vs])))
                if vs else 0.0
                for k, vs in pend.items()}

    def log_line_and_means(self, iteration, lr=None):
        """One means() pull shared by the log line and the CSV row."""
        means = self.means()
        return self._render(iteration, means, lr), means

    def eta(self, iteration):
        done = max(iteration - self.start_iter, 1)
        dt = (time.time() - self.start) / done
        remaining = dt * (self.max_iter - iteration)
        h, rem = divmod(int(remaining), 3600)
        m, s = divmod(rem, 60)
        return f"{h}h{m}m{s}s", dt

    def log_line(self, iteration, lr=None):
        return self._render(iteration, self.means(), lr)

    def _render(self, iteration, means, lr=None):
        eta, dt = self.eta(iteration)
        parts = [f"iter: {iteration}"]
        for k in sorted(means):
            parts.append(f"{k}: {means[k]:.4f}")
        if lr is not None:
            parts.append(f"lr: {lr:.6f}")
        parts.append(f"dt: {dt:.3f}")
        parts.append(f"eta: {eta}")
        return ", ".join(parts)


def param_summary(params, grads=None):
    """Per-parameter mean/abs-mean (+grad abs-mean) lines.

    Capability match for the reference's print_weights debugger
    (lib/core.py:981-1001); the GC tensor-leak walker (check_tensors,
    lib/core.py:912-922) has no JAX analog -- buffers are managed by XLA --
    so live-buffer stats come from jax.live_arrays().
    """
    import jax
    import jax.numpy as jnp

    lines = []

    def visit(path, p, g):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        line = f"{name}: shape={tuple(p.shape)} mean={float(jnp.mean(p)):+.5f}"
        if g is not None:
            line += f" |grad|={float(jnp.mean(jnp.abs(g))):.6f}"
        lines.append(line)

    if grads is None:
        jax.tree_util.tree_map_with_path(lambda pa, p: visit(pa, p, None),
                                         params)
    else:
        jax.tree_util.tree_map_with_path(visit, params, grads)
    return lines


def live_buffer_stats():
    """Total count/bytes of live device arrays (leak debugging)."""
    import jax

    arrays = jax.live_arrays()
    total = sum(a.size * a.dtype.itemsize for a in arrays)
    return {"count": len(arrays), "bytes": total}


class MetricsCSV:
    """Append-only CSV metrics log (the plot-friendly replacement for the
    reference's optional visdom dashboards, lib/core.py:730-780)."""

    def __init__(self, path):
        self.path = path
        self._keys = None

    def append(self, iteration, stats: dict):
        import os
        keys = sorted(stats)
        if self._keys is None:
            if os.path.exists(self.path):
                with open(self.path) as f:
                    header = f.readline().strip().split(",")
                if header[:1] == ["iter"] and header[1:] == keys:
                    self._keys = keys   # resuming with the same stat set
                else:
                    # stat set changed across runs (e.g. a new loss term):
                    # rotate the old file so appended rows never sit under
                    # a header with different columns
                    n = 1
                    while os.path.exists(f"{self.path}.{n}"):
                        n += 1
                    os.replace(self.path, f"{self.path}.{n}")
            if self._keys is None:
                self._keys = keys
                with open(self.path, "w") as f:
                    f.write("iter," + ",".join(keys) + "\n")
        with open(self.path, "a") as f:
            # rows follow the HEADER's column order; keys missing from this
            # window are left empty (the dashboard reader is partial-row
            # tolerant), unexpected new keys are dropped
            row = ",".join(f"{float(stats[k]):.6f}" if k in stats else ""
                           for k in self._keys)
            f.write(f"{iteration},{row}\n")
