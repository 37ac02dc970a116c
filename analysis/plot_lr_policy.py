"""Plot learning-rate schedules (reference plot/plot_lr_policy.py).

Usage: python analysis/plot_lr_policy.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from groomed_nms_tpu.training import build_lr_schedule


def main(out_path="lr_policy.png"):
    steps = np.arange(0, 50000, 50)
    fig, ax = plt.subplots(figsize=(6, 4))
    poly = build_lr_schedule(0.004, 50000, "poly")
    step_s = build_lr_schedule(0.004, 50000, "step", lr_steps=[0.5, 0.8])
    warm = build_lr_schedule(0.004, 50000, "poly", warmup_iters=2000)
    ax.plot(steps, [float(poly(s)) for s in steps], label="poly 0.9")
    ax.plot(steps, [float(step_s(s)) for s in steps], label="step 0.5/0.8")
    ax.plot(steps, [float(warm(s)) for s in steps], label="poly + warmup")
    ax.set_xlabel("iteration")
    ax.set_ylabel("lr")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print("saved", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
