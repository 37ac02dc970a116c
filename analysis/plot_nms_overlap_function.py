"""Plot the GrooMeD-NMS pruning-function shapes p(o).

Capability match for the reference's plot/plot_nms_overlap_function.py:
linear, sigmoidal (several temperatures), and soft-NMS pruning curves.

Usage: python analysis/plot_nms_overlap_function.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from groomed_nms_tpu.ops.groomed_nms import pruning_function


def main(out_path="nms_overlap_function.png"):
    o = np.linspace(0, 1, 200)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(o, np.asarray(pruning_function(o, pruning_method="linear")),
            label="linear")
    for t in (0.05, 0.1, 0.2):
        ax.plot(o, np.asarray(pruning_function(
            o, nms_threshold=0.4, temperature=t,
            pruning_method="sigmoidal")), label=f"sigmoidal T={t}")
    for t in (0.1, 0.5):
        ax.plot(o, np.asarray(pruning_function(
            o, temperature=t, pruning_method="soft_nms")),
            label=f"soft_nms T={t}")
    ax.set_xlabel("overlap o")
    ax.set_ylabel("p(o)")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print("saved", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
