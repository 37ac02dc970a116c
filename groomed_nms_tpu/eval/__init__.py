"""Evaluation layer: KITTI AP via the single parameterized C++ binary.

Capability match for the reference's evaluation stack
(lib/rpn_util.py:2013-2251 + data/*/devkit/cpp, 30 compiled binaries) with
one binary + CLI flags.  A pure-numpy twin of the protocol lives in
:mod:`ap_numpy` as the test oracle.
"""

from .kitti_eval import (ap_from_precision, ensure_binary, parse_stats_file,
                         run_kitti_eval, evaluate_kitti_results_verbose)

__all__ = ["ensure_binary", "run_kitti_eval", "parse_stats_file",
           "ap_from_precision", "evaluate_kitti_results_verbose",
           "test_kitti_3d"]


def __getattr__(name):
    # lazy: tester pulls in jax/model deps the light eval helpers don't need
    if name == "test_kitti_3d":
        from .tester import test_kitti_3d
        return test_kitti_3d
    raise AttributeError(name)
