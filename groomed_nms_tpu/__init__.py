"""GrooMeD-NMS-TPU: a TPU-native monocular 3D object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the GrooMeD-NMS
reference (CVPR 2021, abhi1kumar/groomed_nms): a single-stage anchor-based
3D RPN for KITTI with a grouped, mathematically differentiable NMS inside
the training loss.

Design stance (TPU-first, not a port):
  * every compute-path function is fixed-shape and jittable; ragged data is
    padded + masked, never looped over in Python;
  * the GrooMeD-NMS operator is a masked `lax.while_loop` grouping plus a
    closed-form rescore (shipped masked mode) or a unit-lower-triangular
    solve (ablation modes) -- no explicit matrix inverse anywhere;
  * batching is `vmap`, multi-chip is `jax.sharding.Mesh` + jit shardings;
  * host code exists only to parse KITTI files and write result txt.
"""

__version__ = "0.1.0"
