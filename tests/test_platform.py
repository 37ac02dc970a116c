"""Timing-discipline utilities (groomed_nms_tpu/platform.py).

The round-4 audit found ``jax.block_until_ready`` is NOT a completion
barrier on the remote-dispatch runtime, which let bench.py record a
physically impossible 15,483 img/s (~930 TFLOP/s on a 197 TFLOP/s chip).
The fix (forced host readouts + a FLOP-rate plausibility guard) is the
round-5 keystone; these tests pin its contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groomed_nms_tpu.platform import (V5E_BF16_PEAK_TFLOPS,
                                      check_physical_rate, cost_flops,
                                      readout)


def test_readout_returns_host_arrays():
    tree = {"a": jnp.arange(4.0), "b": (jnp.ones((2, 3)), 7)}
    out = readout(tree)
    assert isinstance(out["a"], np.ndarray)
    assert isinstance(out["b"][0], np.ndarray)
    np.testing.assert_allclose(out["a"], np.arange(4.0))
    # plain python leaves pass through untouched
    assert out["b"][1] == 7


def test_cost_flops_positive_for_matmul():
    a = jnp.ones((64, 64), jnp.float32)
    compiled = jax.jit(lambda x: x @ x).lower(a).compile()
    flops = cost_flops(compiled)
    # 64^3 MACs = 2*64^3 flops; cost analysis conventions vary by factor
    # ~2 across backends, so only pin the magnitude
    assert flops >= 64 ** 3


def test_check_physical_rate_rejects_impossible_timing():
    # 1e15 flops/call, 100 calls in 0.1 s -> 1e6 TFLOP/s: the round-4
    # artifact's shape.  Must refuse loudly, never return a number.
    with pytest.raises(SystemExit, match="physically impossible"):
        check_physical_rate(1e15, 100, 0.1, label="unit",
                            peak_tflops=V5E_BF16_PEAK_TFLOPS)


def test_check_physical_rate_accepts_real_timing():
    # ~1 TFLOP/s implied: fine on a 197 TFLOP/s chip
    implied = check_physical_rate(1e12, 10, 10.0, label="unit",
                                  peak_tflops=V5E_BF16_PEAK_TFLOPS)
    assert implied == pytest.approx(1.0)


def test_check_physical_rate_skips_on_cpu_backend():
    # without an explicit peak the guard only applies on TPU backends;
    # the test suite runs on the forced-CPU mesh
    assert jax.default_backend() == "cpu"
    assert check_physical_rate(1e30, 1, 1e-9) is None
