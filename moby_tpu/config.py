"""Global numeric configuration.

The simulation core is dtype-polymorphic: every kernel preserves the dtype of
its inputs. Scene/state builders consult :func:`default_dtype`.

On CPU (regression testing vs. the reference's golden trajectories, which were
produced in double precision) we run float64; on TPU hardware (which has no
native f64) we run float32 with `precision=HIGHEST` matmuls, which is what the
benchmarks use. `NEAR_ZERO` mirrors the reference's constant
(`include/Moby/Constants.h:21`, sqrt(machine eps)) and is resolved per-dtype.
"""

from __future__ import annotations

import numpy as np
import jax

# Reference: include/Moby/Constants.h:21  (sqrt of double-precision epsilon)
NEAR_ZERO_F64 = float(np.sqrt(np.finfo(np.float64).eps))
NEAR_ZERO_F32 = float(np.sqrt(np.finfo(np.float32).eps))


def default_dtype():
    """float64 when x64 is enabled (CPU regression mode), else float32."""
    return np.float64 if jax.config.jax_enable_x64 else np.float32


def near_zero(dtype) -> float:
    """Dtype-appropriate NEAR_ZERO (sqrt eps), mirroring Moby's constant."""
    if np.dtype(dtype) == np.float64:
        return NEAR_ZERO_F64
    return NEAR_ZERO_F32


def enable_x64_cpu():
    """Switch JAX to the CPU backend with float64 (regression-test mode)."""
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
