"""Pallas TPU kernel: batched tiny-SPD Cholesky solve for the LM normal
equations.

The damped normal equations of one social-MPC solve are a DxD SPD system
with D = 2 * n_blocks (6 for the benchmark config, 12 for the H=36 stress
config) — far below the MXU tile. XLA's vmapped `cho_solve` dispatches
batched LAPACK-style loops; this kernel instead lays the BATCH along the
128-wide lane axis (struct-of-arrays: A as (D*D, N), b as (D, N)) and runs a
fully unrolled Cholesky + two triangular substitutions as (1, N)-wide VPU
vector ops — thousands of factorizations per grid step, zero lane waste.

Integration: `spd_solve(a, b)` is a `jax.custom_batching.custom_vmap`
function. Unbatched it is a plain `cho_solve`; under `vmap` (i.e. inside the
batched LM solver) the batching rule fires ONCE with the full (N, D, D)
batch and dispatches this kernel. f64 or non-TPU backends fall back to the
XLA path automatically (the kernel itself still runs under
`interpret=True` for CPU testing).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 512  # lanes per grid step (multiple of 128)


def _cholesky_solve_kernel(d: int, a_ref, b_ref, x_ref):
    """Solve A x = b for one lane-block.

    a_ref: (d*d, BN) row-major A entries; b_ref: (d, BN); x_ref: (d, BN).
    Fully unrolled in d (static): every L entry is a (1, BN) vector row.
    """

    def a(i, j):
        return a_ref[i * d + j, :]

    # Cholesky factorization A = L L^T (row vectors over the lane block)
    el = {}
    inv_diag = {}
    for j in range(d):
        s = a(j, j)
        for k in range(j):
            s = s - el[(j, k)] * el[(j, k)]
        ljj = jnp.sqrt(s)
        el[(j, j)] = ljj
        inv_diag[j] = 1.0 / ljj
        for i in range(j + 1, d):
            s = a(i, j)
            for k in range(j):
                s = s - el[(i, k)] * el[(j, k)]
            el[(i, j)] = s * inv_diag[j]

    # Forward substitution L y = b
    y = {}
    for i in range(d):
        s = b_ref[i, :]
        for k in range(i):
            s = s - el[(i, k)] * y[k]
        y[i] = s * inv_diag[i]

    # Back substitution L^T x = y
    x = {}
    for i in reversed(range(d)):
        s = y[i]
        for k in range(i + 1, d):
            s = s - el[(k, i)] * x[k]
        x[i] = s * inv_diag[i]

    for i in range(d):
        x_ref[i, :] = x[i]


def batched_spd_solve_pallas(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Solve N independent SPD systems. a: (N, D, D); b: (N, D) -> (N, D)."""
    n, d, _ = a.shape
    dtype = a.dtype

    n_pad = -(-n // LANE_BLOCK) * LANE_BLOCK
    # SoA layout: batch on lanes
    a_t = jnp.transpose(a, (1, 2, 0)).reshape(d * d, n)
    b_t = jnp.transpose(b, (1, 0))
    if n_pad != n:
        # Pad with identity systems so the padded lanes stay finite.
        eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype).reshape(d * d, 1), (d * d, n_pad - n))
        a_t = jnp.concatenate([a_t, eye], axis=1)
        b_t = jnp.concatenate([b_t, jnp.zeros((d, n_pad - n), dtype)], axis=1)

    grid = (n_pad // LANE_BLOCK,)
    x_t = pl.pallas_call(
        functools.partial(_cholesky_solve_kernel, d),
        out_shape=jax.ShapeDtypeStruct((d, n_pad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d * d, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_t, b_t)
    return jnp.transpose(x_t[:, :n], (1, 0))


def _xla_spd_solve(a, b):
    return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(a), b)


@jax.custom_batching.custom_vmap
def spd_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SPD solve with a batch-aware TPU fast path. a: (D, D); b: (D,)."""
    return _xla_spd_solve(a, b)


@spd_solve.def_vmap
def _spd_solve_vmap_rule(axis_size, in_batched, a, b):
    a_batched, b_batched = in_batched
    if not (a_batched and b_batched):
        # Shared operand across the batch: defer to the XLA path.
        av = a if a_batched else jnp.broadcast_to(a, (axis_size,) + a.shape)
        bv = b if b_batched else jnp.broadcast_to(b, (axis_size,) + b.shape)
        return jax.vmap(_xla_spd_solve)(av, bv), True
    use_pallas = (
        a.dtype == jnp.float32
        and a.ndim == 3  # no nested batching
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        return batched_spd_solve_pallas(a, b), True
    return jax.vmap(_xla_spd_solve)(a, b), True
