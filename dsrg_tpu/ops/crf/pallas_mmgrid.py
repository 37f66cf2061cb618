"""Fused Pallas TPU kernels for the matmul-bilateral-grid CRF hot loop.

The XLA mmgrid path materializes two (T, tile_px, gc*C) intermediates in HBM
every filter application: the splat operand ``u = (v tiled) * wr_exp`` and
the slice product ``tt = wbg @ slab`` (~280 MB round trips per iteration at
321^2).  These kernels keep both entirely in VMEM:

  * ``slice_fused``:  out = sum_mat^T @ ((wbg @ slab) * wr_exp)^T — one MXU
    matmul into VMEM scratch, elementwise weighting, and a second small MXU
    contraction, all per spatial tile.
  * ``splat_fused``:  g2 = wbg^T @ ((v^T @ tile_mat) * wr_exp)   — the exact
    transpose, built in VMEM from the (C, tile_px) values.

Values cross the kernel boundary **channel-first** (T, C, px): a (T, px, C)
fp32 array pads its 21-channel minor dim to the 128-lane tile — a 6x HBM
blowup on every read/write — while (T, C, px) keeps the wide px dim minor.
The in-kernel transposes are free (dot_general contracting dims).

Per-program VMEM: ~6 MB at production geometry (tile_px=1600, gc=21, C=21),
well under the 16 MB budget.  Numerics are identical to the XLA path modulo
bf16 rounding of the fused intermediate (validated in tests/test_mmgrid.py).

Used automatically by ``MMGridPlan.filter_cf`` on TPU (interpret mode when
the backend is CPU, so the unit tests run the same code path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _wre(wrt_ref, expand_ref):
    """(gc, px) r-weights + (gc, Q) static 0/1 expand -> (px, Q) in VMEM.

    Rebuilding the expanded r-weight operand per tile (a 15M-MAC matmul)
    replaces streaming a 114 MB (T, px, Q) array from HBM twice per filter.
    """
    return jax.lax.dot_general(
        wrt_ref[0], expand_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )


def _slice_kernel(wbg_ref, slab_ref, wrt_ref, expand_ref, sum_ref, out_ref):
    tt = jnp.dot(wbg_ref[0], slab_ref[0], preferred_element_type=_F32)  # (px, Q)
    # epilogue stays fp32 (tiny matmul): matches the XLA path bit-for-bit
    # modulo summation order, no extra bf16 rounding of tt
    weighted = tt * _wre(wrt_ref, expand_ref)
    # (C, px) = contract Q: sum_mat (Q, C) x weighted (px, Q)
    out_ref[0] = jax.lax.dot_general(
        sum_ref[:].astype(_F32), weighted,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=_F32,
    )


def _splat_kernel(wbg_ref, v_ref, wrt_ref, expand_ref, tile_ref, out_ref):
    # (px, Q) = contract C: v (C, px) x tile_mat (C, Q)
    u = jax.lax.dot_general(
        v_ref[0].astype(_BF16), tile_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )
    u = (u * _wre(wrt_ref, expand_ref)).astype(_BF16)
    # contract over pixels: (gc^2, px) @ (px, gc*C)
    out_ref[0] = jax.lax.dot_general(
        wbg_ref[0], u,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=())
def slice_fused(wbg, slab, wr_t, expand, sum_mat):
    """(T, px, B) bf16, (T, B, Q) bf16, (T, gc, px) bf16, (gc, Q), (Q, C)
    -> (T, C, px) f32."""
    t, px, b = wbg.shape
    q = slab.shape[-1]
    gc = wr_t.shape[1]
    c = sum_mat.shape[-1]
    grid = (t,)
    return pl.pallas_call(
        _slice_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, px, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gc, px), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gc, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, px), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c, px), _F32),
        interpret=_interpret(),
    )(wbg, slab, wr_t, expand, sum_mat)


@functools.partial(jax.jit, static_argnames=())
def splat_fused(wbg, values, wr_t, expand, tile_mat):
    """(T, px, B) bf16, (T, C, px) f32, (T, gc, px) bf16, (gc, Q), (C, Q)
    -> (T, B, Q) f32."""
    t, px, b = wbg.shape
    c = values.shape[1]
    gc = wr_t.shape[1]
    q = tile_mat.shape[-1]
    return pl.pallas_call(
        _splat_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, px, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, px), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gc, px), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gc, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, q), _F32),
        interpret=_interpret(),
    )(wbg, values, wr_t, expand, tile_mat)
