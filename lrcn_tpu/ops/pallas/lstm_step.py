"""Pallas TPU kernel: fully fused LSTM step.

One kernel computes, per (batch-tile, hidden-tile) grid cell, all four gate
matmuls plus the cell update:

    gates_g = [x, h] @ W_g + b_g          (4 MXU dots, f32 accumulation)
    c' = sigmoid(f) * c + sigmoid(i) * tanh(g)
    h' = sigmoid(o) * tanh(c')

vs. the XLA path (ops/lstm.py): XLA fuses the bias/slice/sigmoid epilogue
into the big (B, X+H) @ (X+H, 4H) dot, but the (B, 4H) pre-activation still
round-trips through HBM before the cell update reads it.  Here gate tiles
stay in VMEM registers from MXU to VPU — the only HBM traffic is the
operands and the (B, H) outputs, the speed-of-light minimum for this op.

The kernel tiles the gate dimension: grid cell (i, j) loads weight columns
[j*TH, (j+1)*TH) of each gate's (X+H, H) weight panel, so VMEM holds
4 * (X+H, TH) weight tiles + one (TB, X+H) activation tile (~3 MB at
reference scale, well under the ~16 MB budget).

Used on the inference/decode path (no VJP defined — training uses the XLA
scan in models/lrcn.py, where the input projection is hoisted out of the
recurrence; see ops/lstm.py).

Reference cell semantics: lrcn.jl:528-538 (packed (X+H, 4H) weights, gate
order [forget, ingate, outgate, change], ``hcat(input, hidden) * W .+ b``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def pallas_available() -> bool:
    """Pallas TPU kernels need a real TPU backend (or interpret mode)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(xh_ref, wf_ref, wi_ref, wo_ref, wg_ref, b_ref, c_ref,
            h_out_ref, c_out_ref):
    xh = xh_ref[:]
    dot = lambda w_ref: jax.lax.dot(
        xh, w_ref[:], preferred_element_type=jnp.float32)
    b = b_ref[:].astype(jnp.float32)           # (4, TH)
    f = jax.nn.sigmoid(dot(wf_ref) + b[0])
    i = jax.nn.sigmoid(dot(wi_ref) + b[1])
    o = jax.nn.sigmoid(dot(wo_ref) + b[2])
    g = jnp.tanh(dot(wg_ref) + b[3])
    c_new = c_ref[:] * f + i * g               # lrcn.jl:535
    h_out_ref[:] = o * jnp.tanh(c_new)         # lrcn.jl:536
    c_out_ref[:] = c_new


def fused_lstm_step_fn(w: jax.Array, b: jax.Array, h: jax.Array,
                       c: jax.Array, x: jax.Array, *,
                       compute_dtype=jnp.bfloat16,
                       interpret: bool = False
                       ) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ``ops.lstm.lstm_step`` as one Pallas kernel.

    Args:
      w: (X+H, 4H) packed weights, gate order [f, i, o, g] (lrcn.jl:531-534).
      b: (4H,) bias.  h, c: (B, H) float32 state.  x: (B, X) inputs.

    Returns (h', c'), float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_dim, x_dim = x.shape
    h_dim = c.shape[-1]
    if w.shape != (x_dim + h_dim, 4 * h_dim):
        raise ValueError(f"w {w.shape} != ({x_dim + h_dim}, {4 * h_dim})")

    # Pad every dimension to hardware tiles; padded weight rows are zero so
    # padded xh columns contribute nothing.  Operands are cast to the
    # compute dtype OUTSIDE the kernel so VMEM tiles are compute-width
    # (a bf16 weight tile is half the f32 footprint); accumulation stays
    # f32 via preferred_element_type.
    compute_dtype = jnp.dtype(compute_dtype)
    xh = jnp.concatenate(
        [x.astype(compute_dtype), h.astype(compute_dtype)], axis=1)
    xh_p = _round_up(x_dim + h_dim, 128)
    h_p = _round_up(h_dim, 128)
    tile_b = 128 if b_dim > 8 else 8
    b_p = _round_up(b_dim, tile_b)
    # VMEM budget (~16 MB with double buffering): 4 weight panels of
    # (xh_p, tile_h) dominate.
    tile_h = min(h_p, 256 if compute_dtype.itemsize <= 2 else 128)

    xh = jnp.pad(xh, ((0, b_p - b_dim), (0, xh_p - (x_dim + h_dim))))
    # (X+H, 4, H) -> per-gate panels, padded.
    w4 = w.astype(compute_dtype).reshape(x_dim + h_dim, 4, h_dim)
    w4 = jnp.pad(w4, ((0, xh_p - (x_dim + h_dim)), (0, 0),
                      (0, h_p - h_dim)))
    b4 = jnp.pad(b.astype(jnp.float32).reshape(4, h_dim),
                 ((0, 0), (0, h_p - h_dim)))
    c_pad = jnp.pad(c, ((0, b_p - b_dim), (0, h_p - h_dim)))

    grid = (b_p // tile_b, h_p // tile_h)
    w_spec = lambda _g: pl.BlockSpec(
        (xh_p, tile_h), lambda i, j: (0, j), memory_space=pltpu.VMEM)

    h_new, c_new = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, xh_p), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            w_spec(0), w_spec(1), w_spec(2), w_spec(3),
            pl.BlockSpec((4, tile_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, tile_h), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, tile_h), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, tile_h), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_p, h_p), jnp.float32),
            jax.ShapeDtypeStruct((b_p, h_p), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_p * xh_p * 4 * h_p,
            bytes_accessed=(b_p * xh_p * compute_dtype.itemsize
                            + xh_p * 4 * h_p * compute_dtype.itemsize
                            + 3 * b_p * h_p * 4),
            transcendentals=4 * b_p * h_p,
        ),
        interpret=interpret,
    )(
        xh,
        w4[:, 0:1, :].squeeze(1), w4[:, 1:2, :].squeeze(1),
        w4[:, 2:3, :].squeeze(1), w4[:, 3:4, :].squeeze(1),
        b4, c_pad,
    )
    return h_new[:b_dim, :h_dim], c_new[:b_dim, :h_dim]


fused_lstm_step = jax.jit(
    fused_lstm_step_fn, static_argnames=("compute_dtype", "interpret"))
