"""Pallas TPU kernel: fused 3x3 conv + bias + ReLU for VGG blocks.

Profiling the XLA VGG forward on TPU shows the convolutions' bias+ReLU
epilogues run as SEPARATE elementwise kernels, re-reading and re-writing
every feature map (the 224^2 early maps are GBs per batch) — ~40% of device
time.  XLA cannot fuse into its conv custom-call; this kernel can:

    y = relu(conv3x3(x, w) + b)        [cross-correlation, pad 1, stride 1]

computed as 9 shifted MXU matmuls over a row-strip of the image:

- the spatially padded input stays in HBM (``pltpu.ANY``); each grid step
  DMAs a (TH+2, W+2, C) halo'd strip into VMEM scratch;
- for each kernel tap (dy, dx): a (TH*(W+2), C) @ (C, F) dot over the
  strip, accumulated into an f32 VMEM accumulator after a dx-column shift;
- bias + ReLU + cast run on the accumulator while it is still in VMEM,
  and only the final bf16 tile is written back.

HBM traffic per layer is exactly input + weights + bf16 output — the
speed-of-light minimum.  Available for the VGG conv stack via
``use_pallas=True`` (reference conv semantics: Knet conv4 mode=1, pad=1,
lrcn.jl:724).

STATUS: numerically verified (interpret mode tests + on-chip vs XLA,
maxerr ~bf16 rounding), compiles quickly with <=8-row strips (taller
strips explode Mosaic compile time: th=28 ~38s vs th=8 ~1s), but measured
SLOWER than XLA's conv custom-call at VGG shapes on v5e (e.g. conv1_2
B=64: 18.6ms vs 9.9ms; conv4_3: 15.5ms vs 4.0ms) — the 9-tap matmul
formulation cannot match XLA's dedicated conv codegen, and the fused
epilogue does not make up the difference.  Kept as opt-in infrastructure
(``use_pallas=True``) and as the measured record of why the XLA conv path
is the right default on current hardware.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_th(h: int, w: int, c: int, f: int) -> int:
    """Row-strip height: the largest divisor of h that is <= 8.

    Mosaic compile time explodes with taller strips (measured: th=28
    compiles in ~38s, th=8 in ~1s for identical C/F) — the unrolled
    dy-shifted slices of a tall strip force large sublane relayouts.
    Strips of <= 8 rows are also comfortably within VMEM for every VGG
    layer shape.
    """
    for th in range(min(8, h), 0, -1):
        if h % th == 0:
            return th
    return 1


def fused_conv3x3_relu_fn(x: jax.Array, w: jax.Array, b: jax.Array, *,
                          compute_dtype=jnp.bfloat16,
                          apply_relu: bool = True,
                          interpret: bool = False) -> jax.Array:
    """y = relu(conv3x3(x, w) + b), NHWC/HWIO, pad 1, stride 1.

    x: (B, H, W, C); w: (3, 3, C, F); b: (F,).  Returns (B, H, W, F) in
    ``compute_dtype``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_dim, h, w_dim, c = x.shape
    if w.shape[:3] != (3, 3, c):
        raise ValueError(f"w {w.shape} incompatible with x {x.shape}")
    f = w.shape[-1]
    compute_dtype = jnp.dtype(compute_dtype)

    # Spatial pad by 1 (reference pad=1, lrcn.jl:724); lane-pad channels;
    # the padded width must be 8-aligned for Mosaic's DMA slice tiling
    # (extra right columns are zeros, sliced away from the output).
    c_p = _round_up(c, 128)
    f_p = _round_up(f, 128)
    wp2 = _round_up(w_dim + 2, 8)
    x_pad = jnp.pad(x.astype(compute_dtype),
                    ((0, 0), (1, 1), (1, wp2 - w_dim - 1), (0, c_p - c)))
    w_pad = jnp.pad(w.astype(compute_dtype),
                    ((0, 0), (0, 0), (0, c_p - c), (0, f_p - f)))
    b_pad = jnp.pad(b.astype(jnp.float32), (0, f_p - f)).reshape(1, f_p)

    th = _pick_th(h, w_dim, c_p, f_p)
    grid = (b_dim, h // th)

    def kernel(x_hbm, w_ref, b_ref, out_ref, strip, sem):
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(hi * th, th + 2)], strip, sem)
        copy.start()
        copy.wait()

        # 9 shifted matmuls accumulated in f32 (dy/dx are Python ints:
        # the taps unroll at trace time, slices are static).
        acc = jnp.zeros((th, w_dim, f_p), jnp.float32)
        for dy in range(3):
            rows = strip[dy:dy + th]                    # (TH, W+2, C)
            flat = rows.reshape(th * wp2, c_p)
            for dx in range(3):
                contrib = jax.lax.dot(
                    flat, w_ref[dy, dx],
                    preferred_element_type=jnp.float32)  # (TH*(W+2), F)
                contrib = contrib.reshape(th, wp2, f_p)
                # output column w needs input column w+dx of the strip
                acc = acc + contrib[:, dx:dx + w_dim, :]
        y = acc + b_ref[0].astype(jnp.float32)
        if apply_relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:] = y.astype(compute_dtype)[None]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # x stays in HBM
            pl.BlockSpec((3, 3, c_p, f_p), lambda bi, hi: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_p), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w_dim, f_p),
                               lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_dim, h, w_dim, f_p),
                                       compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp2, c_p), compute_dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_dim * h * w_dim * 9 * c_p * f_p,
            bytes_accessed=(x_pad.size * 2 + w_pad.size * 2
                            + b_dim * h * w_dim * f_p * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_pad, w_pad, b_pad)
    return out[..., :f]


fused_conv3x3_relu = jax.jit(
    fused_conv3x3_relu_fn,
    static_argnames=("compute_dtype", "apply_relu", "interpret"))
