"""Decision microbench: is int8 MXU worth it for the beam-step matmuls?

The beam step spends 216 us of its 415 us in two matmul families
(docs/SPEED_OF_LIGHT.md): the LSTM gates (768x1000 @ 1000x4000, 89% of
bf16 MXU peak) and the logits projection (768x1000 @ 1000x8800, ~90%).
v5e's int8 MXU peak is 2x bf16, so a quantized path could cut those in
half IF (a) XLA actually emits int8 MXU matmuls for
lax.dot_general(int8, int8, preferred_element_type=int32) at these
shapes and (b) the per-step activation quantize + rescale doesn't eat
the win.  This measures exactly that before any product code grows a
quantization path.

Benchmark hygiene: each loop iteration's input depends on the previous
output (defeats loop-invariant code motion) and every product passes
through ``lax.optimization_barrier`` before the scalar tap (defeats
slicing a single row/element through the dot).

Run on the real chip:  python benchmarks/bench_int8_matmul.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = (
    ("lstm_gates", (768, 1000), (1000, 4000)),
    ("logits", (768, 1000), (1000, 8800)),
)
ITERS = 200


def _sync(x) -> float:
    # scalar host transfer: block_until_ready can return early on this
    # runtime (docs/SPEED_OF_LIGHT.md "Host/tunnel constants")
    return float(np.asarray(jnp.sum(x).astype(jnp.float32)))


@functools.partial(jax.jit, static_argnames=("iters",))
def _loop_bf16(x, w, iters: int):
    def body(acc, _):
        xi = x + (acc * 1e-30).astype(jnp.bfloat16)   # carry-dependent
        y = jax.lax.dot_general(xi, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = jax.lax.optimization_barrier(y)
        return y[0, 0], None
    acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
    return acc


@functools.partial(jax.jit, static_argnames=("iters",))
def _loop_int8(x8, w8, iters: int):
    """Upper bound: activations already int8 (no quantize cost)."""
    def body(acc, _):
        xi = x8 ^ (acc & 1).astype(jnp.int8)          # carry-dependent
        y = jax.lax.dot_general(xi, w8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = jax.lax.optimization_barrier(y)
        return y[0, 0], None
    acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
    return acc


@functools.partial(jax.jit, static_argnames=("iters",))
def _loop_int8_dynamic(x, w8, w_scale, iters: int):
    """The REAL candidate path: bf16 activations arrive, get per-row
    dynamically quantized, int8 matmul, rescale to f32."""
    def body(acc, _):
        xi = x + (acc * 1e-30).astype(jnp.bfloat16)   # carry-dependent
        xf = xi.astype(jnp.float32)
        a_scale = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
        x8 = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * (a_scale * w_scale[None, :])
        yf = jax.lax.optimization_barrier(yf)
        return yf[0, 0], None
    acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
    return acc


def _time(fn, *args) -> float:
    out = fn(*args, ITERS)
    _sync(out)
    t0 = time.perf_counter()
    out = fn(*args, ITERS)
    _sync(out)
    return (time.perf_counter() - t0) / ITERS * 1e6


def main() -> None:
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    rng = np.random.default_rng(0)
    for name, (m, k), (k2, n) in SHAPES:
        assert k == k2
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        w_np = rng.standard_normal((k, n)).astype(np.float32)
        w_scale = np.max(np.abs(w_np), axis=0) / 127.0
        w8 = jnp.asarray(np.clip(np.round(w_np / w_scale), -127, 127),
                         jnp.int8)
        x8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)

        t_bf16 = _time(_loop_bf16, x, w)
        t_i8 = _time(_loop_int8, x8, w8)
        t_i8d = _time(_loop_int8_dynamic, x, w8, jnp.asarray(w_scale))
        flop = 2 * m * k * n
        print(f"{name}: bf16 {t_bf16:7.1f} us ({flop/t_bf16/1e6:6.1f} "
              f"GFLOP/ms) | int8-only {t_i8:7.1f} us (x{t_bf16/t_i8:.2f})"
              f" | int8+dynamic-quant {t_i8d:7.1f} us "
              f"(x{t_bf16/t_i8d:.2f})")
    print("verdict: pursue a quantized decode path only if the "
          "int8+dynamic-quant column beats bf16 by >=1.25x on BOTH "
          "shapes (the gathers/top-k half of the step doesn't shrink).")


if __name__ == "__main__":
    main()
