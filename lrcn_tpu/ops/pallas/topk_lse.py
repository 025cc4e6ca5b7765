"""Pallas TPU kernel: fused per-row top-K + log-sum-exp over the vocab.

The beam-search step needs, per hypothesis row of the (B*K, V) logits,
exactly three things: the top-K logits, their indices, and the row's
log-sum-exp (to turn them into log-probabilities).  This kernel streams
each row block through VMEM ONCE and produces all three: K rounds of
(max, lowest-index-of-max, mask) — matching ``lax.top_k``'s descending
order and lowest-index-first tie rule — plus a stable log-sum-exp against
the row max.  Exactness is asserted against lax.top_k/logsumexp in tests.

MEASURED OUTCOME (v5e, (768, 8800) f32): the kernel TIES the XLA
log_softmax + top_k pair isolated (0.57 ms vs 0.55 ms) and LOSES inside
the beam scan, so it stays opt-in infrastructure and the XLA path remains
the default.  Two reasons, both instructive:

- cross-LANE reductions on the row-major layout run ~10x off HBM
  bandwidth on the VPU (a bare ``jnp.max(x, -1)`` over this shape costs
  the same 0.5 ms), and a Pallas kernel receives the operand in that
  layout;
- inside the beam, XLA beats both by *layout assignment*: it gives the
  logp tensor a transposed {0,1} layout (vocabulary on sublanes), making
  its fused matmul+softmax and the top_k pass 75+79 us/step — the copy it
  pays for the re-layout is cheaper than the slow-axis reductions.

Inference-only (no VJP).  Grid over row blocks; Pallas double-buffers the
HBM->VMEM streaming automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lrcn_tpu.ops.pallas.lstm_step import pallas_available

NEG_INF = -1e30


def _kernel(x_ref, vals_ref, idx_ref, lse_ref, *, k: int):
    x = x_ref[:].astype(jnp.float32)               # (rows, V)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    big = jnp.asarray(x.shape[-1], jnp.int32)

    m1 = jnp.max(x, axis=-1, keepdims=True)        # row max, reused by lse
    lse_ref[:] = m1 + jnp.log(
        jnp.sum(jnp.exp(x - m1), axis=-1, keepdims=True))

    work = x
    for j in range(k):
        m = m1 if j == 0 else jnp.max(work, axis=-1, keepdims=True)
        # lowest index attaining the max (lax.top_k's tie rule)
        i = jnp.min(jnp.where(work == m, col, big), axis=-1, keepdims=True)
        vals_ref[:, j:j + 1] = m
        idx_ref[:, j:j + 1] = i
        if j + 1 < k:
            work = jnp.where(col == i, NEG_INF, work)


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def topk_logsumexp(logits: jax.Array, k: int = 3, *, block_rows: int = 32,
                   interpret: bool = False
                   ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(R, V) logits -> (values (R, k) desc, indices (R, k), lse (R,)).

    Semantics match ``jax.lax.top_k`` (including lowest-index tie order)
    plus a per-row log-sum-exp, in one pass over the input.
    """
    from jax.experimental import pallas as pl

    r, v = logits.shape
    if r % block_rows:
        block_rows = 8 if r % 8 == 0 else 1
    grid = (r // block_rows,)
    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, v), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((block_rows, k), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, k), jnp.float32),
            jax.ShapeDtypeStruct((r, k), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
        interpret=interpret,
    )(logits.astype(jnp.float32))
    return vals, idx, lse[:, 0]


__all__ = ["topk_logsumexp", "pallas_available"]
