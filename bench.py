"""Flagship benchmark: beam-3 caption decoding throughput per chip.

The reference decodes batch-1 with a host-looped recursive beam search
(lrcn.jl:644-678) — per-step GPU->host probability readbacks and a full-vocab
host sort.  Our decode is one on-device ``lax.while_loop`` over a batch of
images (lrcn_tpu/decode/beam.py).  North-star target (BASELINE.json):
>= 1000 beam-3 captions/sec per chip, which is the vs_baseline denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lrcn_tpu.config import LRCNConfig
from lrcn_tpu.decode.beam import beam_search
from lrcn_tpu.models import lrcn

BASELINE_CAPTIONS_PER_SEC = 1000.0  # BASELINE.json north-star, per chip


def main():
    cfg = LRCNConfig(hidden=(1000, 1000), embed=1000, vocab_size=8800)
    params = lrcn.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)

    batch, beam, max_words = 256, 3, 20
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((batch, cfg.cnn_feature_dim)), jnp.float32)
    feats = feats / jnp.sum(jnp.abs(feats), axis=1, keepdims=True)

    run = lambda f: beam_search(params, f, beam_width=beam,
                                max_words=max_words)
    # Sync via host transfer: on some experimental TPU runtimes
    # block_until_ready returns before execution completes; pulling a
    # scalar to the host cannot.
    np.asarray(run(feats)[0])  # compile + warm up

    n_iters = 8
    t0 = time.perf_counter()
    for _ in range(n_iters):
        tokens, scores = run(feats)
    np.asarray(tokens)
    dt = time.perf_counter() - t0

    captions_per_sec = n_iters * batch / dt
    print(json.dumps({
        "metric": "beam3_captions_per_sec_per_chip",
        "value": round(captions_per_sec, 1),
        "unit": "captions/s",
        "vs_baseline": round(captions_per_sec / BASELINE_CAPTIONS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
