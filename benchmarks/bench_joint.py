"""Joint CNN+LSTM fine-tune throughput (the paper's LRCN-2f setup).

Full end-to-end step: images -> VGG-16 fc7 (jax.checkpoint remat) ->
L1-normalize -> decoder loss -> grads for BOTH param sets -> Adam.
Run on a real TPU chip; syncs via scalar host transfer (see README.md).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lrcn_tpu.config import LRCNConfig
from lrcn_tpu.models import vgg
from lrcn_tpu.models.joint import JointTrainStep, make_joint_optimizer

cfg = LRCNConfig(hidden=(1000, 1000), embed=1000, vocab_size=8800,
                 dropout=0.4)
step = JointTrainStep(cfg, make_joint_optimizer(cfg))
params, opt_state = step.init(
    jax.random.PRNGKey(0), vgg_params=vgg.init_vgg_params(
        jax.random.PRNGKey(1)))

B, L = 128, 20
rng = np.random.default_rng(0)
images = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.float32)
tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, L)), jnp.int32)
lengths = jnp.asarray(rng.integers(10, L + 1, (B,)), jnp.int32)

key = jax.random.PRNGKey(2)
params, opt_state, loss = step(params, opt_state, images, tokens, lengths,
                               key)
float(loss)  # compile + sync

n = 5
t0 = time.perf_counter()
for i in range(n):
    params, opt_state, loss = step(params, opt_state, images, tokens,
                                   lengths, jax.random.fold_in(key, i))
float(loss)
dt = (time.perf_counter() - t0) / n
print(f"joint step B={B}: {dt*1e3:.1f} ms wall -> {B/dt:.0f} images/s, "
      f"{int(jnp.sum(lengths))/dt:.0f} words/s")
