"""Joint CNN+LSTM fine-tuning: end-to-end gradients through VGG-16.

The reference never fine-tunes the CNN — it extracts fc7 features offline
(lrcn.jl:190-221) and trains only the decoder.  The vendored paper's
strongest configuration (LRCN 2f, 1411.4389.pdf Table 6; SURVEY.md §6) DOES
fine-tune the vision encoder jointly, so this module provides that as a
first-class training path:

- one jitted step: images -> vgg16_fc7 -> L1-normalize -> decoder loss,
  with ``jax.value_and_grad`` over BOTH parameter sets;
- ``jax.checkpoint`` on the VGG forward trades recompute for HBM
  (activations of 13 convs at 224x224 otherwise dominate memory);
- separate learning rates for encoder/decoder via one optax ``multi_transform``
  (the paper uses a reduced CNN lr during fine-tuning), and
  ``freeze_cnn=True`` degenerates to feature-extraction-equivalent training;
- data parallel over a mesh: batch sharded on ``data``, both param sets
  replicated (VGG's 134M params are the bulk; replication is right at this
  scale), gradient all-reduce over ICI by GSPMD propagation.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from lrcn_tpu.config import LRCNConfig
from lrcn_tpu.models import lrcn, vgg


class JointParams(NamedTuple):
    cnn: Any      # VGG-16 params (models/vgg.py)
    decoder: Any  # LRCN decoder params (models/lrcn.py)


def joint_loss(params: JointParams, images: jax.Array, tokens: jax.Array,
               lengths: jax.Array, *, pdrop: float = 0.0,
               rng: jax.Array | None = None,
               compute_dtype=jnp.bfloat16,
               remat_cnn: bool = True) -> jax.Array:
    """Mean NLL of captions given raw preprocessed images."""
    fwd = functools.partial(vgg.vgg16_fc7_fn, compute_dtype=compute_dtype)
    if remat_cnn:
        fwd = jax.checkpoint(fwd)
    feats = fwd(params.cnn, images)
    feats = vgg.l1_normalize(feats)       # live-path normalization, lrcn.jl:597
    return lrcn.loss_fn(params.decoder, tokens, lengths, feats,
                        pdrop=pdrop, rng=rng, compute_dtype=compute_dtype)


def make_joint_optimizer(cfg: LRCNConfig, *, cnn_lr: float | None = None,
                         freeze_cnn: bool = False
                         ) -> optax.GradientTransformation:
    """Adam with a separate (usually smaller) CNN learning rate.

    ``cnn_lr`` defaults to ``cfg.lr / 10`` (fine-tuning convention);
    ``freeze_cnn`` zeroes CNN updates entirely.
    """
    if cnn_lr is None:
        cnn_lr = cfg.lr / 10.0
    cnn_opt = (optax.set_to_zero() if freeze_cnn
               else optax.adam(cnn_lr))
    tx = optax.multi_transform(
        {"cnn": cnn_opt, "decoder": optax.adam(cfg.lr)},
        JointParams(cnn="cnn", decoder="decoder"))
    if cfg.gclip and cfg.gclip > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.gclip), tx)
    return tx


class JointTrainStep:
    """Jitted end-to-end train step (optionally over a mesh).

    With a mesh, images/tokens/lengths shard over the ``data`` axis and
    params replicate; pass batches through ``shard_batch``.
    """

    def __init__(self, cfg: LRCNConfig, opt: optax.GradientTransformation,
                 mesh=None, remat_cnn: bool = True):
        self.cfg = cfg
        self.opt = opt
        self.mesh = mesh
        self._compute_dtype = jnp.dtype(cfg.compute_dtype)
        self._remat = remat_cnn
        kwargs = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            kwargs["out_shardings"] = (None, None,
                                       NamedSharding(mesh, P()))
        self._step = jax.jit(self._step_impl, donate_argnums=(0, 1),
                             **kwargs)

    def _step_impl(self, params, opt_state, images, tokens, lengths, rng):
        loss, grads = jax.value_and_grad(joint_loss)(
            params, images, tokens, lengths, pdrop=self.cfg.dropout,
            rng=rng, compute_dtype=self._compute_dtype,
            remat_cnn=self._remat)
        updates, opt_state = self.opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def init(self, rng: jax.Array, vgg_params=None) -> tuple:
        k1, k2 = jax.random.split(rng)
        if vgg_params is None:
            vgg_params = vgg.init_vgg_params(k1)
        params = JointParams(vgg_params,
                             lrcn.init_params(k2, self.cfg))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            params = jax.device_put(
                params, NamedSharding(self.mesh, P()))
        return params, self.opt.init(params)

    def shard_batch(self, images, tokens, lengths):
        import numpy as np
        if self.mesh is None:
            return (jnp.asarray(images, jnp.float32),
                    jnp.asarray(tokens, jnp.int32),
                    jnp.asarray(lengths, jnp.int32))
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P("data"))
        return (jax.device_put(jnp.asarray(images, jnp.float32), sh),
                jax.device_put(jnp.asarray(tokens, jnp.int32), sh),
                jax.device_put(jnp.asarray(lengths, jnp.int32), sh))

    def __call__(self, params, opt_state, images, tokens, lengths, rng):
        return self._step(params, opt_state, images, tokens, lengths, rng)
