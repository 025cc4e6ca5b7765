"""Joint CNN+LSTM fine-tuning tests (scaled-down VGG for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrcn_tpu.config import LRCNConfig
from lrcn_tpu.models import vgg
from lrcn_tpu.models.joint import (
    JointParams,
    JointTrainStep,
    joint_loss,
    make_joint_optimizer,
)
from lrcn_tpu.parallel import make_mesh


def tiny_setup(mesh=None, freeze_cnn=False):
    cfg = LRCNConfig(hidden=(16, 16), embed=12, cnn_feature_dim=24,
                     vocab_size=30, dropout=0.0, lr=1e-2,
                     compute_dtype="float32", seed=1)
    opt = make_joint_optimizer(cfg, freeze_cnn=freeze_cnn)
    step = JointTrainStep(cfg, opt, mesh=mesh)
    vgg_params = vgg.init_vgg_params(jax.random.PRNGKey(0),
                                     width_multiplier=0.05, fc_dim=24)
    params, opt_state = step.init(jax.random.PRNGKey(1),
                                  vgg_params=vgg_params)
    rng = np.random.default_rng(0)
    batch = 8
    images = rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)
    tokens = rng.integers(3, cfg.vocab_size, (batch, 6)).astype(np.int32)
    lengths = rng.integers(2, 7, (batch,)).astype(np.int32)
    return cfg, step, params, opt_state, (images, tokens, lengths)


def test_joint_loss_finite_and_grads_flow():
    cfg, step, params, opt_state, (images, tokens, lengths) = tiny_setup()
    loss = joint_loss(params, jnp.asarray(images), jnp.asarray(tokens),
                      jnp.asarray(lengths), compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    grads = jax.grad(joint_loss)(params, jnp.asarray(images),
                                 jnp.asarray(tokens), jnp.asarray(lengths),
                                 compute_dtype=jnp.float32)
    # gradients reach the FIRST conv layer (full end-to-end backprop)
    g = grads.cnn["conv1_1"]["w"]
    assert float(jnp.max(jnp.abs(g))) > 0


def test_joint_training_reduces_loss():
    cfg, step, params, opt_state, batch = tiny_setup()
    dev_batch = step.shard_batch(*batch)
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(12):
        key, sk = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, *dev_batch, sk)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_freeze_cnn_keeps_cnn_params():
    cfg, step, params, opt_state, batch = tiny_setup(freeze_cnn=True)
    before = np.asarray(params.cnn["conv1_1"]["w"]).copy()
    dev_batch = step.shard_batch(*batch)
    params, opt_state, _ = step(params, opt_state, *dev_batch,
                                jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(params.cnn["conv1_1"]["w"]),
                                  before)
    # decoder DID update
    assert not np.array_equal(
        np.asarray(params.decoder["w_out"]),
        np.asarray(jax.tree.leaves({"w": params.decoder["w_out"]})[0]) * 0)


def test_joint_step_on_mesh():
    mesh = make_mesh((8, 1))
    cfg, step, params, opt_state, batch = tiny_setup(mesh=mesh)
    dev_batch = step.shard_batch(*batch)
    params, opt_state, loss = step(params, opt_state, *dev_batch,
                                   jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
