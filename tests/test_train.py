"""Trainer / checkpoint tests: overfit a tiny synthetic dataset."""

import jax
import numpy as np
import pytest

from lrcn_tpu.config import LRCNConfig
from lrcn_tpu.core.tokenizer import Caption
from lrcn_tpu.core.vocab import Vocab
from lrcn_tpu.data import FeatureStore, bucket_batches
from lrcn_tpu.models import lrcn
from lrcn_tpu.train import Trainer, load_checkpoint, save_checkpoint
from lrcn_tpu.train.checkpoint import restore_opt_state
from lrcn_tpu.train.metrics import MetricsLogger


def make_dataset(n_images=12, vocab_words=15, dim=24, seed=0):
    """Synthetic captions where the caption is a function of the feature."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab_words)]
    vocab = Vocab(words)
    caps, store = [], FeatureStore(dim=dim)
    for i in range(n_images):
        kind = i % 3
        text = {0: ("w0", "w1", "w2"), 1: ("w3", "w4", "w5", "w6"),
                2: ("w7", "w8")}[kind]
        caps.append(Caption(i, text))
        feat = np.zeros(dim, np.float32)
        feat[kind * 8:(kind + 1) * 8] = 1.0
        feat += rng.normal(scale=0.01, size=dim).astype(np.float32)
        store.add(i, feat)
    return vocab, caps, store


@pytest.fixture(scope="module")
def tiny_setup():
    vocab, caps, store = make_dataset()
    cfg = LRCNConfig(hidden=(32, 32), embed=16, cnn_feature_dim=24,
                     vocab_size=len(vocab), epochs=40, batch_size=4,
                     dropout=0.0, lr=1e-2, seed=11)
    batches = bucket_batches(caps, vocab, cfg.batch_size,
                             apply_small_dataset_rule=False)
    return cfg, vocab, caps, store, batches


def test_overfit_tiny_dataset(tiny_setup):
    cfg, vocab, caps, store, batches = tiny_setup
    trainer = Trainer(cfg, vocab, metrics=MetricsLogger(echo=False))
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    loss0 = trainer.average_loss(params, batches, store)
    params, opt_state = trainer.fit(
        params, opt_state, batches, None, store, None,
        jax.random.PRNGKey(1), epochs=40, eval_train_loss=False)
    loss1 = trainer.average_loss(params, batches, store)
    assert loss1 < loss0 * 0.2, (loss0, loss1)
    assert loss1 < 0.5


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    cfg, vocab, caps, store, batches = tiny_setup
    trainer = Trainer(cfg, vocab, metrics=MetricsLogger(echo=False))
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path / "ck"), params, vocab, cfg,
                    opt_state=opt_state, epoch=3)

    ck = load_checkpoint(str(tmp_path / "ck"))
    assert ck["epoch"] == 3
    assert ck["vocab"].words == vocab.words
    assert ck["cfg"].hidden == cfg.hidden
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ck["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # optimizer state restores into a fresh template
    template = trainer.opt.init(ck["params"])
    restored = restore_opt_state(template, ck["opt_leaves"])
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_training(tmp_path, tiny_setup):
    """Losses after save->load->step must equal continuous training."""
    cfg, vocab, caps, store, batches = tiny_setup
    trainer = Trainer(cfg, vocab, metrics=MetricsLogger(echo=False))
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    params, opt_state = trainer.fit(
        params, opt_state, batches, None, store, None,
        jax.random.PRNGKey(1), epochs=2, eval_train_loss=False,
        savefile=str(tmp_path / "ck"))
    direct = trainer.average_loss(params, batches, store)

    ck = load_checkpoint(str(tmp_path / "ck"))
    resumed = trainer.average_loss(
        jax.tree.map(lambda x: jax.numpy.asarray(x), ck["params"]),
        batches, store)
    np.testing.assert_allclose(resumed, direct, rtol=1e-6)


def test_gclip_applies():
    vocab, caps, store = make_dataset()
    cfg = LRCNConfig(hidden=(32, 32), embed=16, cnn_feature_dim=24,
                     vocab_size=len(vocab), gclip=1e-6, lr=1.0,
                     dropout=0.0)
    batches = bucket_batches(caps, vocab, 4, apply_small_dataset_rule=False)
    trainer = Trainer(cfg, vocab, metrics=MetricsLogger(echo=False))
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree.map(np.asarray, params)
    params, opt_state, _ = trainer._train_step(
        params, opt_state,
        jax.numpy.asarray(batches[0].tokens),
        jax.numpy.asarray(batches[0].lengths),
        jax.numpy.asarray(store.gather(batches[0].image_ids)),
        jax.random.PRNGKey(2))
    # with gclip ~0 the update direction is bounded; params changed but barely
    deltas = [np.abs(np.asarray(a) - b).max()
              for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p0))]
    assert max(deltas) > 0
