"""Joint CNN+LSTM fine-tune loop: the paper's strongest configuration.

The reference never fine-tunes the CNN (features are extracted offline,
lrcn.jl:190-221), but the vendored paper's best result (LRCN-2f, VGGNet,
1411.4389.pdf Table 6) trains the vision encoder jointly.  This module
provides the epoch loop around ``models/joint.py``'s jitted end-to-end
step, exposed to users as ``lrcn train --joint``:

- caption batches come from the same length-bucketed batcher as decoder
  training; each batch's image ids resolve to image files which are
  decoded on the host (native JPEG loader with PIL fallback) and fed as
  uint8 — the 255-scale/mean-subtract preprocessing runs on device inside
  the jitted step;
- host decode of batch N+1 overlaps with device compute of batch N via a
  depth-1 prefetch thread (the decode is the hot host path: 13 convs'
  worth of device work per batch buys a lot of overlap budget);
- per-epoch checkpoints carry BOTH parameter sets (cnn/ + decoder/ key
  prefixes in params.npz) plus vocab and config.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lrcn_tpu.config import LRCNConfig
from lrcn_tpu.core.vocab import Vocab
from lrcn_tpu.data.batcher import Batch, iterate_epoch
from lrcn_tpu.models import vgg
from lrcn_tpu.models.joint import (
    JointParams,
    JointTrainStep,
    make_joint_optimizer,
)
from lrcn_tpu.train.checkpoint import save_checkpoint
from lrcn_tpu.train.metrics import MetricsLogger


class JointTrainer:
    """Epoch loop for end-to-end (images -> captions) fine-tuning."""

    def __init__(self, cfg: LRCNConfig, vocab: Vocab,
                 image_paths: dict[int, str], average_image: np.ndarray,
                 metrics: MetricsLogger | None = None, mesh=None,
                 cnn_lr: float | None = None, freeze_cnn: bool = False):
        self.cfg = cfg
        self.vocab = vocab
        self.image_paths = image_paths
        self.average_image = np.asarray(average_image, np.float32)
        self.metrics = metrics or MetricsLogger()
        self.opt = make_joint_optimizer(cfg, cnn_lr=cnn_lr,
                                        freeze_cnn=freeze_cnn)
        self.step = JointTrainStep(cfg, self.opt, mesh=mesh)
        self._compute_dtype = jnp.dtype(cfg.compute_dtype)

    def init(self, rng: jax.Array, vgg_params=None,
             decoder_params=None) -> tuple:
        params, opt_state = self.step.init(rng, vgg_params=vgg_params)
        if decoder_params is not None:
            params = JointParams(params.cnn, decoder_params)
            opt_state = self.opt.init(params)
        return params, opt_state

    # --- host image feed ---

    def _load_images(self, batch: Batch) -> np.ndarray:
        """Decode the batch's images -> (B, 224, 224, 3) float32 (mean-sub).

        Padded rows (length == -1, data/batcher.py) repeat the last real
        image id, so every id in ``batch.image_ids`` resolves.
        """
        from lrcn_tpu.data.images import load_images

        imgs = load_images(
            [self.image_paths[int(i)] for i in batch.image_ids])
        return imgs.astype(np.float32) - self.average_image

    def _device_batches(self, batches: Sequence[Batch],
                        rng: np.random.Generator | None):
        """Depth-1 decode prefetch feeding sharded device batches."""
        order = list(iterate_epoch(batches, rng))
        with ThreadPoolExecutor(max_workers=1) as pool:
            future = (pool.submit(self._load_images, order[0])
                      if order else None)
            for i, batch in enumerate(order):
                images = future.result()
                future = (pool.submit(self._load_images, order[i + 1])
                          if i + 1 < len(order) else None)
                yield self.step.shard_batch(images, batch.tokens,
                                            batch.lengths)

    # --- loops ---

    def train_epoch(self, params, opt_state, batches: Sequence[Batch],
                    rng_key: jax.Array,
                    shuffle_rng: np.random.Generator | None,
                    log_every: int = 50) -> tuple:
        t0 = time.time()
        seen = 0
        for i, (images, tokens, lengths) in enumerate(
                self._device_batches(batches, shuffle_rng)):
            rng_key, step_key = jax.random.split(rng_key)
            params, opt_state, loss = self.step(
                params, opt_state, images, tokens, lengths, step_key)
            seen += images.shape[0]
            if log_every and i % log_every == 0:
                self.metrics.log(event="joint_train", batch=i,
                                 loss=round(float(loss), 4),
                                 images_per_sec=round(
                                     seen / (time.time() - t0), 1))
        jax.block_until_ready(params)
        return params, opt_state, rng_key

    def average_loss(self, params, batches: Sequence[Batch]) -> float:
        """Mean per-token NLL over a split, images decoded on the fly."""
        from lrcn_tpu.models import lrcn

        @jax.jit
        def eval_batch(params, images, tokens, lengths):
            feats = vgg.l1_normalize(vgg.vgg16_fc7_fn(
                params.cnn, images, compute_dtype=self._compute_dtype))
            return lrcn.loss_total_count(
                params.decoder, tokens, lengths, feats, pdrop=0.0,
                compute_dtype=self._compute_dtype)

        total, count = 0.0, 0.0
        for images, tokens, lengths in self._device_batches(batches, None):
            t, c = eval_batch(params, images, tokens, lengths)
            total += float(t)
            count += float(c)
        return total / max(count, 1.0)

    def fit(self, params, opt_state, train_batches: Sequence[Batch],
            val_batches: Sequence[Batch] | None, rng_key: jax.Array, *,
            epochs: int | None = None, savefile: str | None = None,
            bestfile: str | None = None) -> tuple:
        epochs = epochs if epochs is not None else self.cfg.epochs
        seed = self.cfg.seed if self.cfg.seed > 0 else None
        shuffle_rng = np.random.default_rng(seed)
        best_val = float("inf")
        for epoch in range(1, epochs + 1):
            params, opt_state, rng_key = self.train_epoch(
                params, opt_state, train_batches, rng_key, shuffle_rng)
            if savefile:
                save_checkpoint(savefile, params, self.vocab, self.cfg,
                                opt_state=opt_state, epoch=epoch)
            record = {"event": "epoch", "epoch": epoch}
            if val_batches is not None:
                val_loss = self.average_loss(params, val_batches)
                record["val_loss"] = round(val_loss, 4)
                if bestfile and val_loss < best_val:
                    best_val = val_loss
                    save_checkpoint(bestfile, params, self.vocab, self.cfg,
                                    opt_state=opt_state, epoch=epoch)
                    record["best"] = True
            self.metrics.log(**record)
        return params, opt_state


def load_joint_params(raw_params: dict) -> JointParams:
    """Rebuild JointParams from a loaded checkpoint's nested param dict."""
    return JointParams(cnn=raw_params["cnn"], decoder=raw_params["decoder"])


def is_joint_checkpoint(raw_params: dict) -> bool:
    return isinstance(raw_params, dict) and set(raw_params) >= {
        "cnn", "decoder"}


def identity_average_image() -> np.ndarray:
    """Zero mean image for training without the MatConvNet .mat file."""
    return np.zeros((224, 224, 3), np.float32)


__all__ = [
    "JointTrainer",
    "load_joint_params",
    "is_joint_checkpoint",
    "identity_average_image",
]
