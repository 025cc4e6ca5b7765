"""Online caption service: dynamic batching onto fixed compiled shapes.

Two pipelined stages, each behind its own ``DynamicBatcher``:

- **encode**: raw images -> fc7 features through VGG-16 (optional; only
  when the service was given an encoder).  Live images are L1-normalized
  exactly like the reference's live path (lrcn.jl:597).
- **decode**: fc7 features -> captions through batched on-device beam
  search.

Each stage pads its batch to ONE compiled shape (``decode_batch`` /
``encode_batch`` rows), so serving never triggers a recompile after
warmup and every dispatch runs the same XLA program the offline
benchmarks measure.  Requests by image id resolve features from the
``FeatureStore`` on the host and skip the encode stage entirely.

The reference has no online serving (generation is an offline file
loop, lrcn.jl:127-160); this subsystem is new, production-facing
surface.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lrcn_tpu.config import LRCNConfig
from lrcn_tpu.core.vocab import Vocab
from lrcn_tpu.data.feature_store import FeatureStore, l1_normalize
from lrcn_tpu.decode.beam import beam_search, greedy_search
from lrcn_tpu.decode.writer import caption_to_line
from lrcn_tpu.serve.batcher import DynamicBatcher


class CaptionService:
    """Caption requests against a loaded model, batched dynamically.

    ``caption_ids`` looks features up in the store; ``caption_images``
    runs the encoder (requires ``vgg_params``).  Both are thread-safe:
    any number of request threads may call them concurrently, and all
    device work funnels through the stage dispatcher threads.
    """

    def __init__(self, cfg: LRCNConfig, params, vocab: Vocab, *,
                 store: FeatureStore | None = None,
                 vgg_params=None, average_image: np.ndarray | None = None,
                 beam_width: int = 3, max_words: int = 30,
                 decode_batch: int = 64, encode_batch: int = 8,
                 max_wait_ms: float = 5.0,
                 compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.params = params
        self.vocab = vocab
        self.store = store
        self.beam_width = beam_width
        self.max_words = max_words
        self.decode_batch = decode_batch
        self.compute_dtype = compute_dtype
        self._decode = DynamicBatcher(
            self._decode_fn, max_batch=decode_batch,
            max_wait_ms=max_wait_ms, name="decode")
        self._encode = None
        if vgg_params is not None:
            from lrcn_tpu.train.joint import identity_average_image
            self.vgg_params = vgg_params
            self.average_image = (
                np.asarray(average_image, np.float32)
                if average_image is not None else identity_average_image())
            self._encode = DynamicBatcher(
                self._encode_fn, max_batch=encode_batch,
                max_wait_ms=max_wait_ms, name="encode")

    # --- stage fns (dispatcher threads) ---

    def _decode_fn(self, feats: list[np.ndarray]) -> list[str]:
        """N fc7 rows -> N caption lines, padded to the compiled batch."""
        n = len(feats)
        batch = np.zeros((self.decode_batch, feats[0].shape[-1]),
                         np.float32)
        batch[:n] = np.asarray(feats, np.float32)
        if self.beam_width == 1:
            tokens, _ = greedy_search(self.params, jnp.asarray(batch),
                                      max_words=self.max_words,
                                      compute_dtype=self.compute_dtype)
        else:
            tokens, _ = beam_search(self.params, jnp.asarray(batch),
                                    beam_width=self.beam_width,
                                    max_words=self.max_words,
                                    compute_dtype=self.compute_dtype)
        tokens = np.asarray(tokens)
        return [caption_to_line(tokens[i], self.vocab) for i in range(n)]

    def _encode_fn(self, images: list[np.ndarray]) -> list[np.ndarray]:
        """N (224,224,3) uint8 images -> N L1-normalized fc7 rows."""
        from lrcn_tpu.data.images import normalize_batch
        from lrcn_tpu.models.vgg import vgg16_fc7
        from lrcn_tpu.models.vgg import l1_normalize as l1_dev

        n = len(images)
        pad = self._encode.max_batch
        batch = np.zeros((pad, 224, 224, 3), np.uint8)
        batch[:n] = np.asarray(images, np.uint8)
        pixels = normalize_batch(jnp.asarray(batch),
                                 jnp.asarray(self.average_image))
        feats = l1_dev(vgg16_fc7(self.vgg_params, pixels,
                                 self.compute_dtype))
        return list(np.asarray(feats, np.float32)[:n])

    # --- request side ---

    def caption_features(self, feats: Sequence[np.ndarray]) -> list[str]:
        futs = [self._decode.submit(np.asarray(f, np.float32).reshape(-1))
                for f in feats]
        return [f.result() for f in futs]

    def caption_ids(self, image_ids: Sequence[int]) -> list[str]:
        if self.store is None:
            raise RuntimeError("service has no feature store")
        rows = [self.store.get(int(i)) for i in image_ids]
        if not self.store.normalized:
            rows = [l1_normalize(r[None])[0] for r in rows]
        return self.caption_features(rows)

    def caption_images(self, images: Sequence[np.ndarray]) -> list[str]:
        """(224,224,3) uint8 arrays -> captions (encode stage + decode)."""
        if self._encode is None:
            raise RuntimeError("service has no encoder (pass vgg_params)")
        feat_futs = [self._encode.submit(np.asarray(img, np.uint8))
                     for img in images]
        return self.caption_features([f.result() for f in feat_futs])

    def caption_image_bytes(self, blobs: Sequence[bytes]) -> list[str]:
        """Raw encoded image bytes (JPEG/PNG) -> captions."""
        import io

        from PIL import Image

        from lrcn_tpu.data.images import resize_crop

        images = []
        for blob in blobs:
            img = Image.open(io.BytesIO(blob)).convert("RGB")
            images.append(resize_crop(np.asarray(img)))
        return self.caption_images(images)

    # --- ops ---

    def warmup(self) -> None:
        """Compile every serving program before taking traffic."""
        self.caption_features(
            [np.zeros(self.cfg.cnn_feature_dim, np.float32)])
        if self._encode is not None:
            self.caption_images([np.zeros((224, 224, 3), np.uint8)])

    def stats(self) -> dict:
        out = {"decode": self._decode.stats.snapshot()}
        if self._encode is not None:
            out["encode"] = self._encode.stats.snapshot()
        return out

    def close(self) -> None:
        self._decode.close()
        if self._encode is not None:
            self._encode.close()
