"""lrcn_tpu — a TPU-native LRCN image-captioning framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ekinakyurek/Long-Term-Recurrent-Convolutional-NN (Donahue et al., CVPR 2015):
VGG-16 fc7 image features -> factored 2-layer LSTM caption decoder ->
on-device beam-search generation -> multi-bleu BLEU evaluation on
Flickr30k / MS-COCO 2014.

Layer map (see SURVEY.md for the reference's layer map this mirrors):

- ``lrcn_tpu.core``       tokenizer / vocab / deterministic dataset splits
- ``lrcn_tpu.data``       batching, feature store, device feed, image preproc
- ``lrcn_tpu.models``     VGG-16 encoder and the LRCN decoder
- ``lrcn_tpu.ops``        fused compute ops (LSTM cell, Pallas kernels)
- ``lrcn_tpu.parallel``   mesh / sharding / data-parallel training step
- ``lrcn_tpu.train``      training loop, optimizer, checkpointing, metrics
- ``lrcn_tpu.decode``     on-device greedy / beam / sampling search, writers
- ``lrcn_tpu.evaluation`` multi-bleu scorer + reference-file builder
- ``lrcn_tpu.native``     C++ host-runtime components (BLEU core, image loader)
- ``lrcn_tpu.utils``      profiling / step timing
- ``lrcn_tpu.cli``        command-line surface mirroring the reference
"""

__version__ = "0.1.0"

from lrcn_tpu.config import LRCNConfig  # noqa: F401
