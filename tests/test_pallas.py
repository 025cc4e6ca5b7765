"""Pallas fused LSTM step: correctness vs the XLA reference cell.

Runs in interpreter mode on CPU (tests use the virtual-CPU backend); the
same kernel compiles for real TPU via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrcn_tpu.ops.lstm import lstm_step
from lrcn_tpu.ops.pallas import fused_lstm_step


@pytest.mark.parametrize("b_dim,x_dim,h_dim", [
    (4, 24, 32),          # tiny, unaligned
    (128, 256, 128),      # aligned
    (96, 1000, 1000),     # reference-scale dims, unaligned
])
def test_fused_lstm_step_matches_xla(b_dim, x_dim, h_dim):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((x_dim + h_dim, 4 * h_dim)) * 0.05,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((4 * h_dim,)) * 0.1, jnp.float32)
    h = jnp.asarray(rng.standard_normal((b_dim, h_dim)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((b_dim, h_dim)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b_dim, x_dim)), jnp.float32)

    h_ref, c_ref = lstm_step(w, b, h, c, x, compute_dtype=jnp.float32)
    h_out, c_out = fused_lstm_step(w, b, h, c, x,
                                   compute_dtype=jnp.float32,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(h_out), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_out), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_lstm_step_bf16_close_to_xla_bf16():
    rng = np.random.default_rng(1)
    b_dim, x_dim, h_dim = 32, 200, 160
    w = jnp.asarray(rng.standard_normal((x_dim + h_dim, 4 * h_dim)) * 0.05,
                    jnp.float32)
    b = jnp.asarray(np.zeros(4 * h_dim), jnp.float32)
    h = jnp.asarray(rng.standard_normal((b_dim, h_dim)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((b_dim, h_dim)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b_dim, x_dim)), jnp.float32)

    h_ref, c_ref = lstm_step(w, b, h, c, x, compute_dtype=jnp.bfloat16)
    h_out, c_out = fused_lstm_step(w, b, h, c, x,
                                   compute_dtype=jnp.bfloat16,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(h_out), np.asarray(h_ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(c_out), np.asarray(c_ref),
                               rtol=2e-2, atol=2e-2)


def test_shape_validation():
    with pytest.raises(ValueError):
        fused_lstm_step(jnp.zeros((10, 12)), jnp.zeros((12,)),
                        jnp.zeros((2, 3)), jnp.zeros((2, 3)),
                        jnp.zeros((2, 4)), interpret=True)


def test_beam_search_pallas_path_matches_xla():
    """use_pallas decode produces identical tokens (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from lrcn_tpu.config import LRCNConfig
    from lrcn_tpu.decode.beam import beam_search
    from lrcn_tpu.models import lrcn as lrcn_model

    cfg = LRCNConfig(hidden=(32, 32), embed=24, cnn_feature_dim=48,
                     vocab_size=50, compute_dtype="float32")
    params = lrcn_model.init_params(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, 48))

    ref_tokens, ref_scores = beam_search(
        params, feats, beam_width=3, max_words=8,
        compute_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        tok, scores = beam_search(
            params, feats, beam_width=3, max_words=8,
            compute_dtype=jnp.float32, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tokens))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-5, atol=1e-5)


class TestFusedConv:
    """Fused 3x3 conv+bias+ReLU kernel vs lax.conv (interpret mode)."""

    @pytest.mark.parametrize("shape", [
        (2, 8, 8, 16, 32),     # aligned-ish small
        (1, 14, 14, 64, 64),   # conv5-like
        (2, 16, 12, 8, 8),     # rectangular, tiny channels
        (1, 28, 28, 96, 40),   # unaligned channel counts
    ])
    def test_matches_lax_conv(self, shape):
        from lrcn_tpu.ops.pallas.conv3x3 import fused_conv3x3_relu
        b_dim, h, w_dim, c, f = shape
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b_dim, h, w_dim, c)),
                        jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((f,)) * 0.5, jnp.float32)
        y = fused_conv3x3_relu(x, w, b, compute_dtype=jnp.float32,
                               interpret=True)
        ref = jax.nn.relu(jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_no_relu_mode(self):
        from lrcn_tpu.ops.pallas.conv3x3 import fused_conv3x3_relu
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32)
        b = jnp.zeros((8,))
        y = fused_conv3x3_relu(x, w, b, compute_dtype=jnp.float32,
                               apply_relu=False, interpret=True)
        assert float(jnp.min(y)) < 0  # negatives survive

    def test_shape_validation(self):
        from lrcn_tpu.ops.pallas.conv3x3 import fused_conv3x3_relu
        with pytest.raises(ValueError):
            fused_conv3x3_relu(jnp.zeros((1, 8, 8, 4)),
                               jnp.zeros((3, 3, 8, 8)), jnp.zeros((8,)),
                               interpret=True)


def test_topk_logsumexp_matches_lax():
    """Fused top-K+logsumexp kernel (interpret mode): exact value/index/tie
    parity with lax.top_k plus logsumexp."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lrcn_tpu.ops.pallas.topk_lse import topk_logsumexp

    rng = np.random.default_rng(0)
    for r, v in [(16, 500), (24, 8800)]:
        x = jnp.asarray(rng.standard_normal((r, v)), jnp.float32)
        x = x.at[:, 7].set(x[:, 3])   # exact duplicates: tie handling
        vals, idx, lse = topk_logsumexp(x, 3, interpret=True)
        ref_v, ref_i = jax.lax.top_k(x, 3)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(lse), np.asarray(jax.nn.logsumexp(x, axis=-1)),
            rtol=1e-6, atol=1e-5)
