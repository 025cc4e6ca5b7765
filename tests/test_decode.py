"""Beam/greedy decode tests vs a literal re-creation of the reference
algorithm (host-looped, per-hypothesis, linear-space probabilities)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrcn_tpu.config import LRCNConfig
from lrcn_tpu.core.vocab import BOS_ID, EOS_ID, Vocab
from lrcn_tpu.decode import beam_search, greedy_search, caption_to_line
from lrcn_tpu.models import lrcn


def small_cfg(vocab_size=25):
    return LRCNConfig(hidden=(16, 12), embed=8, cnn_feature_dim=10,
                      vocab_size=vocab_size)


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    params = lrcn.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(5, cfg.cnn_feature_dim)).astype(np.float32)
    return cfg, params, feats


def reference_beam_search(params, cfg, feat, beam_width, nword):
    """Host-looped beam search with the reference's exact semantics
    (lrcn.jl:644-678): linear-space probability products, first step
    expands only hypothesis 0, finished hypotheses keep expanding, stop
    when the best hypothesis ends in EOS or length exceeds nword."""
    cnn_proj = np.asarray(
        lrcn.cnn_projection(params, jnp.asarray(feat[None]), jnp.float32))
    state0 = lrcn.init_state(cfg, 1)
    hyps = [([BOS_ID], 1.0, state0) for _ in range(beam_width)]

    current = 1
    while True:
        candidates = []
        for i, (words, prob, state) in enumerate(hyps):
            new_state, logits = lrcn.decode_step(
                params, state, jnp.asarray([words[-1]]), jnp.asarray(cnn_proj),
                jnp.float32)
            p = np.asarray(jax.nn.softmax(logits.astype(jnp.float32)))[0]
            order = np.argsort(-p, kind="stable")[:beam_width]
            for j in order:
                candidates.append((words + [int(j)], prob * float(p[j]),
                                   new_state))
            if current == 1:
                break  # first step: only hypothesis 0 expands
        candidates.sort(key=lambda t: -t[1])
        hyps = candidates[:beam_width]
        if hyps[0][0][-1] == EOS_ID or current > nword:
            return hyps[0]
        current += 1


def test_beam_matches_reference_semantics(setup):
    cfg, params, feats = setup
    for k in (2, 3, 4):
        got_tokens, got_scores = beam_search(
            params, jnp.asarray(feats), beam_width=k, max_words=12,
            compute_dtype=jnp.float32)
        got_tokens = np.asarray(got_tokens)
        for b in range(feats.shape[0]):
            words, prob, _ = reference_beam_search(
                params, cfg, feats[b], beam_width=k, nword=12)
            # compare token prefixes up to & including EOS (or cap)
            exp = words[1:]
            got = list(got_tokens[b, 1:1 + len(exp)])
            assert got == exp, (k, b, got, exp)
            if prob > 0:
                assert np.isclose(np.log(prob), float(got_scores[b]),
                                  rtol=1e-3, atol=1e-4)


def test_greedy_matches_beam1(setup):
    cfg, params, feats = setup
    g_tokens, g_scores = greedy_search(params, jnp.asarray(feats),
                                       max_words=12,
                                       compute_dtype=jnp.float32)
    b_tokens, b_scores = beam_search(params, jnp.asarray(feats),
                                     beam_width=1, max_words=12,
                                     compute_dtype=jnp.float32)
    g, b = np.asarray(g_tokens), np.asarray(b_tokens)
    for row_g, row_b in zip(g, b):
        # compare up to EOS
        def upto_eos(r):
            out = []
            for t in r[1:]:
                out.append(int(t))
                if t == EOS_ID:
                    break
            return out
        assert upto_eos(row_g) == upto_eos(row_b)
    np.testing.assert_allclose(np.asarray(g_scores), np.asarray(b_scores),
                               rtol=1e-4, atol=1e-5)


def test_batch_independence(setup):
    """Decoding an image alone or inside a batch must give the same caption."""
    cfg, params, feats = setup
    batch_tokens, _ = beam_search(params, jnp.asarray(feats), beam_width=3,
                                  max_words=10, compute_dtype=jnp.float32)
    solo_tokens, _ = beam_search(params, jnp.asarray(feats[2:3]),
                                 beam_width=3, max_words=10,
                                 compute_dtype=jnp.float32)
    b, s = np.asarray(batch_tokens)[2], np.asarray(solo_tokens)[0]
    for i in range(1, len(b)):
        assert b[i] == s[i]
        if b[i] == EOS_ID:
            break


def test_caption_line_format():
    vocab = Vocab(["a", "man", "rides"])
    # ids: a=3, man=4, rides=5
    row = np.array([BOS_ID, 3, 4, 5, EOS_ID, 3, 3])
    assert caption_to_line(row, vocab) == "a man rides ."
    row_no_eos = np.array([BOS_ID, 3, 4])
    assert caption_to_line(row_no_eos, vocab) == "a man ."


def test_max_words_cap(setup):
    cfg, params, feats = setup
    tokens, _ = beam_search(params, jnp.asarray(feats), beam_width=3,
                            max_words=4, compute_dtype=jnp.float32)
    assert tokens.shape == (feats.shape[0], 6)
