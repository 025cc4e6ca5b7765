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


class TestSampling:
    """Temperature sampling + best-of-N (decode/sample.py)."""

    def _setup(self):
        from lrcn_tpu.config import LRCNConfig
        from lrcn_tpu.models import lrcn as lrcn_model
        cfg = LRCNConfig(hidden=(32, 32), embed=24, cnn_feature_dim=40,
                         vocab_size=60, compute_dtype="float32")
        params = lrcn_model.init_params(jax.random.PRNGKey(0), cfg)
        feats = jax.random.normal(jax.random.PRNGKey(1), (6, 40))
        return params, feats

    def test_sample_shapes_and_determinism(self):
        from lrcn_tpu.decode.sample import sample_search
        params, feats = self._setup()
        t1, s1 = sample_search(params, feats, jax.random.PRNGKey(7),
                               temperature=1.5, max_words=10,
                               compute_dtype=jnp.float32)
        t2, s2 = sample_search(params, feats, jax.random.PRNGKey(7),
                               temperature=1.5, max_words=10,
                               compute_dtype=jnp.float32)
        assert t1.shape == (6, 12)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        assert np.all(np.asarray(t1)[:, 0] == 1)  # BOS column
        # different seed -> different draws (overwhelmingly likely)
        t3, _ = sample_search(params, feats, jax.random.PRNGKey(8),
                              temperature=1.5, max_words=10,
                              compute_dtype=jnp.float32)
        assert not np.array_equal(np.asarray(t1), np.asarray(t3))

    def test_sample_scores_are_true_logprobs(self):
        from lrcn_tpu.decode.sample import sample_search
        from lrcn_tpu.core.vocab import EOS_ID
        from lrcn_tpu.models import lrcn as lrcn_model
        params, feats = self._setup()
        tokens, scores = sample_search(params, feats, jax.random.PRNGKey(3),
                                       temperature=2.0, max_words=8,
                                       compute_dtype=jnp.float32)
        # re-score row 0's emitted prefix by teacher forcing
        row = np.asarray(tokens)[0]
        emitted = []
        for t in row[1:]:
            emitted.append(int(t))
            if int(t) == EOS_ID:
                break
        state = lrcn_model.init_state(
            __import__("lrcn_tpu.config", fromlist=["LRCNConfig"]
                       ).LRCNConfig(hidden=(32, 32), embed=24,
                                    cnn_feature_dim=40, vocab_size=60), 1)
        cnn = lrcn_model.cnn_projection(params, feats[:1], jnp.float32)
        prev = jnp.asarray([1], jnp.int32)
        total = 0.0
        for t in emitted:
            state, logits = lrcn_model.decode_step(params, state, prev, cnn,
                                                   jnp.float32)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            total += float(logp[0, t])
            prev = jnp.asarray([t], jnp.int32)
        np.testing.assert_allclose(total, float(scores[0]), rtol=1e-4,
                                   atol=1e-4)

    def test_best_of_n_beats_single_sample(self):
        from lrcn_tpu.decode.sample import best_of_n_search, sample_search
        params, feats = self._setup()
        tb, sb = best_of_n_search(params, feats, jax.random.PRNGKey(5),
                                  n_samples=8, temperature=2.0,
                                  max_words=8, compute_dtype=jnp.float32)
        t1, s1 = sample_search(params, feats, jax.random.PRNGKey(5),
                               temperature=2.0, max_words=8,
                               compute_dtype=jnp.float32)
        assert tb.shape == (6, 10)
        # best-of-8 is better on average than a single draw (statistical:
        # the draws are independent streams, so compare means, not rows)
        assert np.mean(np.asarray(sb)) > np.mean(np.asarray(s1)) - 1e-5


def test_generate_captions_scanned_paths_match_per_batch(setup):
    """generate_captions' scanned group dispatch (beam and greedy) yields
    the same captions as direct per-batch searches, across enough batches
    to exercise the bounded in-flight drain."""
    from lrcn_tpu.data.feature_store import FeatureStore
    from lrcn_tpu.decode.writer import generate_captions

    cfg, params, _ = setup
    vocab = Vocab([f"w{i}" for i in range(cfg.vocab_size - 3)])
    rng = np.random.default_rng(5)
    n = 23   # batch_size=2 -> 12 batches -> 3 scan groups + drain churn
    feats = {100 + i: rng.normal(size=cfg.cnn_feature_dim).astype(
        np.float32) for i in range(n)}
    store = FeatureStore.from_dict(feats, normalized=True)
    ids = [100 + i for i in range(n)]

    for bw, search in ((2, beam_search), (1, greedy_search)):
        lines = generate_captions(
            params, vocab, store, ids, beam_width=bw, max_words=8,
            batch_size=2, compute_dtype=jnp.float32)
        assert len(lines) == n
        # the HBM-resident-table fast path (int32 indices through
        # rows_search_scan) must be bit-identical to host gathering
        resident = generate_captions(
            params, vocab, store, ids, beam_width=bw, max_words=8,
            batch_size=2, compute_dtype=jnp.float32, resident_store=True)
        assert resident == lines, (bw, resident[:3], lines[:3])
        direct = []
        for start in range(0, n, 2):
            batch = ids[start:start + 2]
            pad = batch + [batch[-1]] * (2 - len(batch))
            f = jnp.asarray(np.stack([feats[i] for i in pad]))
            tokens, _ = search(params, f, max_words=8,
                               compute_dtype=jnp.float32) if bw == 1 else \
                beam_search(params, f, beam_width=bw, max_words=8,
                            compute_dtype=jnp.float32)
            direct.extend(caption_to_line(np.asarray(tokens)[i], vocab)
                          for i in range(len(batch)))
        assert lines == direct, (bw, lines[:3], direct[:3])


def test_detokenize_batch_matches_caption_to_line():
    """The vectorized detokenizer is output-identical to the per-row
    reference implementation, including EOS-first (empty caption),
    no-EOS (runs to the cap), and BOS-only rows."""
    from lrcn_tpu.decode.writer import detokenize_batch

    vocab = Vocab([f"w{i}" for i in range(30)])
    rng = np.random.default_rng(0)
    toks = rng.integers(0, len(vocab), (64, 12)).astype(np.int32)
    toks[:, 0] = 1        # BOS slot
    toks[0, 1] = 0        # EOS immediately -> "."
    toks[1, 1:] = 5       # no EOS -> runs to the cap
    expected = [caption_to_line(toks[i], vocab) for i in range(len(toks))]
    assert detokenize_batch(toks, vocab) == expected
    assert detokenize_batch(np.ones((3, 1), np.int32), vocab) == ["."] * 3


def test_generate_captions_bf16_upload_paths_match(setup):
    """bf16 compute: pre-cast bf16 feature uploads (resident table AND
    host-gathered batches) are bit-identical to shipping f32 — the
    search's first use of features is a cast to compute_dtype
    (ops/lstm.py matmul), so the upload dtype cannot change tokens.
    The bf16 upload halves the bytes of the e2e bottleneck
    (BENCH_DETAIL.md bench_generate)."""
    from lrcn_tpu.data.feature_store import FeatureStore
    from lrcn_tpu.decode.writer import generate_captions

    cfg, params, _ = setup
    vocab = Vocab([f"w{i}" for i in range(cfg.vocab_size - 3)])
    rng = np.random.default_rng(9)
    n = 9
    feats = {i: np.abs(rng.normal(size=cfg.cnn_feature_dim))
             .astype(np.float32) for i in range(n)}
    store = FeatureStore.from_dict(
        {k: v / v.sum() for k, v in feats.items()}, normalized=True)
    ids = list(range(n))

    host = generate_captions(params, vocab, store, ids, beam_width=2,
                             max_words=8, batch_size=4,
                             compute_dtype=jnp.bfloat16)
    res = generate_captions(params, vocab, store, ids, beam_width=2,
                            max_words=8, batch_size=4,
                            compute_dtype=jnp.bfloat16,
                            resident_store=True)
    assert host == res

    # f32-upload reference: the same search fed float32 rows (cast
    # happens inside the jitted program instead of on the host)
    direct = []
    for s in range(0, n, 4):
        batch = ids[s:s + 4]
        pad = batch + [batch[-1]] * (4 - len(batch))
        f32 = jnp.asarray(np.stack([store.get(i) for i in pad]))
        tokens, _ = beam_search(params, f32, beam_width=2, max_words=8,
                                compute_dtype=jnp.bfloat16)
        direct.extend(caption_to_line(np.asarray(tokens)[i], vocab)
                      for i in range(len(batch)))
    assert host == direct
