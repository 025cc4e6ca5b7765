"""Native C++ BLEU core: build, load, and bit-for-bit parity tests."""

import os
import subprocess

import pytest

from lrcn_tpu.evaluation import bleu as bleu_mod
from lrcn_tpu.native import bleu_library, native_enabled


def test_native_library_builds_and_loads():
    lib = bleu_library()
    assert lib is not None, "C++ BLEU core failed to build/load"


def test_native_matches_python(monkeypatch):
    hyps = ["a man rides a horse .", "two dogs play in the park .",
            "", "unseen words entirely ."]
    refs = [
        ["a man rides a horse .", "a person rides a horse .",
         "man on horse .", "a man is riding .", "rider on a horse ."],
        ["two dogs play outside .", "dogs playing in a park .",
         "two dogs in the park .", "a pair of dogs play .",
         "dogs play in the grass ."],
        ["something .", "anything .", "x .", "y .", "z ."],
        ["totally different caption .", "another one .", "third .",
         "fourth .", "fifth ."],
    ]
    native = bleu_mod.multi_bleu(hyps, refs)
    monkeypatch.setenv("LRCN_NATIVE", "0")
    python = bleu_mod.multi_bleu(hyps, refs)
    assert native.format() == python.format()
    assert native.hyp_len == python.hyp_len
    assert native.ref_len == python.ref_len
    assert native.bleu == python.bleu


def test_native_matches_python_lowercase(monkeypatch):
    hyps = ["A Man RIDES"]
    refs = [["a man rides", "A MAN rode", "nothing", "x", "y"]]
    native = bleu_mod.multi_bleu(hyps, refs, lowercase=True)
    monkeypatch.setenv("LRCN_NATIVE", "0")
    python = bleu_mod.multi_bleu(hyps, refs, lowercase=True)
    assert native.format() == python.format()


def test_native_golden_artifact_parity(reference_eval_dir):
    """Native path reproduces the Perl scorer on the committed artifacts."""
    stem = os.path.join(reference_eval_dir, "coco_refs", "ref")
    cand = os.path.join(reference_eval_dir, "candidates.txt")
    result = bleu_mod.multi_bleu_files(stem, cand)
    perl = subprocess.run(
        ["perl", os.path.join(reference_eval_dir, "multi-bleu.perl"), stem],
        stdin=open(cand, "rb"), capture_output=True, text=True)
    assert result.format() == perl.stdout.strip()


def test_native_disabled_env(monkeypatch):
    monkeypatch.setenv("LRCN_NATIVE", "0")
    assert not native_enabled()
    assert bleu_mod._counts_native(["a"], [["a"]], False) is None
