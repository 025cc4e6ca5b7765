"""Runnable end-to-end demo on synthetic data (no datasets needed).

Builds a small Flickr-style caption file + random fc7 features, then runs
the full reference workflow through the public CLI:

    train -> generate (beam search) -> build references -> BLEU score

This is the synthetic analogue of the reference's turnkey run
(``julia lrcn.jl --fast --generate 30``, README.md:4-8).

    python examples/synthetic_end_to_end.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

from lrcn_tpu import cli
from lrcn_tpu.data.feature_store import FeatureStore, l1_normalize

WORDS = ("a man rides his bike dog runs on grass two children play in the "
         "park near water under trees").split()


def build_dataset(workdir: str, n_images: int = 2100):
    rng = np.random.default_rng(0)
    lines = []
    for img in range(n_images):
        for j in range(5):
            cap = " ".join(rng.choice(WORDS, rng.integers(4, 9)))
            lines.append(f"{10000 + img}.jpg#{j}\t{cap} .\n")
    token_path = os.path.join(workdir, "flickr.token")
    with open(token_path, "w") as f:
        f.writelines(lines)

    feats = {10000 + i: l1_normalize(
        rng.standard_normal((1, 128)).astype(np.float32))[0]
        for i in range(n_images)}
    store_dir = os.path.join(workdir, "feats")
    FeatureStore.from_dict(feats, normalized=True).save(store_dir)
    return token_path, store_dir


def main(workdir: str | None = None) -> None:
    workdir = workdir or tempfile.mkdtemp(prefix="lrcn_demo_")
    os.makedirs(workdir, exist_ok=True)
    print(f"== workdir: {workdir}")
    token_path, store_dir = build_dataset(workdir)
    ckpt = os.path.join(workdir, "ckpt")

    print("== training (2 epochs on synthetic captions)")
    cli.main(["train", "--datafiles", token_path, "--features", store_dir,
              "--val-features", store_dir, "--savefile", ckpt,
              "--epochs", "2", "--batchsize", "32",
              "--hidden", "64", "64", "--embed", "48", "--seed", "1",
              "--metrics", os.path.join(workdir, "metrics.jsonl")])

    print("== generating 100 captions with beam search")
    cand = os.path.join(workdir, "candidates.txt")
    ids = os.path.join(workdir, "candidate_ids.txt")
    cli.main(["generate", "--loadfile", ckpt, "--features", store_dir,
              "--capnumber", "100", "--generate", "12", "--beam_width", "3",
              "--out", cand, "--ids-out", ids, "--seed", "2"])
    for line in open(cand).read().splitlines()[:3]:
        print("   ", line)

    print("== building references + BLEU (reference eval flow)")
    cli.main(["eval", "--candidates", cand, "--candidate-ids", ids,
              "--annotations", token_path,
              "--refs-dir", os.path.join(workdir, "refs")])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
