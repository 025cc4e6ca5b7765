"""End-to-end CLI workflow tests on synthetic data.

Mirrors the reference's turnkey workflow (README.md:4-8):
train -> generate a caption set -> build references -> BLEU score.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from lrcn_tpu import cli
from lrcn_tpu.data.feature_store import FeatureStore, l1_normalize

WORDS = ["a", "man", "rides", "his", "bike", "dog", "runs", "on", "grass",
         "two", "children", "play", "in", "the", "park", "near", "water"]


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    """A tiny Flickr-style dataset: .token file + feature stores."""
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    n_images = 2100  # enough for the fixed 1000/1000 val/test split
    lines = []
    for img in range(n_images):
        for j in range(5):
            n = rng.integers(4, 9)
            cap = " ".join(rng.choice(WORDS, n))
            lines.append(f"{10000 + img}.jpg#{j}\t{cap} .\n")
    token_path = str(tmp / "flickr.token")
    with open(token_path, "w") as f:
        f.writelines(lines)

    feats = rng.standard_normal((n_images, 64)).astype(np.float32)
    store = FeatureStore.from_dict(
        {10000 + i: l1_normalize(feats[i:i + 1])[0]
         for i in range(n_images)}, normalized=True)
    store_dir = str(tmp / "feats")
    store.save(store_dir)
    return {"tmp": tmp, "token": token_path, "feats": store_dir}


def test_image_id_from_filename():
    assert cli.image_id_from_filename("COCO_val2014_000000391895.jpg") \
        == 391895
    assert cli.image_id_from_filename("/x/1000092795.jpg") == 1000092795
    with pytest.raises(ValueError):
        cli.image_id_from_filename("nodigits.jpg")


def test_cli_help_runs():
    with pytest.raises(SystemExit) as e:
        cli.main(["--help"])
    assert e.value.code == 0


def test_train_generate_eval_workflow(synthetic):
    tmp = synthetic["tmp"]
    ckpt = str(tmp / "ckpt")
    rc = cli.main([
        "train", "--datafiles", synthetic["token"],
        "--features", synthetic["feats"],
        "--val-features", synthetic["feats"],
        "--savefile", ckpt, "--epochs", "1", "--batchsize", "16",
        "--hidden", "32", "32", "--embed", "24", "--seed", "3",
        "--dropout", "0.0", "--compute-dtype", "float32",
        "--metrics", str(tmp / "metrics.jsonl")])
    assert rc == 0
    assert os.path.exists(os.path.join(ckpt, "params.npz"))
    metrics = [json.loads(ln) for ln in open(tmp / "metrics.jsonl")]
    assert any(m.get("event") == "epoch" for m in metrics)

    cand = str(tmp / "candidates.txt")
    ids = str(tmp / "candidate_ids.txt")
    rc = cli.main([
        "generate", "--loadfile", ckpt, "--features", synthetic["feats"],
        "--capnumber", "40", "--generate", "10", "--beam_width", "2",
        "--batch-size", "20", "--out", cand, "--ids-out", ids,
        "--seed", "7", "--compute-dtype", "float32"])
    assert rc == 0
    cand_lines = open(cand).read().splitlines()
    id_lines = open(ids).read().splitlines()
    assert len(cand_lines) == len(id_lines) == 40
    assert all(line.endswith(".") for line in cand_lines)

    refs = str(tmp / "refs")
    rc = cli.main([
        "eval", "--candidates", cand, "--candidate-ids", ids,
        "--annotations", synthetic["token"], "--refs-dir", refs])
    assert rc == 0
    assert os.path.exists(os.path.join(refs, "f_ref4"))


def test_train_resume_from_checkpoint(synthetic):
    tmp = synthetic["tmp"]
    ckpt = str(tmp / "ckpt_resume")
    base = ["train", "--datafiles", synthetic["token"],
            "--features", synthetic["feats"],
            "--epochs", "1", "--batchsize", "16",
            "--hidden", "32", "32", "--embed", "24", "--seed", "3",
            "--dropout", "0.0", "--compute-dtype", "float32"]
    assert cli.main(base + ["--savefile", ckpt]) == 0
    # resume training from the checkpoint (reference --loadfile, lrcn.jl:88)
    assert cli.main(base + ["--loadfile", ckpt,
                            "--savefile", str(tmp / "ckpt_resume2")]) == 0


def test_train_on_mesh(synthetic):
    tmp = synthetic["tmp"]
    rc = cli.main([
        "train", "--datafiles", synthetic["token"],
        "--features", synthetic["feats"],
        "--savefile", str(tmp / "ckpt_mesh"),
        "--epochs", "1", "--batchsize", "16", "--mesh", "4", "2",
        "--hidden", "32", "32", "--embed", "24", "--seed", "3",
        "--dropout", "0.0", "--compute-dtype", "float32"])
    assert rc == 0


def test_console_script_entrypoint():
    out = subprocess.run([sys.executable, "-m", "lrcn_tpu.cli", "--help"],
                         capture_output=True, text=True, cwd="/tmp")
    assert out.returncode == 0
    assert "train" in out.stdout and "extract-features" in out.stdout
