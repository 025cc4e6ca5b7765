"""VGG-16 encoder tests: shapes, torch cross-check, .mat import, pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrcn_tpu.data.feature_store import FeatureStore
from lrcn_tpu.data.images import (
    decode_image,
    extract_features,
    normalize_batch,
    preprocess,
    resize_crop,
)
from lrcn_tpu.models import vgg


@pytest.fixture(scope="module")
def params():
    return vgg.init_vgg_params(jax.random.PRNGKey(0))


def test_vgg_forward_shape(params):
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    feats = vgg.vgg16_fc7(params, images)
    assert feats.shape == (2, 4096)
    assert feats.dtype == jnp.float32
    # fc7 has NO relu (reference breaks at fc7, lrcn.jl:717) — with random
    # weights roughly half the activations must be negative.
    neg_frac = float(jnp.mean(feats < 0))
    assert 0.2 < neg_frac < 0.8


def test_vgg_matches_torch(params):
    """Bit-level structural parity vs an independent torch implementation."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)

    ours = np.asarray(vgg.vgg16_fc7(params, jnp.asarray(img),
                                    compute_dtype=jnp.float32))

    x = torch.from_numpy(img).permute(0, 3, 1, 2)  # NCHW
    with torch.no_grad():
        for entry in vgg.VGG16_LAYOUT:
            if entry == "pool":
                x = torch.nn.functional.max_pool2d(x, 2, 2)
                continue
            name, _ = entry
            w = torch.from_numpy(
                np.asarray(params[name]["w"])).permute(3, 2, 0, 1)
            b = torch.from_numpy(np.asarray(params[name]["b"]))
            x = torch.nn.functional.relu(
                torch.nn.functional.conv2d(x, w, b, padding=1))
        x = x.permute(0, 2, 3, 1)  # back to NHWC
        w6 = torch.from_numpy(np.asarray(params["fc6"]["w"]))
        b6 = torch.from_numpy(np.asarray(params["fc6"]["b"]))
        x = torch.nn.functional.relu(
            torch.einsum("bhwc,hwcf->bf", x, w6) + b6)
        w7 = torch.from_numpy(np.asarray(params["fc7"]["w"]))
        b7 = torch.from_numpy(np.asarray(params["fc7"]["b"]))
        theirs = (x @ w7 + b7).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-2)


def test_matconvnet_import(tmp_path):
    """Round-trip a synthetic MatConvNet layer list through load_matconvnet."""
    from scipy.io import savemat

    rng = np.random.default_rng(1)
    layers, c_in = [], 3
    for entry in vgg.VGG16_LAYOUT:
        if entry == "pool":
            layers.append({"name": "pool", "type": "pool"})
            continue
        name, c_out = entry
        layers.append({
            "name": name, "type": "conv",
            "weights": np.array(
                [rng.standard_normal((3, 3, c_in, c_out)).astype(np.float32),
                 rng.standard_normal((c_out, 1)).astype(np.float32)],
                dtype=object),
        })
        layers.append({"name": "relu" + name[4:], "type": "relu"})
        c_in = c_out
    for name, d_in, d_out, shape in [
            ("fc6", 25088, 4096, (7, 7, 512, 4096)),
            ("fc7", 4096, 4096, (1, 1, 4096, 4096))]:
        layers.append({
            "name": name, "type": "conv",
            "weights": np.array(
                [rng.standard_normal(shape).astype(np.float32),
                 rng.standard_normal((d_out, 1)).astype(np.float32)],
                dtype=object),
        })
        layers.append({"name": "relu" + name[2:], "type": "relu"})
    layers.append({"name": "fc8", "type": "conv"})  # must not be reached
    avg = rng.standard_normal((224, 224, 3)).astype(np.float32)
    path = str(tmp_path / "vgg.mat")
    savemat(path, {
        "layers": np.array(layers, dtype=object),
        "meta": {"normalization": {"averageImage": avg}},
    })

    params, avg_out = vgg.load_matconvnet(path)
    assert set(params) == {n for n, _ in
                           [e for e in vgg.VGG16_LAYOUT if e != "pool"]
                           } | {"fc6", "fc7"}
    assert params["fc6"]["w"].shape == (7, 7, 512, 4096)
    assert params["fc7"]["w"].shape == (4096, 4096)
    assert params["conv1_1"]["b"].shape == (64,)
    np.testing.assert_allclose(avg_out, avg)
    # imported params run
    feats = vgg.vgg16_fc7(params, jnp.zeros((1, 224, 224, 3)))
    assert feats.shape == (1, 4096)


def test_resize_crop_exact_arithmetic():
    # reference: new_size = (dim * 224) ÷ min(dims) (lrcn.jl:756)
    img = np.zeros((300, 500, 3), np.uint8)
    out = resize_crop(img)
    assert out.shape == (224, 224, 3)
    # 500*224//300 = 373 wide; crop offset (373-224)//2 = 74
    img2 = np.zeros((224, 224, 3), np.uint8)
    assert resize_crop(img2).shape == (224, 224, 3)


def test_normalize_batch():
    imgs = np.full((2, 224, 224, 3), 100, np.uint8)
    avg = np.full((224, 224, 3), 40.0, np.float32)
    out = np.asarray(normalize_batch(jnp.asarray(imgs), jnp.asarray(avg)))
    np.testing.assert_allclose(out, 60.0)


def test_decode_and_preprocess(tmp_path):
    from PIL import Image

    path = str(tmp_path / "img.png")
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (320, 280, 3)
                                          ).astype(np.uint8)).save(path)
    img = decode_image(path)
    assert img.shape == (320, 280, 3)
    # grayscale promotion (lrcn.jl:761-763)
    gpath = str(tmp_path / "gray.png")
    Image.fromarray(np.zeros((64, 64), np.uint8)).save(gpath)
    assert decode_image(gpath).shape == (64, 64, 3)

    out = preprocess(path, np.zeros((224, 224, 3), np.float32))
    assert out.shape == (1, 224, 224, 3)


def test_extract_features_resumable(tmp_path, params):
    from PIL import Image

    rng = np.random.default_rng(2)
    paths = {}
    for i in range(3):
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(rng.integers(0, 255, (240, 260, 3)
                                     ).astype(np.uint8)).save(p)
        paths[100 + i] = p
    avg = np.zeros((224, 224, 3), np.float32)

    store = extract_features(paths, params, avg, batch_size=2)
    assert len(store) == 3
    assert store.normalized
    f0 = store.get(100).copy()
    np.testing.assert_allclose(f0.sum(), 1.0, rtol=1e-4)  # L1-normalized

    # resume: nothing re-extracted, existing rows untouched
    store2 = extract_features(paths, params, avg, store=store, batch_size=2)
    assert store2 is store and len(store) == 3
    np.testing.assert_allclose(store.get(100), f0)
