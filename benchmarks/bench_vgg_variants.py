"""VGG pathological-layer experiments: conv1_2 (64-lane width) and the
conv5 block (14x14 sublane padding) — the two layers holding whole-
network MXU utilization at 39% (docs/SPEED_OF_LIGHT.md).

Variants measured against the baseline full network (B=256, bf16):

- ``conv5_wpad``: pad conv5 inputs' W dim with the SAME-padding zero
  columns explicitly (14 -> 16, the bf16 sublane tile) and run the conv
  VALID over W — identical math, ZERO extra FLOPs (unlike the rejected
  16x16 pad, which recomputed 1.31x), one fused pad per conv.
- ``conv1_2_hpair``: compute TWO adjacent output ROWS per conv window
  by packing them into the output-channel dim (64 -> 128 lanes, the
  full MXU width): kernel (4,3,64,128) stride-2-H over a 1-padded
  input.  4/3x FLOP tax for 2x lane utilization.  pool1 then reduces
  the row pair straight out of the channel dim (reshape-max) fused
  with the W-pair max — the paired layout is never un-interleaved.
- ``conv1_2_wpair``: same trick along W (kernel (3,4,64,128),
  stride-2-W).
- combinations.

Every variant is checked numerically against the baseline (float32)
before timing.  Run on the real chip; syncs via scalar host transfer.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from lrcn_tpu.models import vgg

B_CHECK = 4


def _conv(x, w, b, compute_dtype, padding=((1, 1), (1, 1)),
          strides=(1, 1)):
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype),
        window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype)
    return y + b.astype(compute_dtype)


def _maxpool(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1), padding="VALID")


def _conv5_wpad(x, p, compute_dtype):
    """SAME 3x3 conv with the W-pad zeros materialized (14 -> 16 wide,
    the bf16 sublane tile) and VALID W: bit-identical outputs, no
    recompute."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return _conv(xp, p["w"], p["b"], compute_dtype,
                 padding=((1, 1), (0, 0)))


def _pair_kernel_h(w):
    """(3,3,Ci,Co) -> (4,3,Ci,2Co): out[...,:Co] is the EVEN output row
    (taps 0..2 of the 4-row window), out[...,Co:] the ODD row (taps
    1..3)."""
    ci, co = w.shape[2], w.shape[3]
    k = jnp.zeros((4, 3, ci, 2 * co), w.dtype)
    k = k.at[0:3, :, :, :co].set(w)
    k = k.at[1:4, :, :, co:].set(w)
    return k


def _conv1_2_hpair(x, p, compute_dtype):
    """(B,224,224,64) -> (B,112,224,128): rows paired into channels.
    Window at padded row 2t covers input rows 2t-1..2t+2; the kernel's
    two tap blocks produce output rows 2t and 2t+1."""
    k = _pair_kernel_h(p["w"].astype(compute_dtype))
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    y = lax.conv_general_dilated(
        xp, k, window_strides=(2, 1), padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype)
    b = p["b"].astype(compute_dtype)
    return y + jnp.concatenate([b, b])


def _pool1_from_hpair(y):
    """relu'd (B,112,224,128) paired rows -> pool1 (B,112,112,64):
    the H pair maxes out of the channel dim, the W pair out of a
    reshape — 2x2 pool without ever un-interleaving."""
    bsz, h2, w, c2 = y.shape
    y = y.reshape(bsz, h2, w // 2, 2, 2, c2 // 2)
    #                         (W pair)(H pair)
    return y.max(axis=(3, 4))


def _conv5_block_tapmm(x, params, compute_dtype):
    """The whole conv5 block as tap-matmuls on the flattened padded
    16x16 grid: SAME 3x3 conv == 9 accumulated (B*256, C) @ (C, Co)
    matmuls over CONTIGUOUS slices of the flat activation (offset
    di*16+dj), which are perfectly MXU-shaped — trading a 256/196 =
    1.31x FLOP tax for the ~50% -> ~98% tile utilization the 14x14
    sublane padding costs the native conv.  Border positions are
    garbage after each conv and are re-zeroed by one fused mask so the
    next conv's implicit padding stays exact.  Bit-exact on the
    interior (verified vs baseline in float32 on CPU)."""
    bsz, h, w, c = x.shape          # (B, 14, 14, 512)
    assert (h, w) == (14, 14)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))   # (B,16,16,C)
    xf = xp.reshape(bsz, 256, c).astype(compute_dtype)
    ii, jj = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    interior = ((ii >= 1) & (ii <= 14) & (jj >= 1) & (jj <= 14))
    mask = jnp.asarray(interior.reshape(1, 256, 1), compute_dtype)
    for name in ("conv5_1", "conv5_2", "conv5_3"):
        p = params[name]
        wk = p["w"].astype(compute_dtype)               # (3,3,C,Co)
        co = wk.shape[3]
        xe = jnp.pad(xf, ((0, 0), (17, 17), (0, 0)))    # flat-dim halo
        y = jnp.zeros((bsz, 256, co), compute_dtype)
        for di in range(3):
            for dj in range(3):
                off = (di - 1) * 16 + (dj - 1)
                xs = lax.dynamic_slice_in_dim(xe, 17 + off, 256, axis=1)
                y = y + jnp.einsum(
                    "bpc,cf->bpf", xs, wk[di, dj],
                    preferred_element_type=compute_dtype)
        y = jax.nn.relu(y + p["b"].astype(compute_dtype))
        xf = y * mask
    x = xf.reshape(bsz, 16, 16, -1)[:, 1:15, 1:15, :]
    return x


def _conv1_block_nchw(x, params, compute_dtype):
    """conv1_1 + conv1_2 + pool1 in NCHW: with C=64 (half the 128-lane
    MXU width in NHWC), feature-first puts the big spatial dims on the
    lanes instead; one transpose back to NHWC at the 4x-smaller pool1
    output."""
    x = jnp.transpose(x, (0, 3, 1, 2)).astype(compute_dtype)
    for name in ("conv1_1", "conv1_2"):
        p = params[name]
        y = lax.conv_general_dilated(
            x, p["w"].astype(compute_dtype), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=compute_dtype)
        x = jax.nn.relu(y + p["b"].astype(compute_dtype)[:, None, None])
    x = lax.reduce_window(
        x, -jnp.inf, lax.max, window_dimensions=(1, 1, 2, 2),
        window_strides=(1, 1, 2, 2), padding="VALID")
    return jnp.transpose(x, (0, 2, 3, 1))


def _conv1_2_wpair(x, p, compute_dtype):
    """Same pairing along W: kernel (3,4,64,128), stride-2-W."""
    w = p["w"].astype(compute_dtype)
    ci, co = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 4, ci, 2 * co), w.dtype)
    k = k.at[:, 0:3, :, :co].set(w)
    k = k.at[:, 1:4, :, co:].set(w)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, k, window_strides=(1, 2), padding=((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype)
    b = p["b"].astype(compute_dtype)
    return y + jnp.concatenate([b, b])


def _pool1_from_wpair(y):
    """(B,224,112,128) paired cols -> (B,112,112,64)."""
    bsz, h, w2, c2 = y.shape
    y = y.reshape(bsz, h // 2, 2, w2, 2, c2 // 2)
    return y.max(axis=(2, 4))


def forward(params, images, compute_dtype, conv5="base", c12="base"):
    """Full VGG->fc7 with the selected variant layers."""
    x = images
    it = iter(vgg.VGG16_LAYOUT)
    for entry in it:
        if entry == "pool":
            x = _maxpool(x)
            continue
        name, _ = entry
        p = params[name]
        if name == "conv1_1" and c12 == "nchw":
            x = _conv1_block_nchw(x, params, compute_dtype)
            assert next(it)[0] == "conv1_2"
            assert next(it) == "pool"
            continue
        if name == "conv5_1" and conv5 == "tapmm":
            x = _conv5_block_tapmm(x, params, compute_dtype)
            assert next(it)[0] == "conv5_2"
            assert next(it)[0] == "conv5_3"
            continue
        if name == "conv5_1" and conv5 == "barrier":
            x = lax.optimization_barrier(x)
        if name == "conv1_2" and c12 != "base":
            if c12 == "hpair":
                x = jax.nn.relu(_conv1_2_hpair(x, p, compute_dtype))
                x = _pool1_from_hpair(x)
            else:
                x = jax.nn.relu(_conv1_2_wpair(x, p, compute_dtype))
                x = _pool1_from_wpair(x)
            nxt = next(it)              # swallow the fused pool1
            assert nxt == "pool", nxt
            continue
        if name.startswith("conv5") and conv5 == "wpad":
            x = jax.nn.relu(_conv5_wpad(x, p, compute_dtype))
            continue
        x = jax.nn.relu(_conv(x, p["w"], p["b"], compute_dtype))
    w6, b6 = params["fc6"]["w"], params["fc6"]["b"]
    x = jnp.einsum("bhwc,hwcf->bf", x.astype(compute_dtype),
                   w6.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    x = jax.nn.relu(x + b6.astype(jnp.float32))
    from lrcn_tpu.ops.lstm import matmul
    x = matmul(x, params["fc7"]["w"], compute_dtype)
    return x + params["fc7"]["b"].astype(jnp.float32)


_CHECK_BASE = {}


def check(params, variant_kw):
    # On CPU: TPU float32 convs still tile onto the MXU, so two
    # mathematically-identical convs with different shapes round
    # differently (observed ~4e-2 at fc7 through 13 layers).  CPU
    # convs are exact f32, making this a real identity check.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        imgs = jnp.asarray(np.random.default_rng(0).standard_normal(
            (B_CHECK, 224, 224, 3)), jnp.float32)
        pc = jax.device_put(params, cpu)
        if id(params) not in _CHECK_BASE:
            _CHECK_BASE[id(params)] = jax.jit(
                lambda p, x: forward(p, x, jnp.float32))(pc, imgs)
        base = _CHECK_BASE[id(params)]
        var = jax.jit(lambda p, x: forward(p, x, jnp.float32,
                                           **variant_kw))(pc, imgs)
    np.testing.assert_allclose(np.asarray(var), np.asarray(base),
                               rtol=2e-4, atol=2e-4)


def bench(params, imgs, n, **variant_kw):
    f = jax.jit(lambda p, x: forward(p, x, jnp.bfloat16,
                                     **variant_kw).sum())
    float(f(params, imgs))
    t0 = time.perf_counter()
    outs = [f(params, imgs) for _ in range(n)]
    float(outs[-1])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    ap.add_argument("--check-width", type=float, default=1.0,
                    help="width_multiplier for the CPU numerics check "
                         "(the f32 identity holds at any width; <1 "
                         "makes the 1-core check affordable)")
    ap.add_argument("--skip-checks", action="store_true")
    args = ap.parse_args()

    cpu = jax.devices("cpu")[0]
    variants = {
        "baseline": {},
        "conv5_wpad": {"conv5": "wpad"},
        "conv5_tapmm": {"conv5": "tapmm"},
        "conv5_barrier": {"conv5": "barrier"},
        "c12_hpair": {"c12": "hpair"},
        "c12_wpair": {"c12": "wpair"},
        "c12_nchw": {"c12": "nchw"},
        "hpair+wpad": {"c12": "hpair", "conv5": "wpad"},
        "nchw+tapmm": {"c12": "nchw", "conv5": "tapmm"},
        "nchw+barrier": {"c12": "nchw", "conv5": "barrier"},
    }
    if args.only:
        keep = set(args.only.split(","))
        keep.add("baseline")
        variants = {k: v for k, v in variants.items() if k in keep}
    if not args.skip_checks:
        # checks run ENTIRELY on CPU (params included) before the TPU
        # is touched at all — large tunnel transfers interleaved with
        # host compiles have been observed to wedge the remote runtime
        with jax.default_device(cpu):
            check_params = vgg.init_vgg_params(
                jax.random.PRNGKey(0),
                **({} if args.check_width == 1.0 else
                   {"width_multiplier": args.check_width, "fc_dim": 64}))
        for name, kw in variants.items():
            if kw:
                print(f"check {name}...", flush=True)
                check(check_params, kw)
        print(f"numerics OK (float32 CPU, rtol 2e-4 vs baseline, "
              f"width x{args.check_width})")

    print("init TPU params...", flush=True)
    params = jax.device_put(vgg.init_vgg_params(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)
    print("params on device", flush=True)
    imgs = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, 224, 224, 3)), jnp.float32)
    base_dt = None
    for name, kw in variants.items():
        print(f"bench {name}...", flush=True)
        dt = bench(params, imgs, args.iters, **kw)
        if base_dt is None:
            base_dt = dt
        print(f"{name:>12}: {dt*1e3:7.1f} ms/batch  "
              f"{args.batch/dt:7.0f} img/s  "
              f"({base_dt/dt:.3f}x)")


if __name__ == "__main__":
    main()
