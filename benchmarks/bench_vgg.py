import jax, jax.numpy as jnp, numpy as np, time
from lrcn_tpu.models import vgg

params = jax.device_put(vgg.init_vgg_params(jax.random.PRNGKey(0)))
rng = np.random.default_rng(0)
for B in (64, 128, 256):
    imgs = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.float32)
    np.asarray(vgg.vgg16_fc7(params, imgs))  # compile+run
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = vgg.vgg16_fc7(params, imgs)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n
    print(f"B={B}: {dt*1e3:.1f} ms/batch -> {B/dt:.0f} images/s")
