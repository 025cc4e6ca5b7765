import jax, jax.numpy as jnp, numpy as np, time
from lrcn_tpu.ops.lstm import lstm_step
from lrcn_tpu.ops.pallas import fused_lstm_step

rng = np.random.default_rng(0)
B, X, H = 768, 1000, 1000
w = jnp.asarray(rng.standard_normal((X+H, 4*H))*0.05, jnp.float32)
b = jnp.asarray(rng.standard_normal((4*H,))*0.1, jnp.float32)
h = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
c = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
x = jnp.asarray(rng.standard_normal((B, X)), jnp.float32)

ho, co = fused_lstm_step(w, b, h, c, x, compute_dtype=jnp.float32)
hr, cr = lstm_step(w, b, h, c, x, compute_dtype=jnp.float32)
print("max |dh|:", float(jnp.max(jnp.abs(ho-hr))), "max |dc|:", float(jnp.max(jnp.abs(co-cr))))

pall = jax.jit(lambda: fused_lstm_step(w, b, h, c, x))
xla  = jax.jit(lambda: lstm_step(w, b, h, c, x))
def timeit(f, n=50):
    np.asarray(f()[0])
    t0 = time.perf_counter()
    for _ in range(n): out = f()
    np.asarray(out[0])
    return (time.perf_counter()-t0)/n
print("pallas bf16 step:", timeit(pall)*1e3, "ms")
print("xla    bf16 step:", timeit(xla)*1e3, "ms")
