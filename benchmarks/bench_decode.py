import jax, jax.numpy as jnp, numpy as np, time
from lrcn_tpu.config import LRCNConfig
from lrcn_tpu.models import lrcn
from lrcn_tpu.decode.beam import beam_search

cfg = LRCNConfig(hidden=(1000,1000), embed=1000, vocab_size=8800)
params = jax.device_put(lrcn.init_params(jax.random.PRNGKey(0), cfg))
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((256, 4096)), jnp.float32)

def timed(use_pallas, n=8):
    run = lambda: beam_search(params, feats, beam_width=3, max_words=20, use_pallas=use_pallas)
    t_ref = np.asarray(run()[0])
    t0 = time.perf_counter()
    for _ in range(n): out = run()
    toks = np.asarray(out[0])
    dt = (time.perf_counter()-t0)/n
    return dt, toks

dt_x, tok_x = timed(False)
dt_p, tok_p = timed(True)
print(f"xla beam: {dt_x*1e3:.1f} ms/batch -> {256/dt_x:.0f} captions/s")
print(f"pallas beam: {dt_p*1e3:.1f} ms/batch -> {256/dt_p:.0f} captions/s")
print("tokens identical:", np.array_equal(tok_x, tok_p))

# scanned multi-batch dispatch (the flagship configuration; bench.py)
from lrcn_tpu.decode.beam import beam_search_scan
G = 16
stacked = jnp.asarray(rng.standard_normal((G, 256, 4096)), jnp.float32)
run = lambda: beam_search_scan(params, stacked, beam_width=3, max_words=20)
np.asarray(run()[0])
n = 4
t0 = time.perf_counter()
for _ in range(n): out = run()
np.asarray(out[0])
dt = (time.perf_counter()-t0)/n
print(f"scan-of-{G} beam: {dt/G*1e3:.1f} ms/batch -> {G*256/dt:.0f} captions/s")
