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
agree = float((tok_x == tok_p).mean())
print(f"token agreement: {agree:.3f} (random params = near-ties everywhere; "
      f"the kernel's numeric deltas vs XLA are recorded in its docstring)")

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

# the reference's actual eval protocols: beam 4 (COCO) and beam 10
# (Flickr), 30-word cap (lrcn.jl:131-157) — same scanned dispatch
for bw, words in ((4, 30), (10, 30)):
    G2 = 8
    stacked2 = jnp.asarray(rng.standard_normal((G2, 256, 4096)), jnp.float32)
    run = lambda: beam_search_scan(params, stacked2, beam_width=bw, max_words=words)
    np.asarray(run()[0])
    t0 = time.perf_counter()
    for _ in range(3): out = run()
    np.asarray(out[0])
    dt = (time.perf_counter()-t0)/3
    print(f"beam {bw}, {words} words: {G2*256/dt:,.0f} captions/s")
