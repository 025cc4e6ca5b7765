"""Served throughput over REAL HTTP: Python vs native (C++) front-end.

Client load comes from separate PROCESSES (multiprocessing spawn) so
the measurement shows server capacity, not client-GIL contention: each
client process runs many threads of keep-alive caption-by-id requests,
and the timing window opens at a start barrier (spawn/import startup
excluded).

Committed run (one TPU v5e chip, healthy tunnel window, 2026-08-17):

| concurrent clients | python frontend | native frontend |
|---|---|---|
| 128 |   699/s p50 161ms |   828/s p50 128ms |
| 256 |   875/s p50 249ms | 1,151/s p50 173ms |
| 512 | 1,139/s p50 364ms | 1,621-1,770/s p50 212-228ms |

The native front-end serves ~1.5x the throughput at 40% lower p50 at
512 clients: per-request Python (~0.25 ms of GIL for HTTP parse +
future + wakeup) is what saturates the Python server, and C++ removes
it.  (benchmarks/bench_serve.py's 3,045/s number is the in-process
service API — no HTTP — and not comparable.)

Usage: python benchmarks/bench_serve_http.py [python|native|both]
"""
import json
import multiprocessing as mp
import sys
import threading
import time

import numpy as np


def client_proc(port, n_threads, per_thread, out_queue, barrier):
    import http.client

    lat = []
    lock = threading.Lock()
    barrier.wait()          # measurement starts when every client is up

    def worker(tid):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        for r in range(per_thread):
            body = json.dumps({"id": (tid * 31 + r) % 512})
            t0 = time.perf_counter()
            conn.request("POST", "/v1/caption", body=body,
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = resp.read()
            assert resp.status == 200, (resp.status, data[:100])
            with lock:
                lat.append((time.perf_counter() - t0) * 1e3)
        conn.close()

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out_queue.put(lat)


def run_load(port, n_procs=4, n_threads=32, per_thread=30):
    # spawn: clean client processes (forking the TPU-initialized parent
    # inherits its threads/locks); also excludes process startup from
    # the measured window via the ready barrier below
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    barrier = ctx.Barrier(n_procs + 1)
    procs = [ctx.Process(target=client_proc,
                         args=(port, n_threads, per_thread, q, barrier))
             for _ in range(n_procs)]
    for p in procs:
        p.start()
    barrier.wait()          # exclude spawn/import startup from the window
    t0 = time.perf_counter()
    lats = []
    for _ in procs:
        lats.extend(q.get())
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    n = n_procs * n_threads * per_thread
    lats.sort()
    return (n / wall, lats[len(lats) // 2], lats[int(0.99 * len(lats))])


def build_service():
    import jax

    from lrcn_tpu.config import LRCNConfig
    from lrcn_tpu.core.vocab import Vocab
    from lrcn_tpu.data.feature_store import FeatureStore
    from lrcn_tpu.models import lrcn
    from lrcn_tpu.serve import CaptionService

    cfg = LRCNConfig(hidden=(1000, 1000), embed=1000, vocab_size=8800)
    vocab = Vocab([f"w{i}" for i in range(cfg.vocab_size - 3)])
    params = jax.device_put(lrcn.init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    feats = {i: np.abs(rng.standard_normal(cfg.cnn_feature_dim))
             .astype(np.float32) for i in range(512)}
    store = FeatureStore.from_dict(
        {k: v / v.sum() for k, v in feats.items()}, normalized=True)
    svc = CaptionService(cfg, params, vocab, store=store, beam_width=3,
                        max_words=20, decode_batch=256, max_wait_ms=10.0)
    svc.warmup()
    return svc


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    svc = build_service()

    if which in ("python", "both"):
        from lrcn_tpu.serve import make_server

        server = make_server(svc, host="127.0.0.1", port=0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        run_load(port, n_procs=1, per_thread=2)        # warm
        rate, p50, p99 = run_load(port)
        server_stats = json.dumps(svc.stats().get("decode_ids", {}))
        print(f"python frontend: {rate:8,.0f} captions/s  "
              f"p50={p50:.0f}ms p99={p99:.0f}ms")
        server.shutdown()
        server.server_close()

    if which in ("native", "both"):
        from lrcn_tpu.serve.native_http import NativeFrontend

        fe = NativeFrontend(svc, host="127.0.0.1", port=0,
                            n_threads=256, wait_ms=10)
        run_load(fe.port, n_procs=1, per_thread=2)     # warm
        rate, p50, p99 = run_load(fe.port)
        print(f"native frontend: {rate:8,.0f} captions/s  "
              f"p50={p50:.0f}ms p99={p99:.0f}ms")
        fe.stop()

    svc.close()


if __name__ == "__main__":
    main()
