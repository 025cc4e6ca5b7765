"""Native (C++) HTTP front-end: per-request work out of the GIL.

The pure-Python server (serve/http.py) measures ~3k served captions/s
at high concurrency because every request costs ~0.25 ms of Python —
HTTP parse, future, queue hop, thread wakeup — under the GIL
(benchmarks/bench_serve.py).  ``native/httpserve.cpp`` moves ALL
per-request work into C++; this module runs the per-BATCH half: a pump
thread pulls coalesced (id, request, slot) items, maps ids to feature
rows, issues the batched on-device beam search, and pushes caption
strings back.  Dispatch N+1 issues while batch N's tokens transfer
back (same pipelining as serve/batcher.py).

Scope: the caption-by-id hot path plus /healthz and /stats; feature /
base64-image requests get a 501 pointing at the Python server (`lrcn
serve` without ``--native-frontend``), which shares the same endpoint
contract.
"""

from __future__ import annotations

import ctypes
import threading
from collections import deque

from lrcn_tpu.native import httpserve_library
from lrcn_tpu.serve.service import CaptionService

_LL = ctypes.c_longlong


class NativeFrontend:
    """Bind the C++ HTTP server to a ``CaptionService``'s decode path.

    Requires the service to have a feature store (the id fast path; the
    HBM-resident table makes the device feed int32-only end to end).
    """

    def __init__(self, service: CaptionService, host: str = "0.0.0.0",
                 port: int = 8000, n_threads: int = 128,
                 max_queue: int = 4096, wait_ms: int = 3,
                 max_inflight: int = 2):
        if service.store is None:
            raise RuntimeError("native frontend needs a feature store "
                               "(caption-by-id is its fast path)")
        lib = httpserve_library()
        if lib is None:
            raise RuntimeError("native httpserve library unavailable "
                               "(g++ missing or LRCN_NATIVE=0)")
        self.service = service
        self._lib = lib
        self._h = lib.lrcn_serve_start(host.encode(), port, n_threads,
                                       max_queue)
        if not self._h:
            raise RuntimeError(f"could not bind {host}:{port}")
        self.port = lib.lrcn_serve_port(self._h)
        self._row_of = {int(i): int(r) for i, r in zip(
            service.store.ids(),
            service.store.rows(service.store.ids()))}
        self._wait_ms = wait_ms
        self._max_inflight = max_inflight
        self._stop = threading.Event()
        self._pump = threading.Thread(target=self._run, name="lrcn-pump",
                                      daemon=True)
        self._pump.start()

    # --- pump thread: per-batch Python ---

    def _pull(self, max_n: int):
        ids = (_LL * max_n)()
        reqs = (_LL * max_n)()
        slots = (_LL * max_n)()
        n = self._lib.lrcn_serve_next(self._h, ids, reqs, slots, max_n,
                                      self._wait_ms)
        return n, ids, reqs, slots

    def _run(self) -> None:
        svc = self.service
        batch_cap = svc.decode_batch
        pending: deque = deque()
        while not self._stop.is_set():
            n, ids, reqs, slots = self._pull(batch_cap)
            if n:
                rows, keep = [], []
                for i in range(n):
                    row = self._row_of.get(int(ids[i]))
                    if row is None:     # unknown id fails its request
                        self._lib.lrcn_serve_error(
                            self._h, reqs[i], 400,
                            f"unknown image id {int(ids[i])}".encode())
                        continue
                    rows.append(row)
                    keep.append(i)
                if keep:
                    raw = svc._decode_rows_fn(rows)   # issue, don't wait
                    pending.append((raw, [reqs[i] for i in keep],
                                    [slots[i] for i in keep]))
            # fetch completed batches; drain fully when idle
            while pending and (len(pending) > self._max_inflight
                               or (n == 0 and pending)):
                raw, preqs, pslots = pending.popleft()
                captions = svc._decode_finalize(raw)
                k = len(captions)
                reqs_arr = (_LL * k)(*preqs)
                slots_arr = (_LL * k)(*pslots)
                caps_arr = (ctypes.c_char_p * k)(
                    *[c.encode() for c in captions])
                self._lib.lrcn_serve_respond(self._h, reqs_arr, slots_arr,
                                             caps_arr, k)
        # flush whatever was still in flight at stop
        while pending:
            raw, preqs, pslots = pending.popleft()
            captions = svc._decode_finalize(raw)
            k = len(captions)
            self._lib.lrcn_serve_respond(
                self._h, (_LL * k)(*preqs), (_LL * k)(*pslots),
                (ctypes.c_char_p * k)(*[c.encode() for c in captions]), k)

    # --- ops ---

    def stop(self) -> None:
        self._stop.set()
        self._pump.join(timeout=10)
        self._lib.lrcn_serve_stop(self._h)
