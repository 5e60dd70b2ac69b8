"""Multi-process batch loading: the process-pool analogue of the reference's
``DataLoader(num_workers=16)`` (``main.py:249-251``).

The threaded loader (``data.datamodule.DataLoader``) relies on numpy IO
releasing the GIL; per-item *Python* work (caption templating, dict
assembly, pandas row access) stays GIL-bound and caps throughput on
multi-core hosts. ``ProcessDataLoader`` moves the whole item+collate path
into persistent worker processes:

- Workers are ``spawn``-ed (never forked — the parent may hold a live TPU
  client whose threads/fds must not leak into children) and persist across
  epochs; each worker rebuilds its OWN dataset from the pickled *config*
  (``instantiate_from_config``), so live datasets, memmaps, and pandas
  frames are never pickled.
- Workers force ``JAX_PLATFORMS=cpu`` before any import so a dataset that
  incidentally touches jax can never grab the accelerator.
- Results are re-ordered by sequence id, so the batch stream is identical
  to the single-worker order regardless of which worker finishes first
  (the torch DataLoader's reordering contract).
- A worker exception is shipped back with its traceback and re-raised in
  the parent (no silent drops); a dead worker is detected by joining on
  queue timeouts instead of hanging the trainer.
"""

from __future__ import annotations

import atexit
import os
import pickle
import queue as queue_mod
from typing import Any, Iterator, List, Optional


def _worker_main(cfg_blob: bytes, in_q, out_q, worker_id: int,
                 seed: Optional[int]) -> None:
    # Force the CPU backend before the dataset (or anything it imports) can
    # initialize jax — workers must never open the parent's TPU.
    os.environ["JAX_PLATFORMS"] = "cpu"
    from versband_tpu.utils.config import instantiate_from_config

    try:
        cfg = pickle.loads(cfg_blob)
        if seed is not None:
            # distinct, deterministic stream per worker (crops / CFG dropout)
            cfg = dict(cfg)
            params = dict(cfg.get("params") or {})
            if "seed" in params and params["seed"] is not None:
                params["seed"] = int(params["seed"]) + worker_id
                cfg["params"] = params
        ds = instantiate_from_config(cfg)
    except Exception:
        import traceback

        out_q.put((-1, False, traceback.format_exc()))
        return
    collate = getattr(ds, "collater", None) or (lambda items: items)
    batch_loader = getattr(ds, "load_batch", None)
    while True:
        job = in_q.get()
        if job is None:
            return
        seq, idx_list = job
        try:
            if batch_loader is not None:
                batch = batch_loader(idx_list)
            else:
                batch = collate([ds[i] for i in idx_list])
            out_q.put((seq, True, batch))
        except Exception:
            import traceback

            out_q.put((seq, False, traceback.format_exc()))


class ProcessDataLoader:
    """Iterable over collated batches assembled by worker processes.

    ``dataset_cfg`` is an ``instantiate_from_config`` dict (each worker
    builds its own copy); ``batch_sampler`` yields index lists in the
    parent. ``prefetch`` batches are kept in flight across the pool
    (default: 2 per worker).
    """

    def __init__(self, dataset_cfg, batch_sampler, num_procs: int = 4,
                 prefetch: Optional[int] = None, seed: Optional[int] = 0,
                 result_timeout: float = 300.0):
        self.dataset_cfg = dataset_cfg
        self.batch_sampler = batch_sampler
        self.num_procs = max(1, int(num_procs))
        self.prefetch = prefetch if prefetch is not None else 2 * self.num_procs
        self.seed = seed
        self.result_timeout = result_timeout
        self._procs: Optional[list] = None
        self._in_q = self._out_q = None

    def __len__(self) -> int:
        return len(self.batch_sampler)

    def _ensure_pool(self) -> None:
        if self._procs is not None:
            return
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        self._in_q = ctx.Queue()
        self._out_q = ctx.Queue()
        blob = pickle.dumps(self.dataset_cfg)
        self._procs = [
            ctx.Process(target=_worker_main,
                        args=(blob, self._in_q, self._out_q, w, self.seed),
                        daemon=True, name=f"vb-loader-{w}")
            for w in range(self.num_procs)]
        for p in self._procs:
            p.start()
        atexit.register(self.close)

    def close(self) -> None:
        if self._procs is None:
            return
        procs, self._procs = self._procs, None
        for _ in procs:
            try:
                self._in_q.put_nowait(None)
            except Exception:
                pass
        for p in procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        for q in (self._in_q, self._out_q):
            try:
                q.close()
            except Exception:
                pass
        self._in_q = self._out_q = None

    def _next_result(self):
        """out_q.get that notices dead workers instead of hanging forever."""
        deadline = self.result_timeout
        while True:
            try:
                return self._out_q.get(timeout=min(deadline, 1.0))
            except queue_mod.Empty:
                dead = [p.name for p in self._procs if not p.is_alive()]
                if dead:
                    self.close()
                    raise RuntimeError(
                        f"loader worker(s) died without a result: {dead}")
                deadline -= 1.0
                if deadline <= 0:
                    self.close()
                    raise TimeoutError(
                        f"no loader batch within {self.result_timeout}s")

    def __iter__(self) -> Iterator[Any]:
        self._ensure_pool()
        # Epoch tag in the sequence id: an abandoned iteration (trainer break
        # on max_steps) leaves in-flight results in out_q; without the tag
        # they would collide with the next epoch's seq 0..N and deliver stale
        # batches out of order.
        self._epoch = getattr(self, "_epoch", 0) + 1
        epoch = self._epoch
        batches: List[List[int]] = [list(b) for b in self.batch_sampler]
        it = iter(batches)
        submitted = 0
        for _ in range(min(self.prefetch, len(batches))):
            self._in_q.put(((epoch, submitted), next(it)))
            submitted += 1
        buf = {}
        for next_seq in range(len(batches)):
            while next_seq not in buf:
                seq, ok, payload = self._next_result()
                if not ok:
                    self.close()
                    raise RuntimeError(f"loader worker failed:\n{payload}")
                if isinstance(seq, tuple) and seq[0] != epoch:
                    continue  # stale result from an abandoned iteration
                buf[seq[1] if isinstance(seq, tuple) else seq] = payload
            batch = buf.pop(next_seq)
            try:
                self._in_q.put(((epoch, submitted), next(it)))
                submitted += 1
            except StopIteration:
                pass
            yield batch
