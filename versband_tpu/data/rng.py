"""Thread-safe per-dataset randomness for the threaded prefetch loader.

numpy ``Generator`` objects are documented NOT thread-safe, and
``data.datamodule.DataLoader`` maps ``dataset[i]`` (and ``load_batch``)
across a thread pool — concurrent draws on one shared generator can return
duplicated/undefined values, silently skewing crop positions and CFG
dropout rates. (The reference has the same latent race: its
``worker_init_fn`` is defined but passed as ``init_fn=None``,
``main.py:180-186,225`` — torch processes hide it by forking state.)

``ThreadLocalRNG`` gives each loader thread its own deterministically
seeded ``np.random.Generator`` stream (seed, thread-arrival-index) and
delegates the full Generator API to it.
"""

from __future__ import annotations

import itertools
import threading

import numpy as np


class ThreadLocalRNG:
    def __init__(self, seed=0):
        if seed is None:  # match default_rng(None): fresh OS entropy
            seed = int(np.random.SeedSequence().generate_state(1)[0])
        self._seed = int(seed)
        self._local = threading.local()
        self._counter = itertools.count()
        self._lock = threading.Lock()

    def _generator(self) -> np.random.Generator:
        rng = getattr(self._local, "rng", None)
        if rng is None:
            with self._lock:
                n = next(self._counter)
            rng = np.random.default_rng([self._seed, n])
            self._local.rng = rng
        return rng

    def __getattr__(self, name):
        return getattr(self._generator(), name)
