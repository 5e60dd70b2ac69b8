"""Pipelined multi-song inference.

The production serving shape from SURVEY.md §2.10: sampler -> VAE decode ->
vocoder as three separately-jitted stages, software-pipelined over a stream of
requests. JAX dispatch is asynchronous, so issuing stage k of item i and
stage k-1 of item i+1 without blocking lets XLA overlap them on-device; the
host only blocks when a finished waveform is collected.

Keeping the stages separate (rather than one fused jit) also keeps each
compiled program small — required under remote-compile limits — and lets
different batch shapes share stage caches.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Deque, Dict, Iterable, Iterator, Optional, Tuple

import jax
import numpy as np


class PipelinedGenerator:
    """Overlap sample/decode/vocode across a request stream.

    ``sample_fn(cond, key) -> z``; ``decode_fn(z) -> mel``;
    ``vocode_fn(mel) -> wav`` — each jitted, params pre-bound.
    ``depth`` bounds in-flight items (device memory).
    """

    def __init__(self, sample_fn: Callable, decode_fn: Callable,
                 vocode_fn: Optional[Callable] = None, depth: int = 2):
        self.sample_fn = sample_fn
        self.decode_fn = decode_fn
        self.vocode_fn = vocode_fn
        self.depth = max(1, depth)

    def generate(self, requests: Iterable[Tuple[Any, jax.Array]]
                 ) -> Iterator[np.ndarray]:
        """requests: iterable of (cond, key). Yields host waveforms (or mels
        when no vocoder), in order."""
        inflight: Deque[Any] = deque()
        it = iter(requests)

        def issue(req):
            cond, key = req
            z = self.sample_fn(cond, key)        # async dispatch
            mel = self.decode_fn(z)
            return self.vocode_fn(mel) if self.vocode_fn is not None else mel

        for req in it:
            inflight.append(issue(req))
            if len(inflight) >= self.depth:
                yield np.asarray(inflight.popleft())  # blocks only on oldest
        while inflight:
            yield np.asarray(inflight.popleft())
