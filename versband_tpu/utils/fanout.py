"""Single-command multi-process fan-out for the rank-strided CLIs.

The reference self-spawns one worker per GPU (``mp.spawn`` at
``preprocess/mel_spec_24k.py:325-328`` and ``scripts/test_final.py:467-477``
with NCCL rank init). The TPU-native CLIs shard work with ``--rank/--world``
instead (host-side striding, no collective needed); this helper restores the
one-command ergonomics: ``--nproc N`` re-execs the same CLI N times with the
rank flags appended and waits for all children.

Note on devices: on a single-chip host the children must not all grab the
TPU — pass ``--platform cpu`` (generate) or use it for the CPU-bound
preprocess CLIs, where N processes genuinely parallelize decode/resample.
"""

from __future__ import annotations

import subprocess
import sys
from typing import Iterable, List, Optional


def strip_flag(argv: Iterable[str], flag: str) -> List[str]:
    """Remove ``flag <value>`` / ``flag=value`` occurrences from an argv."""
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a == flag:
            skip = True
            continue
        if a.startswith(flag + "="):
            continue
        out.append(a)
    return out


def spawn_ranks(module: str, argv: Iterable[str], nproc: int,
                extra_env: Optional[dict] = None) -> int:
    """Run ``python -m <module> <argv> --rank i --world nproc`` x nproc.

    Children stream to this process's stdout/stderr. Returns the max child
    return code (0 iff all succeeded).
    """
    import os

    argv = strip_flag(list(argv), "--nproc")
    procs = []
    env = {**os.environ, **(extra_env or {})}
    for r in range(nproc):
        cmd = [sys.executable, "-m", module, *argv,
               "--rank", str(r), "--world", str(nproc)]
        procs.append(subprocess.Popen(cmd, env=env))
    rcs = [p.wait() for p in procs]
    for r, rc in enumerate(rcs):
        if rc:
            print(f"[fanout] rank {r} exited {rc}", file=sys.stderr)
    return max(rcs)
