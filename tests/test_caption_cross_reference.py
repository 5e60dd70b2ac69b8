"""Caption cross-validation against the REFERENCE generator's own code
(VERDICT r2 item 8).

Imports ``/root/reference/ldm/modules/encoders/caption_generator.py`` directly
(music21 stubbed with an adapter over this repo's SimpleKey — the only
unavailable dependency) and asserts byte-identical prompts against this
framework's ``templates='reference'`` mode over a seeded feature grid, for
both V1 and V2.  This pins BOTH the template banks and the global
np.random/random call order; it fails if either drifts.
"""

import importlib.util
import os
import random
import sys
import types

import numpy as np
import pytest

from versband_tpu.text.caption_generator import (
    _ACCIDENTAL_FULL, CaptionGenerator, CaptionGenerator2, SimpleKey)

REF_PATH = "/root/reference/ldm/modules/encoders/caption_generator.py"


class _Tonic:
    """music21 Pitch stand-in exposing the three attributes the reference
    formats (``caption_generator.py:620-624``)."""

    def __init__(self, sk: SimpleKey):
        self._sk = sk

    @property
    def fullName(self):  # noqa: N802 - music21 API name
        return self._sk.full_name

    @property
    def step(self):
        return self._sk.step

    @property
    def accidental(self):
        a = self._sk.accidental
        return _ACCIDENTAL_FULL.get(a, a) if a else None


class _Key:
    def __init__(self, name):
        self._sk = name if isinstance(name, SimpleKey) else SimpleKey(name)
        self.tonic = _Tonic(self._sk)
        self.mode = self._sk.mode
        self.name = self._sk.name

    @property
    def relative(self):
        return _Key(self._sk.relative)


@pytest.fixture(scope="module")
def ref_mod():
    if not os.path.exists(REF_PATH):
        pytest.skip("reference tree not available")
    m21 = types.ModuleType("music21")
    keymod = types.ModuleType("music21.key")
    keymod.Key = _Key
    m21.key = keymod
    saved = {k: sys.modules.get(k) for k in ("music21", "music21.key")}
    sys.modules["music21"] = m21
    sys.modules["music21.key"] = keymod
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_caption_generator", REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# covers every presence code incl. duration branches, V2 dead zones
# (tempo 70, pitch 54/63, duration 5.0/10.0), relative-key flips, emotion
# list shuffles, and sub-threshold confidences
GRID = [
    dict(key="C major", key_conf=0.9, avg_pitch=60, tempo=100, tempo_conf=0.9,
         emotion=["happy", "bright"], duration=None),
    dict(key="f#", key_conf=0.8, avg_pitch=70, tempo=130, tempo_conf=0.7,
         emotion=["melancholic", "soft", "tender"], duration=12.3),
    dict(key="E- major", key_conf=0.9, avg_pitch=None, tempo=80,
         tempo_conf=0.9, emotion=["calm"], duration=7.0),
    dict(key=None, key_conf=0.0, avg_pitch=82, tempo=165, tempo_conf=0.95,
         emotion=["angry", "wild"], duration=None),
    dict(key="a", key_conf=0.2, avg_pitch=50, tempo=100, tempo_conf=0.1,
         emotion=None, duration=18.0),  # confs below threshold -> dropped
    dict(key="G major", key_conf=0.9, avg_pitch=58, tempo=None,
         tempo_conf=0.0, emotion=["joyful", "festive"], duration=3.0),
    dict(key=None, key_conf=0.0, avg_pitch=None, tempo=110, tempo_conf=0.9,
         emotion=None, duration=None),
    dict(key="B- minor", key_conf=0.9, avg_pitch=65, tempo=70,
         tempo_conf=0.9, emotion=["dark"], duration=5.0),   # V2 dead zones
    dict(key="D", key_conf=0.9, avg_pitch=54, tempo=90, tempo_conf=0.9,
         emotion=["hopeful", "light"], duration=10.0),      # V2 dead zones
    dict(key=None, key_conf=0.0, avg_pitch=63, tempo=None, tempo_conf=0.0,
         emotion=["serene"], duration=20.0),
    dict(key="F major", key_conf=0.9, avg_pitch=None, tempo=None,
         tempo_conf=0.0, emotion=None, duration=None),
    dict(key=None, key_conf=0.0, avg_pitch=None, tempo=None, tempo_conf=0.0,
         emotion=None, duration=None),                       # code 0000 -> ''
]


@pytest.mark.parametrize("version", [1, 2])
def test_byte_identical_prompts_vs_reference_code(ref_mod, version):
    ours_cls = CaptionGenerator if version == 1 else CaptionGenerator2
    ref_cls = (ref_mod.CaptionGenerator if version == 1
               else ref_mod.CaptionGenerator2)
    ours = ours_cls(templates="reference")
    theirs = ref_cls()
    for seed in (0, 1, 7, 123):
        for feat in GRID:
            np.random.seed(seed)
            random.seed(seed)
            got = ours.transcribe(**feat)
            np.random.seed(seed)
            random.seed(seed)
            want = theirs.transcribe(**feat)
            assert got == want, (
                f"v{version} seed={seed} feat={feat}\n ours: {got!r}\n "
                f"ref: {want!r}")
