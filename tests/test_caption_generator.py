"""Caption generator semantics: confidence gates, buckets, V2 dead zones,
emotion joining, key theory, template completeness."""

import numpy as np
import pytest

from versband_tpu.text.caption_generator import (
    CaptionGenerator, CaptionGenerator2, SimpleKey)


def gen(cls=CaptionGenerator, seed=0):
    return cls(rng=np.random.default_rng(seed))


def test_confidence_gates():
    g = gen()
    # low key conf -> no key mention
    assert g.prepare_key("C major", 0.4) is None
    assert g.prepare_key("C major", 0.6) is not None
    # low tempo conf -> dropped
    assert g.prepare_tempo(120, 0.2) is None
    assert g.prepare_tempo(120, 0.5) is not None


def test_tempo_buckets_v1():
    g = gen()
    assert g._bucket_tempo(60) == "very low"
    assert g._bucket_tempo(80) == "low"
    assert g._bucket_tempo(100) == "medium"
    assert g._bucket_tempo(140) == "high"
    assert g._bucket_tempo(170) == "very high"


def test_v2_dead_zones():
    g = gen(CaptionGenerator2)
    # values inside dead zones -> None phrase (feature dropped)
    assert g.prepare_tempo(70, 1.0) is None     # 69-71 dead zone
    assert g.prepare_tempo(90, 1.0) is None     # 89-91
    assert g.prepare_tempo(120, 1.0) is None    # 119-121
    assert g.prepare_tempo(160, 1.0) is None    # 159-161
    assert g.prepare_tempo(100, 1.0) is not None
    assert g.prepare_avg_pitch(54) is None      # 53-56
    assert g.prepare_avg_pitch(63) is None      # 62-64
    assert g.prepare_avg_pitch(78) is None      # 77-79
    assert g.prepare_avg_pitch(70) is not None


def test_emotion_joining():
    g = gen()
    assert g.prepare_emotion(["happy"]) == "happy"
    two = g.prepare_emotion(["happy", "sad"])
    assert " and " in two and two.count(",") == 0
    three = g.prepare_emotion(["happy", "sad", "calm"])
    assert ", and " in three


def test_relative_keys():
    assert SimpleKey("C major").relative.name == "a minor"
    assert SimpleKey("a minor").relative.name == "C major"
    assert SimpleKey("G major").relative.name == "e minor"
    assert SimpleKey("F# minor").relative.name == "A major"
    assert SimpleKey("C# major").full_name == "C-sharp"


def test_transcribe_full_and_partial_codes():
    for seed in range(8):
        g = gen(seed=seed)
        cap = g.transcribe(key="C major", key_conf=1.0, avg_pitch=70,
                           tempo=100, tempo_conf=1.0,
                           emotion=["romantic"], duration=12.0)
        low = cap.lower()
        assert "major" in low or "minor" in low
        assert "romantic" in low
        assert "pitch" in low
        assert cap.endswith(".")
        # no unfilled slots
        assert "{" not in cap and "[" not in cap

    # nothing known -> empty
    assert gen().transcribe() == ""
    # emotion only
    cap = gen().transcribe(emotion=["tense"])
    assert "tense" in cap
    # tempo only (code 0010)
    cap = gen().transcribe(tempo=100, tempo_conf=1.0)
    assert cap != "" and "{" not in cap


def test_duration_exact_seconds_sometimes():
    outs = {gen(seed=s).prepare_duration(12.0) for s in range(40)}
    assert any(o and "seconds" in o for o in outs)
    assert any(o and "seconds" not in o for o in outs)


def test_seeded_rng_reproducible():
    a = gen(seed=7).transcribe(key="D major", key_conf=1.0, tempo=130,
                               tempo_conf=1.0, emotion=["epic"])
    b = gen(seed=7).transcribe(key="D major", key_conf=1.0, tempo=130,
                               tempo_conf=1.0, emotion=["epic"])
    assert a == b
