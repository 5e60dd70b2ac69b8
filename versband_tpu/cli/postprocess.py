"""Post-processing CLI — the ``preprocess/postprocess.py`` equivalent.

    python -m versband_tpu.cli.postprocess --manifest music.tsv \
        --notes notes.npy --beats beats_dict.npy --out_dir out/

Joins the audio manifest with per-item MIDI notes ({'pitches', 'note_durs'})
and beat times, converting to FRAME-LEVEL arrays at 75 fps (24 kHz / hop 320):
  * note durations -> per-frame pitch ids 0..127 (``postprocess.py:272-301``);
  * beat times     -> 0/1 impulse frames (``postprocess.py:307-315``);
  * length-consistency asserts vs the vocal mel, with skip counters;
emits ``total.tsv`` + ``midi.npy`` + ``beats.npy`` dicts keyed by item name.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

SR = 24000
HOP = 320
FPS = SR / HOP


def get_parser():
    p = argparse.ArgumentParser("versband_tpu postprocess")
    p.add_argument("--manifest", required=True,
                   help="music.tsv with name/mel_path/vocal_mel_path/wav_len")
    p.add_argument("--notes", required=True,
                   help="npy dict: name -> {'pitches', 'note_durs'}")
    p.add_argument("--beats", required=True,
                   help="npy dict: name -> [[time_s, ...], ...]")
    p.add_argument("--music_feat", default=None,
                   help="optional music-feature tsv (key/tempo/emotion cols)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--max_wav_len", type=float, default=20.0)
    p.add_argument("--frame_tolerance", type=int, default=10)
    return p


def notes_to_frame_pitches(pitches, note_durs, fps: float = FPS) -> np.ndarray:
    frames = [round(float(d) * fps) for d in note_durs]
    out = []
    for pitch, n in zip(pitches, frames):
        out.extend([int(pitch)] * n)
    return np.asarray(out, np.int64)


def beats_to_frames(beats, n_frames: int, fps: float = FPS) -> np.ndarray:
    out = np.zeros(n_frames, np.int64)
    for beat in beats:
        t = beat[0] if hasattr(beat, "__len__") else beat
        frame = int(float(t) * fps)
        if frame < n_frames:
            out[frame] = 1
    return out


def main(argv=None) -> int:
    opt = get_parser().parse_args(argv)
    os.makedirs(opt.out_dir, exist_ok=True)
    df = pd.read_csv(opt.manifest, sep="\t")
    notes = np.load(opt.notes, allow_pickle=True).item()
    beats_dict = np.load(opt.beats, allow_pickle=True).item()
    feats = {}
    if opt.music_feat:
        fdf = pd.read_csv(opt.music_feat, sep="\t")
        feats = {r["item_name"]: r for _, r in fdf.iterrows()}

    rows, midi_out, beats_out = [], {}, {}
    skip = 0
    for _, item in df.iterrows():
        name = item["name"]
        if name not in notes or name not in beats_dict:
            skip += 1
            continue
        try:
            mel = np.load(item["vocal_mel_path"], mmap_mode="r")
        except Exception:
            skip += 1
            continue
        n_frames = mel.shape[1]

        fp = notes_to_frame_pitches(notes[name]["pitches"],
                                    notes[name]["note_durs"])
        midi_time = float(np.sum(list(notes[name]["note_durs"])))
        if midi_time > opt.max_wav_len:
            fp = fp[: int(opt.max_wav_len * FPS)]
        if abs(len(fp) - n_frames) > opt.frame_tolerance:
            print(f"| Skip {name}: midi frames {len(fp)} vs mel {n_frames}")
            skip += 1
            continue
        fp = fp[:n_frames]
        if len(fp) < n_frames:
            fp = np.pad(fp, (0, n_frames - len(fp)))
        assert (fp >= 0).all() and (fp < 128).all(), name

        bf = beats_to_frames(beats_dict[name], n_frames)
        assert len(bf) == n_frames == len(fp)

        row = dict(item)
        if name in feats:
            for col in ("key", "key_confidence", "tempo", "tempo_confidence",
                        "avg_pitch", "emotion"):
                if col in feats[name]:
                    row[col] = feats[name][col]
        row["wav_len"] = min(float(item.get("duration", n_frames / FPS)),
                             opt.max_wav_len)
        rows.append(row)
        midi_out[name] = fp
        beats_out[name] = bf

    out_tsv = os.path.join(opt.out_dir, "total.tsv")
    pd.DataFrame(rows).to_csv(out_tsv, sep="\t", index=False)
    np.save(os.path.join(opt.out_dir, "midi.npy"), midi_out, allow_pickle=True)
    np.save(os.path.join(opt.out_dir, "beats.npy"), beats_out, allow_pickle=True)
    print(f"wrote {len(rows)} items to {opt.out_dir} (skip {skip})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
