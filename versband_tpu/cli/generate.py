"""Inference CLI — the ``scripts/test_final.py`` equivalent.

    python -m versband_tpu.cli.generate --config configs/vocal2music.yaml \
        --ckpt logs/<run>/checkpoints/last --manifest <dir> \
        --other_condition <midi.npy> --scales 1-2-3 --save_dir out/

Per manifest item (duration <= 20 s, ``--num_items`` random picks) and per CFG
scale: frozen-T5 encode cond/uncond, 25-step CFM Euler ODE with batch-doubled
CFG, VAE decode, HiFi-GAN vocode, -23 LUFS normalization, and
accomp/song/gt wav outputs plus a ``clap.csv`` manifest for CLAP evaluation
(``test_final.py:349-465``).

Multi-host fan-out: items are rank-strided (``--rank/--world``) — the
TPU-native replacement for the reference's per-GPU ``mp.spawn`` + NCCL
(``test_final.py:467-477``).
"""

from __future__ import annotations

import argparse
import math
import os
from typing import Dict, List, Optional

import numpy as np


def get_parser():
    p = argparse.ArgumentParser("versband_tpu generate")
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default=None, help="CFM (DiT) checkpoint")
    p.add_argument("--vae_ckpt", default=None,
                   help="override first-stage checkpoint")
    p.add_argument("--vocoder_ckpt", default=None)
    p.add_argument("--scale_factor", type=float, default=None,
                   help="scale_by_std latent scale override (defaults to the "
                        "value saved beside the checkpoint)")
    p.add_argument("--vocoder", default="hifigan",
                   choices=("hifigan", "nsf", "bigvgan", "pwg"),
                   help="vocoder family (reference serves hifigan, "
                        "test_final.py:420; the others are extras)")
    p.add_argument("--manifest", default=None,
                   help="manifest dir (defaults to config data path)")
    p.add_argument("--other_condition", default=None, help="midi.npy path")
    p.add_argument("--save_dir", default="gen_out")
    p.add_argument("--scales", default="1-2-3")
    p.add_argument("--ddim_steps", type=int, default=25)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--num_items", type=int, default=200)
    p.add_argument("--max_sec", type=float, default=20.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world", type=int, default=1)
    p.add_argument("--nproc", type=int, default=1,
                   help="self-spawn N rank-strided workers and merge their "
                        "clap CSVs (the mp.spawn equivalent, "
                        "test_final.py:467-477). On a single-chip host pass "
                        "--platform cpu so children don't contend for the "
                        "TPU; across hosts prefer one command per host with "
                        "explicit --rank/--world.")
    p.add_argument("--platform", default=None)
    p.add_argument("--pad_to", type=int, default=0,
                   help="pad conditions to a fixed mel length (frames): one "
                        "compiled program reused across items + pipelined "
                        "dispatch; wavs are trimmed to true length")
    return p


class InferDataset:
    """Manifest + midi/beats dicts, filtered to <= max_sec, random subset
    (``test_final.py:196-340``)."""

    def __init__(self, manifest_dir: str, other_condition: Optional[str],
                 num_items: int = 200, max_sec: float = 20.0, seed: int = 0,
                 mel_downsample_rate: int = 2,
                 caption_templates: str = "reference"):
        # generation from a converted reference checkpoint should see the
        # prompt distribution it was trained on -> reference templates
        from versband_tpu.data.manifests import load_manifest_dirs
        from versband_tpu.text.caption_generator import CaptionGenerator2

        self.rng = np.random.default_rng(seed)
        self.caption_generator = CaptionGenerator2(rng=self.rng,
                                                    templates=caption_templates)
        df = load_manifest_dirs(manifest_dir)
        if "duration" in df:
            df = df[df["duration"] <= max_sec]
        df = df.reset_index(drop=True)
        if len(df) > num_items:
            pick = self.rng.choice(len(df), num_items, replace=False)
            df = df.iloc[sorted(pick)].reset_index(drop=True)
        self.df = df
        self.mel_downsample_rate = mel_downsample_rate
        self.unit_upsample_rate = 1
        self.midi_dict, self.beats_dict = {}, {}
        if other_condition:
            self.midi_dict = np.load(other_condition, allow_pickle=True).item()
            self.beats_dict = np.load(
                other_condition.replace("midi", "beats"), allow_pickle=True).item()

    def __len__(self):
        return len(self.df)

    def __getitem__(self, i: int) -> Dict:
        from versband_tpu.data.collate import pad_or_cut_xd
        from versband_tpu.data.vocal2accomp import BEATS_PAD, MIDI_PAD

        data = self.df.iloc[i]
        acoustic = np.load(data["vocal_mel_path"])[:20, :].astype(np.float32)
        name = data["name"]
        T = acoustic.shape[1]
        midi = np.asarray(self.midi_dict.get(name, np.full(T, MIDI_PAD)),
                          np.float32)[None]
        beats = np.asarray(self.beats_dict.get(name, np.full(T, BEATS_PAD)),
                           np.float32)[None]
        T8 = int(math.ceil(T / 8) * 8)
        acoustic = pad_or_cut_xd(acoustic, T8, 1, -5.0)
        midi = pad_or_cut_xd(midi, T8, 1, MIDI_PAD)
        beats = pad_or_cut_xd(beats, T8, 1, BEATS_PAD)

        caption = ""
        if "caption" in data:
            choices = str(data["caption"]).split("<psep>")
            caption = f"Style: {choices[int(self.rng.integers(len(choices)))]} "
        prompt = self.caption_generator.transcribe(
            key=data.get("key"), key_conf=float(data.get("key_confidence", 0)),
            avg_pitch=float(data.get("avg_pitch", 0)),
            tempo=float(data.get("tempo", 0)),
            tempo_conf=float(data.get("tempo_confidence", 0)),
            emotion=None, duration=float(data.get("wav_len", 0)))
        caption = caption + f"Musical: {prompt}"
        return dict(name=name, caption=caption, acoustic=acoustic, midi=midi,
                    beats=beats, audio_path=data.get("audio_path", ""))


def safe_path(path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def write_wav(path: str, wav: np.ndarray, sr: int = 24000):
    from scipy.io import wavfile

    wav = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    wavfile.write(safe_path(path), sr, (wav * 32767).astype(np.int16))


def build_vocoder(name: str, ckpt: str = None):
    """All four runtime wrappers share the ``wav = wrapper(mel_2d)`` calling
    convention; the reference CLI hardcodes HiFi-GAN (``test_final.py:420``)."""
    if name == "hifigan":
        from versband_tpu.vocoder.hifigan import HifiGAN
        return HifiGAN(ckpt)
    if name == "nsf":
        from versband_tpu.vocoder.nsf import HifiGAN_NSF
        return HifiGAN_NSF(ckpt)
    if name == "bigvgan":
        from versband_tpu.vocoder.bigvgan import VocoderBigVGAN
        return VocoderBigVGAN(ckpt)
    if name == "pwg":
        from versband_tpu.vocoder.pwg import ParallelWaveGAN
        return ParallelWaveGAN(ckpt)
    raise ValueError(f"unknown vocoder family: {name}")


def main(argv: List[str] = None) -> int:
    import sys as _sys

    opt = get_parser().parse_args(argv)
    if opt.nproc > 1:
        import glob as _glob

        from versband_tpu.utils.fanout import spawn_ranks

        # stale rank CSVs from a prior (possibly larger-nproc or failed) run
        # would otherwise be concatenated into clap.csv below
        for stale in _glob.glob(os.path.join(opt.save_dir, "clap_rank*.csv")):
            os.remove(stale)
        rc = spawn_ranks("versband_tpu.cli.generate",
                         argv if argv is not None else _sys.argv[1:],
                         opt.nproc)
        if rc == 0:  # merge the per-rank CSVs into the eval manifest
            import pandas as pd

            parts = [p for p in
                     (os.path.join(opt.save_dir, f"clap_rank{r}.csv")
                      for r in range(opt.nproc)) if os.path.exists(p)]
            if parts:
                merged = pd.concat([pd.read_csv(p, sep="\t") for p in parts],
                                   ignore_index=True)
                merged.to_csv(os.path.join(opt.save_dir, "clap.csv"),
                              sep="\t", index=False)
                print(f"merged {len(parts)} rank CSVs -> clap.csv "
                      f"({len(merged)} rows)")
        return rc
    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    import jax.numpy as jnp
    import pandas as pd

    from versband_tpu.dsp.loudness import normalize_loudness
    from versband_tpu.models.cfm import CFMSampler
    from versband_tpu.utils.config import instantiate_from_config, load_config
    config = load_config(opt.config)
    model_cfg = config["model"]
    cfm = instantiate_from_config(model_cfg)
    sampler = CFMSampler(cfm, num_timesteps=opt.ddim_steps)

    data_params = config["data"]["params"]
    manifest = opt.manifest or data_params.get("main_spec_dir_path")
    other_cond = opt.other_condition or data_params.get("other_condition")
    dataset = InferDataset(manifest, other_cond, opt.num_items, opt.max_sec,
                           opt.seed)
    scales = [float(s) for s in str(opt.scales).split("-") if s]

    # --- parameters ------------------------------------------------------
    item0 = dataset[0]
    B = opt.n_samples
    T_mel = item0["acoustic"].shape[1]
    T_lat = math.ceil(T_mel / 2)
    key = jax.random.PRNGKey(opt.seed)

    ctx_example = {
        "caption": jnp.zeros((B, 80, model_cfg["params"]["unet_config"]
                              ["params"].get("ori_dim", 1024)), jnp.float32),
        "acoustic": {"midi": jnp.zeros((B, 1, T_mel), jnp.int32),
                     "beats": jnp.zeros((B, 1, T_mel), jnp.int32)},
    }
    from versband_tpu.models.cfm import _cond_to_context

    dit_params = jax.jit(cfm.model.init)(
        key, jnp.zeros((B, cfm.mel_dim, T_lat)), jnp.zeros((B,)),
        _cond_to_context(ctx_example))
    if opt.ckpt:
        from versband_tpu.train.checkpoints import load_model_checkpoint

        dit_params = load_model_checkpoint(dit_params, opt.ckpt)
        print(f"Restored DiT from {opt.ckpt}")
    # scale_by_std models train with scale_factor = 1/std(z) of the first
    # batch; the trainer persists it beside the checkpoint — without it the
    # VAE decodes sampled latents at the wrong amplitude
    if opt.scale_factor is not None:
        cfm.scale_factor = float(opt.scale_factor)
    elif opt.ckpt and getattr(cfm, "scale_by_std", False) \
            and cfm.scale_factor == 1.0:
        meta_path = os.path.join(os.path.dirname(os.path.abspath(opt.ckpt)),
                                 "last_step.json")
        if os.path.exists(meta_path):
            import json

            sf = json.load(open(meta_path)).get("scale_factor")
            if sf:
                cfm.scale_factor = float(sf)
                print(f"Restored scale_factor={cfm.scale_factor:.5f}")
        else:
            print("WARNING: scale_by_std=true but no saved scale_factor "
                  "found; decoding with scale_factor=1.0")

    fs_cfg = model_cfg["params"]["first_stage_config"]
    mel0 = jnp.zeros((B, 80, 16))
    vae_params = jax.jit(cfm.first_stage.init)(
        {"params": key, "gaussian": key}, mel0)
    vae_ckpt = opt.vae_ckpt or (fs_cfg.get("params") or {}).get("ckpt_path")
    if vae_ckpt and os.path.exists(str(vae_ckpt)):
        from versband_tpu.train.checkpoints import load_model_checkpoint

        vae_params = load_model_checkpoint(vae_params, str(vae_ckpt))
        print(f"Restored VAE from {vae_ckpt}")

    vocoder = build_vocoder(opt.vocoder, opt.vocoder_ckpt)
    cond_stage = cfm.cond_stage

    @jax.jit
    def decode(vp, z):
        return cfm.first_stage.apply(vp, z / cfm.scale_factor, method="decode")

    csv_data = {"audio_path": [], "caption": [], "name": []}
    items = list(range(len(dataset)))[opt.rank::opt.world]
    for item_idx, i in enumerate(items):
        item = dataset[i]
        true_frames = item["acoustic"].shape[1]
        if opt.pad_to:
            from versband_tpu.data.collate import pad_or_cut_xd
            from versband_tpu.data.vocal2accomp import BEATS_PAD, MIDI_PAD

            item = dict(item)
            item["acoustic"] = pad_or_cut_xd(item["acoustic"], opt.pad_to, 1,
                                             -5.0)
            item["midi"] = pad_or_cut_xd(item["midi"], opt.pad_to, 1, MIDI_PAD)
            item["beats"] = pad_or_cut_xd(item["beats"], opt.pad_to, 1,
                                          BEATS_PAD)
        acoustic = jnp.asarray(np.stack([item["acoustic"]] * B))
        midi = jnp.asarray(np.stack([item["midi"]] * B), jnp.int32)
        beats = jnp.asarray(np.stack([item["beats"]] * B), jnp.int32)

        def learned(caption_text):
            cond = {"caption": [caption_text] * B,
                    "acoustic": {"acoustic": acoustic, "midi": midi,
                                 "beats": beats},
                    "name": [item["name"]] * B}
            return (cfm.get_learned_conditioning(None, cond)
                    if cond_stage is None else cond_stage(cond))

        c = learned(item["caption"])
        # the uncond tower pass is only needed when some scale actually
        # applies CFG (uncond keeps acoustic, faithful to test_final.py:401-407)
        uc = learned("") if any(s != 1.0 for s in scales) else None
        for scale in scales:
            key, k = jax.random.split(key)
            z = sampler.sample_cfg(dit_params, c, scale,
                                   None if scale == 1.0 else uc, k,
                                   batch_size=B)
            mels = np.asarray(decode(vae_params, z))
            out_dir = os.path.join(opt.save_dir,
                                   f"cond_gtcodec_accomp_scale_{scale}")
            for widx, mel in enumerate(mels):
                wav = vocoder(mel)
                if opt.pad_to:
                    wav = wav[: true_frames * 320]  # trim padding tail
                wav = normalize_loudness(wav, -23.0)
                path = os.path.join(
                    out_dir, f"{opt.rank}-{item_idx:04d}[{widx}][accomp].wav")
                write_wav(path, wav)
                csv_data["audio_path"].append(path)
                csv_data["caption"].append(item["caption"])
                csv_data["name"].append(item["name"])
                # gt vocal + mixed song when source audio exists (empty
                # manifest cells arrive as NaN floats from pandas — only a
                # non-empty string is a candidate path)
                if isinstance(item.get("audio_path"), str) \
                        and item["audio_path"] \
                        and os.path.exists(item["audio_path"]):
                    from scipy.io import wavfile

                    sr, gt_accomp = wavfile.read(item["audio_path"])
                    gt_accomp = gt_accomp.astype(np.float32) / 32768.0
                    vocal_path = item["audio_path"].replace("accomp", "vocal")
                    if os.path.exists(vocal_path):
                        _, gt_vocal = wavfile.read(vocal_path)
                        gt_vocal = normalize_loudness(
                            gt_vocal.astype(np.float32) / 32768.0, -23.0)
                        n = min(len(wav), len(gt_vocal))
                        write_wav(os.path.join(
                            out_dir,
                            f"{opt.rank}-{item_idx:04d}[{widx}][gt_vocal].wav"),
                            gt_vocal[:n])
                        write_wav(os.path.join(
                            out_dir,
                            f"{opt.rank}-{item_idx:04d}[{widx}][song].wav"),
                            wav[:n] + gt_vocal[:n])
                    write_wav(os.path.join(
                        out_dir,
                        f"{opt.rank}-{item_idx:04d}[{widx}][gt_accomp].wav"),
                        normalize_loudness(gt_accomp, -23.0))
        print(f"[{opt.rank}] {item_idx + 1}/{len(items)} {item['name']}")

    csv_name = "clap.csv" if opt.world == 1 else f"clap_rank{opt.rank}.csv"
    csv_path = os.path.join(opt.save_dir, csv_name)
    os.makedirs(opt.save_dir, exist_ok=True)
    pd.DataFrame.from_dict(csv_data).to_csv(csv_path, sep="\t", index=False)
    print(f"wrote {csv_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
