"""End-to-end golden regression vs the reference pipeline on SHARED weights.

Mirrors ``scripts/test_final.py:349-465``'s generation chain — 25-step CFM
Euler ODE with CFG (``cfm1_audio.py:145-162`` Wrapper_cfg semantics) -> VAE
decode (``ddpm_audio.py:378-392``) -> HiFi-GAN vocode — in BOTH frameworks:
a torch pipeline assembled from reference-named replicas (DiT from
test_dit_torch_parity, Decoder1D/post_quant_conv, weight-normed HiFi-GAN),
and our ``euler_cfg_sample`` + ``AutoencoderKL.decode`` +
``HifiGanGenerator`` on the SAME converted weights, SAME conditioning and
SAME start noise. Asserts the BASELINE criterion (composed mel MSE <= 1e-3)
and waveform closeness, and prints the measured MSE.

The caption embedding is fed as data to both sides (the frozen T5 tower has
its own parity tests; this test pins the generative chain).
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

import jax.numpy as jnp

from test_dit_torch_parity import TDiT, D, ORI, MIDI_V, BEATS_V
from test_vae_torch_parity import TResBlock, TAttn, TUp, norm, CH, MULT, ZC, EMB

from versband_tpu.models.autoencoder import AutoencoderKL
from versband_tpu.models.cfm import euler_cfg_sample
from versband_tpu.models.dit import BandMoeDiT
from versband_tpu.utils.torch_convert import convert_state_dict
from versband_tpu.vocoder.hifigan import HifiGanGenerator

B, T_MEL = 1, 16
T_LAT = T_MEL // 2
ODE_STEPS = 25
SCALE = 2.0

VOC_CH, VOC_RATES, VOC_KS = 32, (4, 4), (8, 8)


class TDecoder(nn.Module):
    """Reference Decoder1D layout (autoencoder1d.py:411-513): up.{i}.block.{j}
    (+attn per block), upsample at level down+1, k3 convs (the reference's
    encoder-k5/decoder-k3 asymmetry)."""

    def __init__(self):
        super().__init__()
        chans = [CH * m for m in MULT]
        block_in = chans[-1]
        self.conv_in = nn.Conv1d(ZC, block_in, 5, padding=2)  # ddconfig k5
        self.mid = nn.Module()
        self.mid.block_1 = TResBlock(block_in, block_in, k=3)
        self.mid.attn_1 = TAttn(block_in)
        self.mid.block_2 = TResBlock(block_in, block_in, k=3)
        self.up = nn.ModuleList()
        up_layers = [1]  # down_layers=[0] -> upsample at level 1
        cin = block_in
        for i_level in reversed(range(len(MULT))):
            lvl = nn.Module()
            ch = chans[i_level]
            lvl.block = nn.ModuleList()
            lvl.attn = nn.ModuleList()
            for j in range(3):  # num_res_blocks + 1
                lvl.block.append(TResBlock(cin if j == 0 else ch, ch, k=3))
                lvl.attn.append(TAttn(ch))
            cin = ch
            if i_level in up_layers:
                lvl.upsample = TUp(ch)
            self.up.insert(0, lvl)
        self.norm_out = norm(chans[0])
        self.conv_out = nn.Conv1d(chans[0], 80, 5, padding=2)  # ddconfig k5

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for i_level in reversed(range(len(MULT))):
            lvl = self.up[i_level]
            for blk, att in zip(lvl.block, lvl.attn):
                h = att(blk(h))
            if hasattr(lvl, "upsample"):
                h = lvl.upsample(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class TResBlockHifi(nn.Module):
    def __init__(self, ch, k=3, dilations=(1, 3, 5)):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, dilation=d,
                                  padding=d * (k - 1) // 2))
            for d in dilations])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
            for _ in dilations])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            h = c1(F.leaky_relu(x, 0.1))
            h = c2(F.leaky_relu(h, 0.1))
            x = x + h
        return x


class THifiGan(nn.Module):
    """Reference HifiGanGenerator layout (vocoder/hifigan/modules/hifigan.py:
    101-152), one resblock kernel per stage."""

    def __init__(self):
        super().__init__()
        self.conv_pre = weight_norm(nn.Conv1d(80, VOC_CH, 7, padding=3))
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        ch = VOC_CH
        for i, (u, k) in enumerate(zip(VOC_RATES, VOC_KS)):
            self.ups.append(weight_norm(
                nn.ConvTranspose1d(ch, ch // 2, k, u, padding=(k - u) // 2)))
            ch //= 2
            self.resblocks.append(TResBlockHifi(ch))
        self.conv_post = weight_norm(nn.Conv1d(ch, 1, 7, padding=3))

    def forward(self, mel):
        x = self.conv_pre(mel)
        for up, rb in zip(self.ups, self.resblocks):
            x = rb(up(F.leaky_relu(x, 0.1)))
        return torch.tanh(self.conv_post(F.leaky_relu(x, 0.01)))[:, 0]


def torch_euler_cfg(model, z0, t_steps, cond, uncond, scale):
    """The reference sampler: torchdyn Euler over linspace(0,1,25) with
    Wrapper_cfg's two sequential model calls and floor-t quantization
    (``cfm1_audio.py:145-162``, ``cfm1_audio_sampler.py:86-116``)."""
    x = z0.clone()
    for k in range(len(t_steps) - 1):
        dt = t_steps[k + 1] - t_steps[k]
        t_int = float(np.floor(t_steps[k] * 1000))
        t_vec = torch.full((x.shape[0],), t_int)
        with torch.no_grad():
            v_c = model(x, t_vec, *cond)
            v_u = model(x, t_vec, *uncond)
        v = v_u + scale * (v_c - v_u)
        x = x + dt * v
    return x


def test_golden_e2e_composed_chain():
    torch.manual_seed(0)
    tdit = TDiT().eval()
    tdec = TDecoder().eval()
    tpq = nn.Conv1d(EMB, ZC, 1)
    tvoc = THifiGan().eval()

    # --- convert all three state dicts through the public converter ------
    dit_params = convert_state_dict(
        {k: v.detach().numpy() for k, v in tdit.state_dict().items()
         if "freqs_cis" not in k}, "dit")
    vae_sd = {f"decoder.{k}": v.detach().numpy()
              for k, v in tdec.state_dict().items()}
    vae_sd.update({f"post_quant_conv.{k}": v.detach().numpy()
                   for k, v in tpq.state_dict().items()})
    vae_params = convert_state_dict(vae_sd, "vae")
    voc_params = convert_state_dict(
        {k: v.detach().numpy() for k, v in tvoc.state_dict().items()},
        "hifigan", num_resblock_kernels=1)

    # --- shared conditioning + noise --------------------------------------
    rng = np.random.RandomState(7)
    z0 = rng.randn(B, EMB, T_LAT).astype(np.float32)
    midi = rng.randint(0, MIDI_V, (B, T_MEL)).astype(np.int64)
    beats = rng.randint(0, BEATS_V, (B, T_MEL)).astype(np.int64)
    caption = rng.randn(B, 5, ORI).astype(np.float32)
    # uncond: empty-caption embedding stand-in + pad ids (the reference pads
    # midi with 128 and beats with 2, vocal2accomp_musical_dataset.py:167-176)
    u_caption = rng.randn(B, 5, ORI).astype(np.float32)
    u_midi = np.full((B, T_MEL), 128, np.int64)
    u_beats = np.full((B, T_MEL), 2, np.int64)

    # --- torch chain -------------------------------------------------------
    ts = np.linspace(0.0, 1.0, ODE_STEPS)
    z_t = torch_euler_cfg(
        tdit, torch.from_numpy(z0), ts,
        (torch.from_numpy(midi), torch.from_numpy(beats),
         torch.from_numpy(caption)),
        (torch.from_numpy(u_midi), torch.from_numpy(u_beats),
         torch.from_numpy(u_caption)), SCALE)
    with torch.no_grad():
        mel_t = tdec(tpq(z_t)).numpy()
        wav_t = tvoc(torch.from_numpy(mel_t)).numpy()

    # --- our chain ----------------------------------------------------------
    model = BandMoeDiT(in_channels=EMB, context_dim=D, hidden_size=D,
                       depth=1, num_heads=2, max_len=64, num_experts=2,
                       ori_dim=ORI, multiple_of=8)
    cond = {"caption": jnp.asarray(caption),
            "acoustic": {"midi": jnp.asarray(midi)[:, None],
                         "beats": jnp.asarray(beats)[:, None]}}
    uncond = {"caption": jnp.asarray(u_caption),
              "acoustic": {"midi": jnp.asarray(u_midi)[:, None],
                           "beats": jnp.asarray(u_beats)[:, None]}}
    z_j = euler_cfg_sample(model.apply, dit_params, jnp.asarray(z0), cond,
                           uncond, guidance_scale=SCALE, num_steps=ODE_STEPS)

    vae = AutoencoderKL(embed_dim=EMB, ddconfig=dict(
        double_z=True, in_channels=80, out_ch=80, z_channels=ZC,
        kernel_size=5, ch=CH, ch_mult=list(MULT), num_res_blocks=2,
        attn_layers=[0, 1], down_layers=[0], dropout=0.0))
    mel_j = np.asarray(vae.apply(vae_params, z_j, method="decode"))

    # converter folds weight norm (the reference's remove_weight_norm form)
    voc = HifiGanGenerator(upsample_initial_channel=VOC_CH,
                           upsample_rates=VOC_RATES,
                           upsample_kernel_sizes=VOC_KS,
                           resblock_kernel_sizes=(3,),
                           resblock_dilation_sizes=((1, 3, 5),),
                           use_weight_norm=False)
    wav_j = np.asarray(voc.apply(voc_params, jnp.asarray(mel_j)))

    # --- golden assertions (BASELINE: composed mel MSE <= 1e-3) -----------
    lat_mse = float(np.mean((np.asarray(z_j) - z_t.numpy()) ** 2))
    mel_mse = float(np.mean((mel_j - mel_t) ** 2))
    wav_mae = float(np.abs(wav_j - wav_t).max())
    print(f"golden e2e: latent MSE {lat_mse:.3e}  mel MSE {mel_mse:.3e}  "
          f"wav max|d| {wav_mae:.3e}")
    assert lat_mse < 1e-6, lat_mse
    assert mel_mse < 1e-3, mel_mse       # BASELINE.md target
    assert wav_mae < 5e-3, wav_mae

    # encode_once must be bit-compatible with the plain path on this chain
    z_j2 = euler_cfg_sample(model.apply, dit_params, jnp.asarray(z0), cond,
                            uncond, guidance_scale=SCALE,
                            num_steps=ODE_STEPS, encode_once=True)
    np.testing.assert_allclose(np.asarray(z_j2), np.asarray(z_j),
                               atol=1e-5, rtol=1e-5)
