from versband_tpu.models.autoencoder import AutoencoderKL, Encoder1D, Decoder1D
from versband_tpu.models.autoencoder2d import (
    AutoencoderKL2D, VQModel, VQModelInterface, IdentityFirstStage)
from versband_tpu.models.cfm import CFM, CFMSampler, LatentDiffusion
from versband_tpu.models.dit import BandMoeDiT
from versband_tpu.models.dit_timefreq import TimeFreqMoeDiT
from versband_tpu.models.concat_dit import (
    ConcatDiT, ConcatDiT2MLP, HybridDiT2MLP, HybridDiT2MLP2, ConcatOrderDiT,
    ConcatOrderDiT2)
from versband_tpu.models.samplers import DDIMSampler, PLMSSampler, ddpm_sample_loop
from versband_tpu.models.schedules import DiffusionSchedule
from versband_tpu.models.distributions import DiagonalGaussian
