from versband_tpu.vocoder.hifigan import HifiGanGenerator, HifiGAN
from versband_tpu.vocoder.bigvgan import BigVGANGenerator, VocoderBigVGAN
from versband_tpu.vocoder.pwg import (
    ParallelWaveGANGenerator, ParallelWaveGANDiscriminator,
    MelGANGenerator, MelGANDiscriminator, MelGANMultiScaleDiscriminator, PQMF,
)
from versband_tpu.vocoder.discriminators import (
    MultiPeriodDiscriminator, MultiScaleDiscriminator,
    MultiResolutionDiscriminator, NLayerDiscriminator,
    MultiWindowDiscriminator, feature_loss, discriminator_loss,
    generator_loss, cond_discriminator_loss,
)
from versband_tpu.vocoder.losses import (
    multi_resolution_stft_loss, stft_loss,
)
from versband_tpu.vocoder.nsf import (
    NSFHifiGanGenerator, HifiGAN_NSF, SourceModuleHnNSF,
)
