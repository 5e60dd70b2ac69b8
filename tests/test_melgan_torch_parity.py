"""MelGAN full-generator torch parity via ``convert_melgan_state_dict``.

Torch replica with the reference's flat-Sequential layout
(``models/melgan.py:18-192`` + ``layers/residual_stack.py``) converted with
the computed index map must reproduce the flax ``MelGANGenerator``.
"""

import numpy as np
import torch
import torch.nn as nn
from torch.nn.utils import weight_norm

import jax.numpy as jnp

from versband_tpu.utils.torch_convert import convert_melgan_state_dict
from versband_tpu.vocoder.pwg import MelGANGenerator

IN, CH, K = 20, 64, 7
SCALES = (4, 2)
STACK_K, STACKS = 3, 2
B, T_MEL = 2, 12


class TResidualStack(nn.Module):
    def __init__(self, ch, dilation):
        super().__init__()
        self.stack = nn.Sequential(
            nn.LeakyReLU(0.2),
            nn.ReflectionPad1d((STACK_K - 1) // 2 * dilation),
            weight_norm(nn.Conv1d(ch, ch, STACK_K, dilation=dilation)),
            nn.LeakyReLU(0.2),
            weight_norm(nn.Conv1d(ch, ch, 1)),
        )
        self.skip_layer = weight_norm(nn.Conv1d(ch, ch, 1))

    def forward(self, c):
        return self.stack(c) + self.skip_layer(c)


def build_torch_melgan():
    layers = [nn.ReflectionPad1d((K - 1) // 2),
              weight_norm(nn.Conv1d(IN, CH, K))]
    for i, scale in enumerate(SCALES):
        layers += [nn.LeakyReLU(0.2)]
        layers += [weight_norm(nn.ConvTranspose1d(
            CH // (2 ** i), CH // (2 ** (i + 1)), scale * 2, stride=scale,
            padding=scale // 2 + scale % 2, output_padding=scale % 2))]
        for j in range(STACKS):
            layers += [TResidualStack(CH // (2 ** (i + 1)), STACK_K ** j)]
    layers += [nn.LeakyReLU(0.2), nn.ReflectionPad1d((K - 1) // 2),
               weight_norm(nn.Conv1d(CH // (2 ** len(SCALES)), 1, K)),
               nn.Tanh()]
    return nn.Sequential(*layers)


def test_melgan_full_generator_torch_parity():
    torch.manual_seed(0)
    tm = build_torch_melgan().eval()
    sd = {f"melgan.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    params = convert_melgan_state_dict(sd, num_scales=len(SCALES),
                                       stacks=STACKS)

    fm = MelGANGenerator(in_channels=IN, channels=CH, kernel_size=K,
                         upsample_scales=SCALES, stack_kernel_size=STACK_K,
                         stacks=STACKS, use_weight_norm=False)

    rng = np.random.RandomState(2)
    mel = rng.randn(B, IN, T_MEL).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(mel)).numpy()

    out = fm.apply(params, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)
