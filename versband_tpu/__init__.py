"""versband_tpu — TPU-native framework for prompt-controlled vocal-to-accompaniment
song generation.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the public
AccompBand reference (AaronZ345/VersBand): mel DSP front-end, 1-D KL-VAE mel codec,
Band-MOE flow-matching DiT, FLAN-T5/CLAP prompt conditioning, HiFi-GAN / BigVGAN /
ParallelWaveGAN vocoders, and the training/inference harness around them.
"""

__version__ = "0.1.0"
