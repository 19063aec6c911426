"""meg_decoding_tpu — TPU-native (JAX/XLA/Pallas) M/EEG decoding framework.

A ground-up rebuild of the capabilities of arayabrain/MEG-decoding
(a PyTorch research codebase for decoding perceptual content from M/EEG via
CLIP-style contrastive alignment), designed TPU-first:

* models: Flax encoders (BrainEncoder family, EEGNet, LinearEncoder) with the
  per-subject mixing expressed as gathered batched matmuls;
* ops: MNE-equivalent DSP (FIR bandpass, FFT resample, robust scaling,
  epoching) as vectorized XLA ops, plus Pallas kernels for the hot paths;
* objectives: fused CLIP loss (learnable temperature), gallery classification
  losses, matmul-based retrieval metrics;
* data: device-resident packed datasets with pure-function PRNG samplers;
* train: jitted train/eval steps over a ``jax.sharding.Mesh`` (batch-sharded
  data parallelism, replicated params, psum gradient reduction over ICI);
* parallel: explicit shard_map collectives (sharded CLIP all-gather).
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml [project] version
