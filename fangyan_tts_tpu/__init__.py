"""fangyan-tts-tpu: a TPU-native JAX framework for dialect/emotion TTS.

Re-implements the capabilities of the fangyan-TTS stack (dataset generation,
CosyVoice3-style fine-tuning and inference) as an idiomatic JAX/XLA/Pallas
framework designed for TPU hardware:

- batched XLA-compiled audio frontends (kaldi fbank, whisper log-mel, 24k mel)
- CosyVoice3-0.5B model family: Qwen2-backbone AR speech-token LM,
  conditional flow-matching DiT, causal HiFT (NSF + iSTFT) vocoder
- SPMD training over `jax.sharding.Mesh` (data/FSDP/tensor axes)
- streaming inference with fixed chunk shapes (no recompilation)

Reference behavior: Autonomof/fangyan-TTS (see SURVEY.md). This is a
from-scratch TPU design, not a port.
"""

__version__ = "0.1.0"
