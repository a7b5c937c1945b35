"""Training stack: optax optimizers/schedules, pjit train steps, orbax
checkpointing, the epoch executor, and GAN training for the vocoder."""
