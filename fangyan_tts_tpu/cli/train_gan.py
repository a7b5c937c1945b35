"""HiFiGAN vocoder training CLI (the bin/train.py --model hifigan path:
alternating generator/discriminator turns, executor.py:88-144)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--train_data", required=True)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr_d", type=float, default=2e-4)
    p.add_argument("--max_epoch", type=int, default=200)
    p.add_argument("--max_frames_in_batch", type=int, default=2000)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--seed", type=int, default=1986)
    p.add_argument("--mesh", default="dp=1", help="e.g. dp=8 (pure data parallel; the vocoder is small)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import CosyVoiceConfig, config_from_dict
    from ..data.dataset import build_pipeline
    from ..models.discriminators import MultipleDiscriminator
    from ..models.hift import CausalHiFT
    from ..ops.mel import matcha_mel
    from ..tokenizer import get_qwen_tokenizer
    from ..train.checkpoint import save_params
    from ..train.gan import init_gan_state, make_hifigan_steps
    from ..utils.init import fast_init
    import optax

    cfg = CosyVoiceConfig()
    if args.config:
        cfg = config_from_dict(json.loads(Path(args.config).read_text()))

    hift = CausalHiFT(cfg.hift)
    disc = MultipleDiscriminator()
    gen_params = fast_init(hift, args.seed, jnp.zeros((1, 16, 80)))
    disc_params = disc.init(jax.random.PRNGKey(args.seed + 1), jnp.zeros((1, 4800)), jnp.zeros((1, 4800)))["params"]
    from ..parallel.mesh import make_mesh
    from ..train.gan import shard_gan_state
    from .train import parse_mesh

    mesh = make_mesh(**parse_mesh(args.mesh))
    gen_tx, disc_tx = optax.adam(args.lr), optax.adam(args.lr_d)
    state = init_gan_state(gen_params, disc_params, gen_tx, disc_tx)
    if mesh is not None:
        state = shard_gan_state(state, mesh)
    gen_step, disc_step = make_hifigan_steps(hift, disc, gen_tx, disc_tx, mesh=mesh)

    tokenizer = get_qwen_tokenizer(args.tokenizer_path)
    mel_fn = jax.jit(lambda a: matcha_mel(jnp.asarray(a)))
    model_dir = Path(args.model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)

    for epoch in range(args.max_epoch):
        data = build_pipeline(args.train_data, tokenizer, mel_fn, mode="hifigan",
                              epoch=epoch, max_frames_in_batch=args.max_frames_in_batch)
        for i, batch in enumerate(data):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            # alternating turns (executor.py:88-144): disc then gen per batch
            state, dm = disc_step(state, batch)
            state, gm = gen_step(state, batch)
            if i % args.log_interval == 0:
                print(f"epoch {epoch} it {i} gen={float(gm['loss']):.4f} mel={float(gm['loss_mel']):.4f} disc={float(dm['loss']):.4f}", flush=True)
        save_params(model_dir / f"epoch_{epoch}_whole.msgpack", state.gen_params, meta={"epoch": epoch})
        save_params(model_dir / f"epoch_{epoch}_disc.msgpack", state.disc_params, meta={"epoch": epoch})
        print(f"epoch {epoch} done")


if __name__ == "__main__":
    main()
