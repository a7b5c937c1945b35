"""Training CLI — the bin/train.py equivalent.

python -m fangyan_tts_tpu.cli.train \
    --model llm --train_data data.list --cv_data cv.list \
    --model_dir exp/llm --config conf.json [--checkpoint init.msgpack] \
    [--qwen_pretrain_path <hf-dir>] [--tokenizer_path <hf-dir>] \
    [--mesh dp=8] [--max_epoch 200] ...

Maps the reference's argparse surface (cosyvoice/bin/train.py:40-96):
--train_engine torch_ddp|deepspeed collapses into the mesh spec (XLA
collectives replace NCCL; optimizer-state sharding replaces ZeRO-2);
--use_amp becomes bf16 compute (always on for the LLM); --timeout and the
gloo join group are obsolete (even sharding by construction).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def parse_mesh(spec: str) -> dict:
    out = {"dp": 1, "fsdp": 1, "tp": 1}
    for part in spec.split(","):
        if part:
            k, v = part.split("=")
            out[k] = int(v)
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["llm", "flow", "hifigan"], required=True)
    p.add_argument("--train_data", required=True)
    p.add_argument("--cv_data", default=None)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--config", default=None, help="json config overriding CosyVoiceConfig defaults")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--qwen_pretrain_path", default="")
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--mesh", default="dp=1", help="e.g. dp=4,fsdp=2,tp=1")
    p.add_argument("--max_epoch", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--scheduler", default="constantlr")
    p.add_argument("--warmup_steps", type=int, default=2500)
    p.add_argument("--grad_clip", type=float, default=5.0)
    p.add_argument("--accum_grad", type=int, default=2)
    p.add_argument("--bf16_moments", action="store_true",
                   help="store adam's first moment in bf16 (halves mu HBM bytes; "
                        "the recipe step is adam-sweep-bound, docs/train_perf.md)")
    p.add_argument("--max_frames_in_batch", type=int, default=2000)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--save_per_step", type=int, default=-1)
    p.add_argument("--use_spk_embedding", action="store_true")
    p.add_argument("--dpo", action="store_true", help="DPO fine-tuning (llm only)")
    p.add_argument("--seed", type=int, default=1986)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import CosyVoiceConfig, config_from_dict
    from ..data.dataset import build_pipeline, stack_microbatches
    from ..models.flow import CausalMaskedDiffWithDiT
    from ..models.llm import CosyVoice3LM
    from ..ops.mel import matcha_mel
    from ..parallel.mesh import make_mesh
    from ..tokenizer import get_qwen_tokenizer
    from ..train import trainer
    from ..train.checkpoint import load_params, load_meta
    from ..train.executor import Executor
    from ..train.scheduler import build_optimizer
    from ..utils.init import fast_init

    cfg = CosyVoiceConfig()
    if args.config:
        cfg = config_from_dict(json.loads(Path(args.config).read_text()))

    mesh_spec = parse_mesh(args.mesh)
    mesh = make_mesh(**mesh_spec)
    tokenizer = get_qwen_tokenizer(args.tokenizer_path or args.qwen_pretrain_path or None)
    mel_fn = jax.jit(lambda a: matcha_mel(jnp.asarray(a)))

    # grad accumulation lives IN the train step (scan over stacked
    # microbatches, one optimizer apply) rather than optax.MultiSteps —
    # measured ~1.7x faster at the 0.5B recipe batch (trainer.py docstring)
    tx = build_optimizer(
        optim="adam", lr=args.lr, scheduler=args.scheduler,
        scheduler_conf={"warmup_steps": args.warmup_steps} if args.scheduler == "warmuplr" else None,
        grad_clip=args.grad_clip,
        moments_dtype="bfloat16" if args.bf16_moments else None,
    )

    if args.model == "llm":
        model = CosyVoice3LM(cfg.llm, dtype=jnp.bfloat16)
        t = jnp.zeros((1, 8), jnp.int32)
        params = fast_init(model, args.seed, t, t, jnp.asarray([8]), t)
        step_fn = trainer.make_llm_train_step(model, tx, mesh, accum=args.accum_grad)
    elif args.model == "flow":
        model = CausalMaskedDiffWithDiT(cfg.flow)
        t = jnp.zeros((1, 8), jnp.int32)
        params = fast_init(
            model, args.seed, t, jnp.asarray([8]), jnp.zeros((1, 16, 80)), jnp.asarray([16]),
            jnp.zeros((1, 192)), jax.random.PRNGKey(0),
        )
        step_fn = trainer.make_flow_train_step(model, tx, mesh, accum=args.accum_grad)
    else:
        raise SystemExit("hifigan training: use fangyan_tts_tpu.cli.train_gan")

    start_epoch, start_step = 0, 0
    if args.checkpoint:
        params = load_params(args.checkpoint, template=params)
        meta = load_meta(args.checkpoint) or {}
        start_epoch = int(meta.get("epoch", -1)) + 1
        start_step = int(meta.get("step", 0))
        print(f"resumed from {args.checkpoint} (epoch {start_epoch}, step {start_step})")

    with mesh:
        state = trainer.shard_state(trainer.init_state(params, tx), mesh, tx)
        if start_step:
            state = state._replace(step=jnp.asarray(start_step, jnp.int32))
        save_init = Path(args.model_dir) / "init.msgpack"
        if not save_init.exists():
            from ..train.checkpoint import save_params

            save_params(save_init, state.params, meta={"epoch": -1, "step": 0})

        executor = Executor(step_fn, args.model_dir, args.log_interval, args.save_per_step)
        rng = jax.random.PRNGKey(args.seed)

        def make_data(epoch: int, path: str, stack: bool = True):
            it = build_pipeline(
                path, tokenizer, mel_fn, mode=args.model, llm_cfg=cfg.llm,
                epoch=epoch, max_frames_in_batch=args.max_frames_in_batch,
                use_spk_embedding=args.use_spk_embedding,
            )
            if stack and args.accum_grad > 1:
                it = stack_microbatches(it, args.accum_grad)
            return it

        for epoch in range(start_epoch, args.max_epoch):
            cv = make_data(0, args.cv_data, stack=False) if args.cv_data else None

            def cv_fn(p, batch):
                if args.model == "llm":
                    loss, acc = model.apply({"params": p}, batch["src"], batch["ids"], batch["lengths"], batch["targets"])
                    return {"loss": loss, "acc": acc}
                loss, aux = model.apply(
                    {"params": p}, batch["token"], batch["token_len"], batch["feat"], batch["feat_len"],
                    batch["embedding"], jax.random.PRNGKey(0),
                )
                return {"loss": loss}

            state, rng = executor.train_one_epoch(state, make_data(epoch, args.train_data), epoch, rng, cv, cv_fn)
            print(f"epoch {epoch} done, step {int(state.step)}")


if __name__ == "__main__":
    main()
