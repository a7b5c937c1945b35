"""Stage 1: speaker-embedding extraction (tools/extract_embedding.py
equivalent).

python -m fangyan_tts_tpu.cli.extract_embedding --dir <kaldi-dir> \
    [--checkpoint campplus.msgpack] [--batch-size 64]

--onnx_path accepts the reference's campplus.onnx directly (weights are
converted on the fly via models/convert.py:campplus_params_from_onnx) or a
pre-converted .msgpack; extraction runs the CAM++ JAX reimplementation,
batched and jitted, instead of ONNX-Runtime.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", type=str, required=True)
    parser.add_argument("--onnx_path", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--num_thread", type=int, default=8)  # compat, unused
    parser.add_argument("--batch-size", type=int, default=64)
    args = parser.parse_args(argv)

    from ..data.extract import extract_embeddings
    from ..models.campplus import CAMPPlus
    from ..train.checkpoint import load_params

    model = CAMPPlus()
    ckpt = args.checkpoint or (args.onnx_path if args.onnx_path and args.onnx_path.endswith(".msgpack") else None)
    if ckpt:
        params = load_params(ckpt)
    elif args.onnx_path and args.onnx_path.endswith(".onnx"):
        from ..models.convert import campplus_params_from_onnx

        params = campplus_params_from_onnx(args.onnx_path)
    else:
        print("⚠️ no converted CAM++ checkpoint given — using random init (embeddings are placeholders)")
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 98, 80)))["params"]

    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16) if hasattr(x, "ndim") and x.ndim >= 2 else jnp.asarray(x), params)

    @jax.jit
    def _apply(p, fbank):
        return model.apply({"params": p}, fbank.astype(jnp.bfloat16)).astype(jnp.float32)

    def apply_fn(fbank, frame_len):
        return _apply(params, fbank)

    t0 = time.time()
    utt2emb = extract_embeddings(args.dir, apply_fn, batch_size=args.batch_size)
    dt = time.time() - t0
    print(f"✅ extracted {len(utt2emb)} embeddings in {dt:.1f}s ({len(utt2emb) / max(dt, 1e-9):.1f} utt/s)")


if __name__ == "__main__":
    main()
