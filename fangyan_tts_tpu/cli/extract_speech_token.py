"""Stage 2: speech-token extraction (tools/extract_speech_token.py
equivalent).

python -m fangyan_tts_tpu.cli.extract_speech_token --dir <kaldi-dir> \
    [--checkpoint s3tokenizer_v3.msgpack] [--batch-size 32]
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
    parser.add_argument("--batch-size", type=int, default=32)
    args = parser.parse_args(argv)

    from ..data.extract import extract_speech_tokens
    from ..models.s3tokenizer import S3TokenizerV3
    from ..train.checkpoint import load_params

    model = S3TokenizerV3()
    ckpt = args.checkpoint or (args.onnx_path if args.onnx_path and args.onnx_path.endswith(".msgpack") else None)
    if ckpt:
        params = load_params(ckpt)
    elif args.onnx_path and args.onnx_path.endswith(".onnx"):
        from ..models.convert import s3_params_from_onnx

        params, hyper = s3_params_from_onnx(args.onnx_path)
        model = S3TokenizerV3(dim=hyper["dim"], layers=hyper["layers"],
                              n_mels=hyper["n_mels"], fsmn_kernel=hyper["fsmn_kernel"])
    else:
        print("⚠️ no converted S3 checkpoint given — using random init (tokens are placeholders)")
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 200)), jnp.asarray([200]))["params"]

    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16) if hasattr(x, "ndim") and x.ndim >= 2 else jnp.asarray(x), params)

    @jax.jit
    def _apply(p, mel, mel_len):
        return model.apply({"params": p}, mel.astype(jnp.bfloat16), mel_len)

    def apply_fn(mel, mel_len):
        return _apply(params, mel, mel_len)

    t0 = time.time()
    utt2tok = extract_speech_tokens(args.dir, apply_fn, batch_size=args.batch_size)
    dt = time.time() - t0
    print(f"✅ extracted {len(utt2tok)} token sequences in {dt:.1f}s ({len(utt2tok) / max(dt, 1e-9):.1f} utt/s)")


if __name__ == "__main__":
    main()
