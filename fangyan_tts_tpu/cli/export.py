"""Model export — the export_jit.py / export_onnx.py equivalent.

The reference exports TorchScript + ONNX (cosyvoice/bin/export_jit.py,
export_onnx.py with an ORT parity check). The TPU-native artifact is
serialized StableHLO via jax.export: portable, ahead-of-time compiled
programs for the three inference stages, plus msgpack params.

python -m fangyan_tts_tpu.cli.export --model_dir <dir> --output_dir exported/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--n_tokens", type=int, default=256, help="flow bucket (tokens)")
    p.add_argument("--check", action="store_true", help="roundtrip parity check on random inputs")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..api import CosyVoice3
    from ..models.flow import CausalMaskedDiffWithDiT, cfm_solve

    model = CosyVoice3(args.model_dir, load_frontend_models=False)
    tts = model.model
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    fcfg = tts.cfg.flow
    nt = args.n_tokens
    flow = tts.flow

    def flow_prep(p, token, token_len, prompt_feat, prompt_feat_len, embedding):
        return flow.apply({"params": p}, token, token_len, prompt_feat, prompt_feat_len, embedding,
                          finalize=True, method=CausalMaskedDiffWithDiT.prepare_inference)

    def flow_solve(p, z, mu, spks, conds, mel_len):
        return cfm_solve(fcfg, p, z, mu, spks, conds, mel_len, False)

    def vocoder(p, mel):
        return tts.hift.apply({"params": p}, mel, finalize=True)[0]

    dt = tts.dtype
    prep_args = (
        tts.flow_params,
        jnp.zeros((1, nt), jnp.int32), jnp.asarray([nt], jnp.int32),
        jnp.zeros((1, 2 * nt, 80), dt), jnp.asarray([0], jnp.int32), jnp.zeros((1, 192), dt),
    )
    solve_args = (
        tts.flow_params["estimator"],
        jnp.zeros((1, 2 * nt, 80), dt), jnp.zeros((1, 2 * nt, 80), dt),
        jnp.zeros((1, 80), dt), jnp.zeros((1, 2 * nt, 80), dt), jnp.asarray([2 * nt], jnp.int32),
    )
    voc_args = (tts.hift_params, jnp.zeros((1, 2 * nt, 80), dt))

    for name, fn, eargs in (
        ("flow_prepare", flow_prep, prep_args),
        ("flow_solve", flow_solve, solve_args),
        ("vocoder", vocoder, voc_args),
    ):
        exp = jexport.export(jax.jit(fn))(*eargs)
        path = out / f"{name}.stablehlo"
        path.write_bytes(exp.serialize())
        print(f"exported {name} -> {path} ({path.stat().st_size / 1e6:.1f} MB)")
        if args.check:
            rt = jexport.deserialize(path.read_bytes())
            a = rt.call(*eargs)
            b = fn(*eargs)
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                np.testing.assert_allclose(np.asarray(x, np.float32), np.asarray(y, np.float32), atol=1e-3)
            print(f"  parity check OK")

    from ..train.checkpoint import save_params

    save_params(out / "llm.msgpack", tts.llm_params)
    save_params(out / "flow.msgpack", tts.flow_params)
    save_params(out / "hift.msgpack", tts.hift_params)
    print(f"✅ export complete: {out}")


if __name__ == "__main__":
    main()
