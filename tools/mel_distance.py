"""Mel-spectral distance between wav pairs — the BASELINE.json parity metric
(<1e-3 mel-spectral distance vs the PyTorch reference).

Usage: python tools/mel_distance.py ref.wav hyp.wav [more pairs...]
       python tools/mel_distance.py --dir_a refs/ --dir_b hyps/
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def mel_distance(a_path: str, b_path: str) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fangyan_tts_tpu.data.audio import load_audio
    from fangyan_tts_tpu.ops.mel import matcha_mel

    a, _ = load_audio(a_path, target_sr=24000)
    b, _ = load_audio(b_path, target_sr=24000)
    n = min(len(a), len(b)) // 480 * 480
    ma = np.asarray(matcha_mel(jnp.asarray(a[:n])[None]))[0]
    mb = np.asarray(matcha_mel(jnp.asarray(b[:n])[None]))[0]
    diff = np.abs(ma - mb)
    return {
        "frames": ma.shape[1],
        "l1": float(diff.mean()),
        "l2": float(np.sqrt(((ma - mb) ** 2).mean())),
        "max": float(diff.max()),
        "len_delta_samples": abs(len(a) - len(b)),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("pairs", nargs="*", help="ref.wav hyp.wav [ref2 hyp2 ...]")
    p.add_argument("--dir_a", default=None)
    p.add_argument("--dir_b", default=None)
    args = p.parse_args()

    pairs = []
    if args.dir_a and args.dir_b:
        for f in sorted(Path(args.dir_a).glob("*.wav")):
            g = Path(args.dir_b) / f.name
            if g.exists():
                pairs.append((str(f), str(g)))
    else:
        pairs = list(zip(args.pairs[::2], args.pairs[1::2]))
    if not pairs:
        raise SystemExit("no pairs")

    worst = 0.0
    for a, b in pairs:
        d = mel_distance(a, b)
        worst = max(worst, d["l1"])
        print(f"{Path(a).name}: l1={d['l1']:.6f} l2={d['l2']:.6f} max={d['max']:.4f} frames={d['frames']}")
    print(f"worst l1: {worst:.6f} ({'PASS' if worst < 1e-3 else 'above 1e-3'})")


if __name__ == "__main__":
    main()
