"""Text-to-speech synthesis (Piper-style) writing a .wav file.

TPU-native counterpart of rten-examples/src/piper.rs: text → phoneme-ish id
sequence → acoustic model (tiny native decoder predicting per-frame f0 +
amplitude) → harmonic synthesizer → 16-bit PCM WAV via the stdlib wave
module (the reference writes WAV via hound).

    python examples/piper.py --demo --out speech.wav
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--text", default="hello world")
    p.add_argument("--out", help="output .wav path")
    p.add_argument("--sr", type=int, default=16000)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.models import bert

    # "Phonemization": characters as phoneme ids.
    charset = " abcdefghijklmnopqrstuvwxyz"
    ids = np.asarray(
        [charset.index(c) for c in args.text.lower() if c in charset], np.int32
    )
    print(f"text {args.text!r} -> {len(ids)} phonemes")

    # Acoustic model: encoder over phonemes → per-phoneme (duration, f0, amp).
    cfg = bert.BertConfig(
        vocab_size=len(charset), n_layers=2, n_heads=2, d_model=32, d_ff=64,
        max_seq=128, n_segments=0,
    )
    params = bert.init_params(jax.random.PRNGKey(args.seed), cfg)
    hidden = bert.encode(params, cfg, jnp.asarray(ids[None]))
    w_out = jax.random.normal(jax.random.PRNGKey(args.seed + 1), (32, 3)) * 0.3
    acoustics = np.asarray(hidden[0] @ w_out, np.float32)  # [N, 3]

    dur = 0.06 + 0.04 * (1 / (1 + np.exp(-acoustics[:, 0])))  # 60–100 ms
    f0 = 120.0 * np.exp(0.3 * np.tanh(acoustics[:, 1]))  # around 120 Hz
    amp = 0.2 + 0.6 * (1 / (1 + np.exp(-acoustics[:, 2])))

    # Harmonic synthesis per phoneme.
    sr = args.sr
    chunks = []
    for di, fi, ai in zip(dur, f0, amp):
        n = int(di * sr)
        t = np.arange(n) / sr
        env = np.hanning(n)
        chunk = ai * env * (
            np.sin(2 * np.pi * fi * t)
            + 0.3 * np.sin(4 * np.pi * fi * t)
            + 0.1 * np.sin(6 * np.pi * fi * t)
        )
        chunks.append(chunk.astype(np.float32))
    wav = np.concatenate(chunks) if chunks else np.zeros(1, np.float32)
    print(f"synthesized {len(wav) / sr:.2f}s of audio")

    if args.out:
        import wave

        pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
        with wave.open(args.out, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    common.run_main(main)
