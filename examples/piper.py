"""Text-to-speech synthesis (Piper-style) writing a .wav file.

TPU-native counterpart of rten-examples/src/piper.rs: text → phoneme-ish id
sequence → acoustic model → waveform → 16-bit PCM WAV via rten_tpu.audio
(the reference writes WAV via hound).

    python examples/piper.py --demo --out speech.wav     # inline demo model
    python examples/piper.py --model tts.rten --text "hi" --out speech.wav

``--model`` takes a .rten graph whose first input is the phoneme id
sequence [1, N] int32 and whose first output is the waveform (any shape
flattening to samples) — run through rten_tpu.Model like the reference's
VITS export through Model::run.
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
    p.add_argument("--model", help="TTS model as .rten ([1,N] ids → waveform)")
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

    sr = args.sr
    if args.model:
        from rten_tpu import Model

        m = Model.load_file(args.model)
        out = m.run([ids[None]])[0]
        wav = np.asarray(out, np.float32).reshape(-1)
        print(f"loaded {args.model}: {len(wav) / sr:.2f}s through Model.run")
        if args.out:
            from rten_tpu.audio import write_wav

            write_wav(args.out, np.clip(wav, -1.0, 1.0), sr)
            print(f"wrote {args.out}")
        return 0

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
        from rten_tpu.audio import write_wav

        write_wav(args.out, np.clip(wav, -1.0, 1.0), sr)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    common.run_main(main)
