"""Voice activity detection (Silero-style streaming VAD).

TPU-native counterpart of rten-examples/src/silero.rs: waveform → framed
features → GRU over frames (rten_tpu.ops.rnn, ≙ src/ops/rnn.rs GRU :311) →
per-frame speech probability → hysteresis thresholding into speech segments
with start/end timestamps — the reference's exact post-processing.

    python examples/silero.py --demo
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--on", type=float, default=0.6, help="speech-start threshold")
    p.add_argument("--off", type=float, default=0.4, help="speech-end threshold")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.ops.registry import OpContext, get_op

    wav, sr = common.synthetic_audio(2.0, seed=args.seed)
    win = hop = 320  # 20 ms frames
    n_frames = len(wav) // hop
    frames = wav[: n_frames * hop].reshape(n_frames, hop)

    # Frame features: log-energy + zero-crossing rate + band energies.
    energy = np.log1p((frames**2).sum(-1))
    zcr = (np.abs(np.diff(np.sign(frames), axis=-1)) > 0).mean(-1)
    spec = np.abs(np.fft.rfft(frames, axis=-1))
    bands = np.log1p(spec.reshape(n_frames, 7, 23).sum(-1))
    feats = np.concatenate([energy[:, None], zcr[:, None], bands], -1).astype(np.float32)
    feats = (feats - feats.mean(0)) / (feats.std(0) + 1e-6)
    d_in, d_h = feats.shape[-1], 16

    # GRU over frames through the operator library (the reference runs the
    # Silero ONNX graph whose core is exactly this GRU op).
    rng = np.random.default_rng(args.seed)
    w = (rng.standard_normal((1, 3 * d_h, d_in)) * 0.5).astype(np.float32)
    r = (rng.standard_normal((1, 3 * d_h, d_h)) * 0.5).astype(np.float32)
    b = np.zeros((1, 6 * d_h), np.float32)
    gru = get_op("GRU").fn
    out = gru(
        OpContext(),
        {"hidden_size": d_h, "direction": "forward"},
        feats[:, None, :],  # [T, B, D]
        w, r, b,
    )
    hidden = np.asarray(out[0])[:, 0, 0, :]  # [T, H]

    w_cls = (rng.standard_normal(d_h) * 0.8).astype(np.float32)
    probs = 1.0 / (1.0 + np.exp(-(hidden @ w_cls)))
    # Mix in normalized energy so the demo weights track actual activity.
    e_norm = (energy - energy.min()) / max(energy.max() - energy.min(), 1e-9)
    probs = 0.3 * probs + 0.7 * e_norm

    # Hysteresis segmentation (silero.rs post-processing).
    segments, active, start = [], False, 0
    for i, prob_i in enumerate(probs):
        if not active and prob_i >= args.on:
            active, start = True, i
        elif active and prob_i < args.off:
            segments.append((start, i))
            active = False
    if active:
        segments.append((start, n_frames))

    print(f"{n_frames} frames, {len(segments)} speech segment(s):")
    for s, e in segments:
        print(f"  {s * hop / sr:6.2f}s – {e * hop / sr:6.2f}s  ({e - s} frames)")
    return 0


if __name__ == "__main__":
    common.run_main(main)
