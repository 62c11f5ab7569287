"""Speech-to-text with CTC decoding (wav2vec2-style).

TPU-native counterpart of rten-examples/src/wav2vec2.rs: waveform → strided
conv feature extractor → transformer encoder → per-frame character logits →
CTC beam-search decode (rten_tpu.ctc, ≙ src/ctc.rs CtcDecoder::decode_beam).

    python examples/wav2vec2.py --demo
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common

CHARSET = "_ abcdefghijklmnopqrstuvwxyz'"  # _ = CTC blank at index 0


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--beam", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.ctc import CtcDecoder
    from rten_tpu.models import bert

    wav, sr = common.synthetic_audio(1.0, seed=args.seed)
    print(f"audio: {len(wav)} samples @ {sr} Hz")

    # Strided conv feature extractor: frame the waveform into 20ms windows
    # and project (the wav2vec2 conv stack reduced to one big strided matmul).
    win, hop, d = 400, 320, 64
    n_frames = (len(wav) - win) // hop + 1
    frames = np.stack([wav[i * hop : i * hop + win] for i in range(n_frames)])
    w_feat = np.asarray(
        jax.random.normal(jax.random.PRNGKey(args.seed), (win, d)) * 0.1
    )
    feats = jnp.asarray(frames) @ jnp.asarray(w_feat)  # [T, d]

    # Transformer encoder over frames (reuse the BERT-class encoder blocks by
    # injecting frame features in place of token embeddings).
    cfg = bert.BertConfig(
        vocab_size=4, n_layers=2, n_heads=2, d_model=d, d_ff=128,
        max_seq=n_frames + 8, n_segments=0,
    )
    params = bert.init_params(jax.random.PRNGKey(args.seed + 1), cfg)
    params["tok_emb"] = jnp.zeros_like(params["tok_emb"])
    x = feats[None] + params["pos_emb"][None, :n_frames]
    # run encoder layers directly over x
    hidden = _encode_features(params, cfg, x)

    w_head = jax.random.normal(jax.random.PRNGKey(args.seed + 2), (d, len(CHARSET))) * 0.3
    logits = np.asarray(hidden[0] @ w_head, np.float32)  # [T, C]

    dec = CtcDecoder(blank=0)
    hyp = dec.decode_beam(np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1)), beam_size=args.beam)
    text = "".join(CHARSET[i] for i in hyp.labels)
    greedy = dec.decode_greedy(np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1)))
    print(f"beam   ({args.beam}): {text!r}")
    print(f"greedy     : {''.join(CHARSET[i] for i in greedy.labels)!r}")
    return 0


def _encode_features(params, cfg, x):
    import jax
    import jax.numpy as jnp

    from rten_tpu.kernels import dispatch
    from rten_tpu.models.bert import _ln_f, _proj

    b, t, _ = x.shape
    h, hd = cfg.n_heads, cfg.head_dim
    x = _ln_f(x, params["emb_ln"], cfg.layer_norm_eps)
    for layer in params["layers"]:
        q = _proj(x, layer["wq"], layer["bq"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = _proj(x, layer["wk"], layer["bk"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = _proj(x, layer["wv"], layer["bv"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        s = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) / (hd**0.5), -1)
        attn = jnp.einsum("bhqk,bhkd->bhqd", s, v).transpose(0, 2, 1, 3).reshape(b, t, h * hd)
        x = _ln_f(x + _proj(attn, layer["wo"], layer["bo"]), layer["attn_ln"], cfg.layer_norm_eps)
        up = jax.nn.gelu(_proj(x, layer["w_up"], layer["b_up"]))
        x = _ln_f(x + _proj(up, layer["w_down"], layer["b_down"]), layer["ffn_ln"], cfg.layer_norm_eps)
    return x


if __name__ == "__main__":
    common.run_main(main)
