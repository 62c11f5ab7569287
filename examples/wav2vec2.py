"""Speech-to-text with CTC decoding (wav2vec2-style).

TPU-native counterpart of rten-examples/src/wav2vec2.rs: .wav waveform →
wav2vec2 acoustic model → per-frame character logits → CTC beam-search
decode (rten_tpu.ctc, ≙ src/ctc.rs CtcDecoder::decode_beam). The reference
reads the .wav via hound (wav2vec2.rs:25-40); here rten_tpu.audio does.

    python examples/wav2vec2.py --demo                      # synthetic
    python examples/wav2vec2.py --audio speech.wav --model wav2vec2.npz

``--model`` takes a HuggingFace ``Wav2Vec2ForCTC`` state dict saved as .npz
(np.savez(path, **{k: v.numpy() for k, v in model.state_dict().items()}))
routed through rten_tpu.models.wav2vec2.from_hf_wav2vec2. ``--vocab`` takes
the matching HF vocab.json; the base-960h character set is the default.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common

CHARSET = "_ abcdefghijklmnopqrstuvwxyz'"  # _ = CTC blank at index 0

# facebook/wav2vec2-base-960h vocab (vocab.json order): id → token.
W2V2_BASE_VOCAB = (
    ["<pad>", "<s>", "</s>", "<unk>", "|"]
    + list("ETAONIHSRDLUMWCFGYPBVK'XJQZ")
)


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--audio", help=".wav file (any rate; resampled to 16 kHz)")
    p.add_argument("--model", help="Wav2Vec2ForCTC state dict as .npz")
    p.add_argument("--vocab", help="HF vocab.json (token → id) for --model")
    p.add_argument("--heads", type=int, default=12, help="attention heads (--model)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.ctc import CtcDecoder

    if args.audio:
        from rten_tpu.audio import read_wav, resample

        wav, sr = read_wav(args.audio)
        if sr != 16000:
            wav = resample(wav, sr, 16000)
            print(f"resampled {sr} Hz -> 16000 Hz")
            sr = 16000
    else:
        wav, sr = common.synthetic_audio(1.0, seed=args.seed)
    print(f"audio: {len(wav)} samples @ {sr} Hz")

    if args.model:
        from rten_tpu.models import wav2vec2 as w2v

        state = common.load_state_npz(args.model)
        cfg = w2v.infer_config(state, n_heads=args.heads)
        params = w2v.from_hf_wav2vec2(state, cfg)
        n_params = sum(
            int(np.asarray(v).size) for v in jax.tree_util.tree_leaves(params)
        )
        print(
            f"loaded wav2vec2: {cfg.n_layers} layers, d_model {cfg.d_model}, "
            f"vocab {cfg.vocab_size} ({n_params / 1e6:.1f}M params)"
        )
        if args.vocab:
            import json

            with open(args.vocab) as f:
                tok2id = json.load(f)
            id2tok = {v: k for k, v in tok2id.items()}
            vocab = [id2tok.get(i, "<unk>") for i in range(cfg.vocab_size)]
        else:
            vocab = (W2V2_BASE_VOCAB + ["<unk>"] * cfg.vocab_size)[: cfg.vocab_size]
        logits = np.asarray(
            w2v.ctc_logits(params, cfg, jnp.asarray(wav[None])), np.float32
        )[0]

        def render(labels):
            out = []
            for i in labels:
                t = vocab[i]
                out.append(" " if t == "|" else t if len(t) == 1 else "")
            return "".join(out)

    else:
        logits = _demo_logits(wav, args.seed)
        vocab = list(CHARSET)

        def render(labels):
            return "".join(CHARSET[i] for i in labels)

    log_probs = np.asarray(
        jax.nn.log_softmax(jnp.asarray(logits), -1), np.float32
    )
    dec = CtcDecoder(blank=0)
    hyp = dec.decode_beam(log_probs, beam_size=args.beam)
    greedy = dec.decode_greedy(log_probs)
    print(f"beam   ({args.beam}): {render(hyp.labels)!r}")
    print(f"greedy     : {render(greedy.labels)!r}")
    return 0


def _demo_logits(wav, seed):
    """Seeded synthetic pipeline (no checkpoint): framed waveform → BERT-class
    encoder over frames → per-frame character logits."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.models import bert

    win, hop, d = 400, 320, 64
    n_frames = (len(wav) - win) // hop + 1
    frames = np.stack([wav[i * hop : i * hop + win] for i in range(n_frames)])
    w_feat = np.asarray(jax.random.normal(jax.random.PRNGKey(seed), (win, d)) * 0.1)
    feats = jnp.asarray(frames) @ jnp.asarray(w_feat)  # [T, d]

    cfg = bert.BertConfig(
        vocab_size=4, n_layers=2, n_heads=2, d_model=d, d_ff=128,
        max_seq=n_frames + 8, n_segments=0,
    )
    params = bert.init_params(jax.random.PRNGKey(seed + 1), cfg)
    params["tok_emb"] = jnp.zeros_like(params["tok_emb"])
    x = feats[None] + params["pos_emb"][None, :n_frames]
    hidden = _encode_features(params, cfg, x)

    w_head = jax.random.normal(jax.random.PRNGKey(seed + 2), (d, len(CHARSET))) * 0.3
    return np.asarray(hidden[0] @ w_head, np.float32)  # [T, C]


def _encode_features(params, cfg, x):
    import jax
    import jax.numpy as jnp

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
