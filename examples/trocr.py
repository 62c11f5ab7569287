"""Printed-text OCR (TrOCR-style: image line encoder → char decoder).

TPU-native counterpart of rten-examples/src/trocr.rs: text-line image →
ViT-style line encoder → encoder-decoder cross-attention → autoregressive
character decode until EOS.

    python examples/trocr.py --demo
    python examples/trocr.py --image line.png --encoder enc.rten --decoder dec.rten

``--encoder``/``--decoder`` take the exported .rten graph PAIR the reference
runs (trocr.rs loads encoder + decoder models): the encoder maps
[1, 3, H, W] → [1, N, D] memory; the decoder follows HF-Optimum decoder
conventions (input_ids, encoder_hidden_states, past_key_values.0.decoder.*)
and is driven by rten_tpu.generate.GraphBackend with the encoder memory as
a hoisted constant input.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common

CHARSET = "<> abcdefghijklmnopqrstuvwxyz0123456789"


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("-n", "--max-chars", type=int, default=12)
    p.add_argument("--image", help="text-line image file (PNG/BMP/…)")
    p.add_argument("--encoder", help="line encoder as .rten ([1,3,H,W] → [1,N,D])")
    p.add_argument("--decoder", help="HF-Optimum-convention decoder as .rten")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.models import encoder_decoder as ed
    from rten_tpu.models import vit

    # A text line is a wide, short strip.
    h, w, d = 16, 64, 64
    if args.image:
        from rten_tpu.image.io import read_image

        line = read_image(args.image)
        if line.shape[1:] != (h, w):
            line = np.asarray(
                jax.image.resize(line, (3, h, w), "bilinear"), np.float32
            )
        print(f"image: {args.image} -> {line.shape}")
    else:
        rng = np.random.default_rng(args.seed)
        line = np.clip(
            0.9 - 0.8 * (rng.random((3, h, w)) < 0.2), 0.0, 1.0
        ).astype(np.float32)

    if args.encoder and args.decoder:
        from rten_tpu import Model
        from rten_tpu.generate import Generator, GeneratorConfig
        from rten_tpu.generate.generator import GraphBackend

        enc_m = Model.load_file(args.encoder)
        enc_states = np.asarray(enc_m.run([line[None]])[0], np.float32)
        dec_m = Model.load_file(args.decoder)
        be = GraphBackend(
            dec_m, constant_inputs={"encoder_hidden_states": enc_states}
        )
        print(
            f"loaded encoder+decoder: memory {enc_states.shape}, "
            f"decoder mode {be.mode}"
        )
        eos = CHARSET.index(">")
        gen = Generator(
            be, GeneratorConfig(max_tokens=args.max_chars, eos_tokens=(eos,))
        ).with_prompt([CHARSET.index("<")])
        out = [CHARSET[int(t[0])] for t in gen if int(t[0]) != eos]
        print(f"recognized: {''.join(out)!r}")
        return 0

    vit_cfg = vit.ViTConfig(
        image_size=None, patch_size=8, n_layers=2, n_heads=2,
        d_model=d, d_ff=128, use_cls_token=False,
    )
    # Rectangular input: patchify directly, bypass the square-image helper.
    patches = vit.patchify(jnp.asarray(line[None]), 8)  # [1, (h/8)(w/8), 192]
    vit_params = vit.init_params(jax.random.PRNGKey(args.seed), _square_cfg(vit_cfg, patches))
    enc_states = _encode_patches(vit_params, vit_cfg, patches)

    ed_cfg = ed.EncDecConfig(
        n_mels=d, vocab_size=len(CHARSET), d_model=d, n_heads=2,
        n_audio_layers=1, n_text_layers=2, d_ff=128,
        max_text_ctx=32, dtype=jnp.float32,
    )
    ed_params = ed.init_params(jax.random.PRNGKey(args.seed + 1), ed_cfg)
    state = ed.init_decoder_state(ed_params, ed_cfg, enc_states.astype(ed_cfg.dtype))

    tokens = jnp.asarray([[0]], jnp.int32)  # '<' = BOS
    out = []
    for _ in range(args.max_chars):
        logits, state = ed.decode(ed_params, ed_cfg, tokens, state)
        nxt = int(np.asarray(jnp.argmax(logits[0, -1])))
        if CHARSET[nxt] == ">":
            break
        out.append(CHARSET[nxt])
        tokens = jnp.asarray([[nxt]], jnp.int32)
    print(f"recognized: {''.join(out)!r}")
    return 0


def _square_cfg(cfg, patches):
    import dataclasses

    from rten_tpu.models.vit import ViTConfig

    n = patches.shape[1]
    side = int(round(n**0.5))
    # init_params only uses n_patches/patch_dim via image_size — fabricate a
    # square config with the same token count and patch dim.
    return dataclasses.replace(
        cfg, image_size=side * cfg.patch_size
    )


def _encode_patches(params, cfg, patches):
    """ViT encode over pre-patchified tokens (rectangular inputs)."""
    import jax.numpy as jnp

    from rten_tpu.kernels import dispatch
    from rten_tpu.models.vit import _ln_f
    import jax

    x = dispatch.matmul(patches.astype(cfg.dtype), params["patch_w"]) + params["patch_b"]
    n = x.shape[1]
    x = x + params["pos_emb"][None, :n]
    b, t, dm = x.shape
    h, hd = cfg.n_heads, dm // cfg.n_heads
    for layer in params["layers"]:
        xn = _ln_f(x, layer["ln1"], cfg.layer_norm_eps)
        qkv = dispatch.matmul(xn, layer["wqkv"]) + layer["bqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        s = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) / (hd**0.5), -1)
        attn = jnp.einsum("bhqk,bhkd->bhqd", s, v).transpose(0, 2, 1, 3).reshape(b, t, dm)
        x = x + dispatch.matmul(attn, layer["wo"]) + layer["bo"]
        xn = _ln_f(x, layer["ln2"], cfg.layer_norm_eps)
        up = jax.nn.gelu(dispatch.matmul(xn, layer["w_up"]) + layer["b_up"])
        x = x + dispatch.matmul(up, layer["w_down"]) + layer["b_down"]
    return _ln_f(x, params["final_ln"], cfg.layer_norm_eps)


if __name__ == "__main__":
    common.run_main(main)
