"""Multi-turn chat with a Llama/Qwen2-class decoder (RoPE, RMSNorm, SwiGLU,
GQA).

TPU-native counterpart of rten-examples/src/qwen2_chat.rs (multi-turn via
append_prompt at :149-178): a chat template wraps each user turn, the
Generator keeps the KV cache alive across turns, and follow-up prompts are
appended without re-prefilling history.

    python examples/qwen2_chat.py --demo
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--turns", type=int, default=2)
    p.add_argument("-n", "--max-tokens", type=int, default=8)
    args = p.parse_args(argv)

    import itertools

    import jax

    from rten_tpu.generate import Generator, GeneratorConfig, NativeBackend, TopKSampler
    from rten_tpu.models import decoder

    from examples.gpt2 import build_demo_tokenizer

    tok = build_demo_tokenizer()
    cfg = decoder.DecoderConfig(
        vocab_size=256,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,  # GQA
        d_model=128,
        d_ff=256,
        max_seq=512,
        pos_encoding="rope",
        norm="rmsnorm",
        activation="swiglu",
        tie_embeddings=False,
    )
    params = decoder.init_params(jax.random.PRNGKey(args.seed), cfg)

    gen = Generator(
        NativeBackend(params, cfg),
        GeneratorConfig(max_tokens=10**9, seed=args.seed),
    ).with_sampler(TopKSampler(20, temperature=0.8))

    def chat_template(user_text: str) -> list[int]:
        # Qwen2-style turn wrapping (<|im_start|> ... <|im_end|>), rendered
        # through the byte-level tokenizer.
        return tok.encode(f"<|im_start|>user\n{user_text}<|im_end|>\nassistant\n").ids

    questions = ["hello there", "and a follow-up question"][: args.turns]
    for turn, q in enumerate(questions):
        gen.append_prompt(chat_template(q))
        out = [int(t[0]) for t in itertools.islice(gen, args.max_tokens)]
        print(f"turn {turn}: user={q!r}")
        print(f"  assistant ({len(out)} tokens): {tok.decode(out)!r}")
    return 0


if __name__ == "__main__":
    common.run_main(main)
