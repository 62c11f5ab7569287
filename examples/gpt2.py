"""GPT-2 text generation with the native decoder + Generator pipeline.

TPU-native counterpart of rten-examples/src/gpt2.rs (generator chain at
:112-118): prompt → byte-level BPE tokenizer → Generator(.with_prompt
.with_sampler .profile) → streamed decode with throughput metrics.

    python examples/gpt2.py --demo --prompt "the quick brown" -n 16
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common


def build_demo_tokenizer():
    """Byte-level BPE over raw bytes (GPT-2's scheme with an empty merge
    table: every byte is a token — demo-sized but the real code path)."""
    from rten_tpu.text.models import bytes_to_unicode
    from rten_tpu.text.pretokenizer import ByteLevel
    from rten_tpu.text.tokenizer import ByteLevelBPE, Tokenizer

    byte_vocab = {u: b for b, u in bytes_to_unicode().items()}
    model = ByteLevelBPE(vocab=byte_vocab, merges=[])
    return Tokenizer(model, pre_tokenizer=ByteLevel(), byte_level_decode=True)


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--prompt", default="the quick brown fox")
    p.add_argument("-n", "--max-tokens", type=int, default=16)
    p.add_argument("--top-k", type=int, default=40)
    p.add_argument("--int8", action="store_true", help="INT8 weight-only quantization")
    args = p.parse_args(argv)

    import itertools

    import jax
    import numpy as np

    from rten_tpu.generate import Generator, GeneratorConfig, Metrics, NativeBackend, TopKSampler
    from rten_tpu.models import decoder

    tok = build_demo_tokenizer()
    prompt_ids = tok.encode(args.prompt).ids
    print(f"prompt: {args.prompt!r} -> {len(prompt_ids)} tokens")

    cfg = decoder.DecoderConfig(
        vocab_size=256, n_layers=2, n_heads=4, d_model=128, d_ff=512, max_seq=256
    )
    params = decoder.init_params(jax.random.PRNGKey(args.seed), cfg)
    if args.int8:
        params = decoder.quantize_params_int8(params)

    metrics = Metrics()
    gen = (
        Generator(
            NativeBackend(params, cfg),
            GeneratorConfig(max_tokens=args.max_tokens, seed=args.seed),
        )
        .with_prompt(prompt_ids)
        .with_sampler(TopKSampler(args.top_k, temperature=0.8))
        .profile(metrics)
    )
    out_ids = [int(t[0]) for t in itertools.islice(gen, args.max_tokens)]
    text = tok.decode(out_ids)
    print(f"generated: {text!r}")
    print(metrics.summary())
    return 0


if __name__ == "__main__":
    common.run_main(main)
