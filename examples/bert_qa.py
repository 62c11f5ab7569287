"""Extractive question answering with a BERT encoder.

TPU-native counterpart of rten-examples/src/bert_qa.rs: WordPiece
tokenization of [CLS] question [SEP] context [SEP] with segment ids, BERT
encoder, start/end span logits, best-span search, answer text recovered via
token offsets.

    python examples/bert_qa.py --demo
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--question", default="where is the cat")
    p.add_argument("--context", default="the small cat sleeps on the warm mat near the door")
    p.add_argument(
        "--model",
        help="real weights: .npz of an HF BertForQuestionAnswering (or "
        "BertModel + random span head) state dict, via models/bert."
        "from_hf_bert; --demo uses seeded weights",
    )
    p.add_argument("--heads", type=int, help="override inferred head count (--model)")
    p.add_argument(
        "--tokenizer", help="HF tokenizer.json (defaults to the demo word vocab)"
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.models import bert
    from rten_tpu.text.normalizer import Lowercase
    from rten_tpu.text.pretokenizer import BertPreTokenizer
    from rten_tpu.text.tokenizer import Tokenizer, WordPiece

    if args.tokenizer:
        with open(args.tokenizer, encoding="utf-8") as f:
            tok = Tokenizer.from_json(f.read())
        vocab = tok.model.vocab
    else:
        words = sorted(set((args.question + " " + args.context).lower().split()))
        vocab = common.word_vocab(words)
        tok = Tokenizer(
            WordPiece(vocab),
            normalizer=Lowercase(),
            pre_tokenizer=BertPreTokenizer(),
        )

    q_enc = tok.encode(args.question)
    c_enc = tok.encode(args.context)
    ids = [vocab["[CLS]"], *q_enc.ids, vocab["[SEP]"], *c_enc.ids, vocab["[SEP]"]]
    segs = [0] * (len(q_enc.ids) + 2) + [1] * (len(c_enc.ids) + 1)
    ctx_start = len(q_enc.ids) + 2  # first context token position

    qa_head = None
    if args.model:
        state = common.strip_prefix(common.load_state_npz(args.model), "bert.")
        d_model = state["embeddings.word_embeddings.weight"].shape[1]
        n_layers = 0
        while f"encoder.layer.{n_layers}.attention.self.query.weight" in state:
            n_layers += 1
        cfg = bert.BertConfig(
            vocab_size=state["embeddings.word_embeddings.weight"].shape[0],
            n_layers=n_layers,
            n_heads=args.heads or max(1, d_model // 64),
            d_model=d_model,
            d_ff=state["encoder.layer.0.intermediate.dense.weight"].shape[0],
            max_seq=state["embeddings.position_embeddings.weight"].shape[0],
        )
        print(f"loaded {args.model}: {cfg.n_layers} layers, d_model {cfg.d_model}")
        params = bert.from_hf_bert(state, cfg)
        if "qa_outputs.weight" in state:
            # BertForQuestionAnswering span head: Linear [2, D] → w [D, 2].
            qa_head = {
                "w": jnp.asarray(np.asarray(state["qa_outputs.weight"]).T),
                "b": jnp.asarray(np.asarray(state["qa_outputs.bias"])),
            }
    else:
        cfg = bert.BertConfig(
            vocab_size=len(vocab), n_layers=2, n_heads=4, d_model=64, d_ff=128, max_seq=64
        )
        params = bert.init_params(jax.random.PRNGKey(args.seed), cfg)
    hidden = bert.encode(
        params,
        cfg,
        jnp.asarray(np.asarray(ids, np.int32)[None]),
        segment_ids=jnp.asarray(np.asarray(segs, np.int32)[None]),
    )
    if qa_head is None:
        qa_head = {
            "w": jax.random.normal(jax.random.PRNGKey(args.seed + 1), (cfg.d_model, 2))
            * 0.1,
            "b": jnp.zeros((2,)),
        }
    start_l, end_l = bert.qa_logits(hidden, qa_head)
    start_l = np.asarray(start_l)[0]
    end_l = np.asarray(end_l)[0]

    # Best span within the context segment, end ≥ start, length ≤ 8.
    best, best_score = (ctx_start, ctx_start), -np.inf
    for s in range(ctx_start, len(ids) - 1):
        for e in range(s, min(s + 8, len(ids) - 1)):
            sc = start_l[s] + end_l[e]
            if sc > best_score:
                best, best_score = (s, e), sc
    context_tokens = c_enc.tokens
    s_rel, e_rel = best[0] - ctx_start, best[1] - ctx_start
    answer = " ".join(context_tokens[s_rel : e_rel + 1]).replace(" ##", "")
    print(f"Q: {args.question}")
    print(f"A: {answer!r} (span {best}, score {best_score:.2f})")
    return 0


if __name__ == "__main__":
    common.run_main(main)
