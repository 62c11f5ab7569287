"""Sentence-embedding similarity (Jina-style mean-pooled encoder).

TPU-native counterpart of rten-examples/src/jina_similarity.rs: sentences →
WordPiece tokenization → BERT-class encoder batch (padded, per-sequence
lengths masked) → mean-pool + L2-normalize → cosine similarity ranking.

    python examples/jina_similarity.py --demo --query "cats sleep"
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common

DOCS = [
    "the cat sleeps on the mat",
    "a dog chases the ball in the park",
    "cats nap in warm sunshine",
    "stock markets rallied on tuesday",
]


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--query", default="sleeping cats")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.models import bert
    from rten_tpu.text.normalizer import Lowercase
    from rten_tpu.text.pretokenizer import BertPreTokenizer
    from rten_tpu.text.tokenizer import Tokenizer, WordPiece

    texts = [args.query, *DOCS]
    words = sorted({w for t in texts for w in t.lower().split()})
    tok = Tokenizer(
        WordPiece(common.word_vocab(words)),
        normalizer=Lowercase(),
        pre_tokenizer=BertPreTokenizer(),
    )

    encs = [tok.encode(t).ids for t in texts]
    max_len = max(len(e) for e in encs)
    ids = np.zeros((len(encs), max_len), np.int32)
    lengths = np.zeros((len(encs),), np.int32)
    for i, e in enumerate(encs):
        ids[i, : len(e)] = e
        lengths[i] = len(e)

    cfg = bert.BertConfig(
        vocab_size=len(words) + 8, n_layers=2, n_heads=4, d_model=64, d_ff=128,
        max_seq=64, n_segments=0,
    )
    params = bert.init_params(jax.random.PRNGKey(args.seed), cfg)
    hidden = bert.encode(params, cfg, jnp.asarray(ids), lengths=jnp.asarray(lengths))
    emb = np.asarray(bert.pool(hidden, jnp.asarray(lengths), mode="mean"), np.float32)

    sims = emb[1:] @ emb[0]
    order = np.argsort(sims)[::-1]
    print(f"query: {args.query!r}")
    for rank, i in enumerate(order, 1):
        print(f"  {rank}. sim={sims[i]:+.4f}  {DOCS[i]!r}")
    return 0


if __name__ == "__main__":
    common.run_main(main)
