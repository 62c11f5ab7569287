"""Tokenizers (reference: rten-text crate — WordPiece wordpiece.rs:20,
byte-level BPE bpe.rs:232, HF tokenizer.json loader tokenizers/json.rs,
normalizer.rs). Pure-Python host-side text processing; the hot BPE merge loop
optionally routes to the C++ native extension (rten_tpu.native) when built.
"""

from rten_tpu.text.tokenizer import Encoded, Tokenizer, TokenizerError

__all__ = ["Tokenizer", "Encoded", "TokenizerError"]
