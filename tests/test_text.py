"""Tokenizer tests (reference: rten-text inline tests — wordpiece.rs,
bpe.rs, tokenizers.rs)."""

import json

import pytest

from rten_tpu.text import Tokenizer
from rten_tpu.text.models import bytes_to_unicode, unicode_to_bytes
from rten_tpu.text.normalizer import BertNormalizer


def bert_tokenizer_json():
    vocab = {
        "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
        "the": 4, "quick": 5, "fox": 6, "play": 7, "##ing": 8, "##ed": 9,
        "jump": 10, ",": 11, "over": 12,
    }
    return json.dumps({
        "normalizer": {"type": "BertNormalizer", "lowercase": True},
        "pre_tokenizer": {"type": "BertPreTokenizer"},
        "model": {"type": "WordPiece", "vocab": vocab, "unk_token": "[UNK]",
                  "continuing_subword_prefix": "##"},
        "post_processor": {
            "type": "TemplateProcessing",
            "single": [
                {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
                {"Sequence": {"id": "A", "type_id": 0}},
                {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
            ],
            "pair": [
                {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
                {"Sequence": {"id": "A", "type_id": 0}},
                {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
                {"Sequence": {"id": "B", "type_id": 1}},
                {"SpecialToken": {"id": "[SEP]", "type_id": 1}},
            ],
        },
        "added_tokens": [
            {"id": 0, "content": "[PAD]", "special": True},
            {"id": 1, "content": "[UNK]", "special": True},
            {"id": 2, "content": "[CLS]", "special": True},
            {"id": 3, "content": "[SEP]", "special": True},
        ],
    })


def gpt2_tokenizer_json():
    # Byte-level BPE over a tiny vocab: "hello" assembles via merges,
    # "Ġhello" covers the mid-sentence (space-prefixed) case.
    units = ["h", "e", "l", "o", "Ġ"]
    pieces = ["he", "ll", "hell", "hello", "Ġhello"]
    vocab = {u: i for i, u in enumerate(units + pieces)}
    vocab["<|endoftext|>"] = len(vocab)
    merges = ["h e", "l l", "he ll", "hell o", "Ġ hello"]
    return json.dumps({
        "normalizer": None,
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False},
        "decoder": {"type": "ByteLevel"},
        "model": {"type": "BPE", "vocab": vocab, "merges": merges},
        "added_tokens": [
            {"id": vocab["<|endoftext|>"], "content": "<|endoftext|>", "special": True}
        ],
    })


def test_byte_unicode_table_bijective():
    fwd = bytes_to_unicode()
    rev = unicode_to_bytes()
    assert len(fwd) == 256
    assert all(rev[v] == k for k, v in fwd.items())
    assert fwd[32] == "Ġ"  # space


def test_wordpiece_encode_decode():
    tok = Tokenizer.from_json(bert_tokenizer_json())
    enc = tok.encode("The quick fox playing")
    assert enc.tokens == ["[CLS]", "the", "quick", "fox", "play", "##ing", "[SEP]"]
    assert enc.ids == [2, 4, 5, 6, 7, 8, 3]
    assert tok.decode(enc.ids) == "the quick fox playing"


def test_wordpiece_unknown_word():
    tok = Tokenizer.from_json(bert_tokenizer_json())
    enc = tok.encode("zebra", add_special_tokens=False)
    assert enc.tokens == ["[UNK]"]


def test_wordpiece_pair_template():
    tok = Tokenizer.from_json(bert_tokenizer_json())
    enc = tok.encode("the fox", pair="the quick")
    assert enc.tokens == [
        "[CLS]", "the", "fox", "[SEP]", "the", "quick", "[SEP]",
    ]


def test_wordpiece_punctuation_split():
    tok = Tokenizer.from_json(bert_tokenizer_json())
    enc = tok.encode("the, fox", add_special_tokens=False)
    assert enc.tokens == ["the", ",", "fox"]


def test_wordpiece_offsets():
    tok = Tokenizer.from_json(bert_tokenizer_json())
    enc = tok.encode("The quick", add_special_tokens=False)
    assert enc.offsets[0] == (0, 3)
    assert enc.offsets[1] == (4, 9)


def test_bert_normalizer_accents_and_case():
    n = BertNormalizer(lowercase=True)
    assert n.normalize("Héllo\tWörld") == "hello world"


def test_bpe_encode_decode():
    tok = Tokenizer.from_json(gpt2_tokenizer_json())
    enc = tok.encode("hello hello")
    assert enc.tokens == ["hello", "Ġhello"]
    assert tok.decode(enc.ids) == "hello hello"


def test_bpe_partial_merges():
    tok = Tokenizer.from_json(gpt2_tokenizer_json())
    enc = tok.encode("helloh")  # trailing h can't merge
    assert enc.tokens == ["hello", "h"]


def test_bpe_special_token_passthrough():
    tok = Tokenizer.from_json(gpt2_tokenizer_json())
    enc = tok.encode("hello<|endoftext|>hello")
    assert "<|endoftext|>" in enc.tokens
    eos = tok.token_to_id("<|endoftext|>")
    assert eos in enc.ids
    # special tokens skipped in decode
    assert tok.decode(enc.ids) == "hellohello"


def test_token_id_round_trip():
    tok = Tokenizer.from_json(gpt2_tokenizer_json())
    tid = tok.token_to_id("hello")
    assert tok.id_to_token(tid) == "hello"


def test_unicode_multibyte_bpe():
    # multibyte utf-8 chars survive the byte-level round trip even when each
    # byte is its own token
    units = bytes_to_unicode()
    text = "héllo"
    raw = text.encode("utf-8")
    vocab = {units[b]: i for i, b in enumerate(sorted(set(raw)))}
    spec = json.dumps({
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False},
        "decoder": {"type": "ByteLevel"},
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
    })
    tok = Tokenizer.from_json(spec)
    enc = tok.encode(text)
    assert tok.decode(enc.ids) == text
