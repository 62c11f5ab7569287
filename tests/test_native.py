"""Native C++ kernel parity tests: every native entry point must agree with
its pure-Python fallback (the sanitizer story for the native layer —
SURVEY.md §5 maps the reference's Miri checks to exactly this)."""

import numpy as np
import pytest

from rten_tpu.native import available
from rten_tpu.native.build import build

pytestmark = pytest.mark.skipif(
    build() is None, reason="g++ unavailable — native layer not built"
)


def test_library_builds_and_loads():
    assert available()


def test_bpe_native_matches_python():
    import json

    from rten_tpu.text import Tokenizer

    units = ["h", "e", "l", "o", "Ġ"]
    pieces = ["he", "ll", "hell", "hello", "Ġhello"]
    vocab = {u: i for i, u in enumerate(units + pieces)}
    merges = ["h e", "l l", "he ll", "hell o", "Ġ hello"]
    spec = json.dumps({
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False},
        "decoder": {"type": "ByteLevel"},
        "model": {"type": "BPE", "vocab": vocab, "merges": merges},
    })
    tok_native = Tokenizer.from_json(spec)
    tok_python = Tokenizer.from_json(spec)
    tok_python.model._native_tried = True  # force fallback

    for text in ["hello hello", "helloh", "hhhh", "hello olleh he"]:
        a = tok_native.encode(text)
        b = tok_python.encode(text)
        assert a.tokens == b.tokens, text
        assert a.ids == b.ids


def test_bpe_native_used():
    from rten_tpu.text.models import ByteLevelBPE

    bpe = ByteLevelBPE({"a": 0, "b": 1, "ab": 2}, ["a b"])
    out = bpe._bpe("abab")
    assert out == ["ab", "ab"]
    assert bpe._get_native() is not None  # actually exercised the C++ path


def test_ctc_native_matches_python():
    from rten_tpu.ctc import CtcDecoder

    rng = np.random.default_rng(42)
    for trial in range(5):
        probs = rng.dirichlet(np.ones(6), size=12).astype(np.float32)
        dec = CtcDecoder()
        native = dec.decode_beam(probs, beam_size=8)
        python = dec.decode_beam_nbest(probs, beam_size=8, n_best=1)[0]
        assert native.labels == python.labels, f"trial {trial}"
        assert abs(native.log_prob - python.log_prob) < 1e-6


def test_contours_native_matches_python(rng):
    from rten_tpu.image import contours as c

    masks = []
    m = np.zeros((12, 12), bool)
    m[2:6, 3:9] = True
    m[8:11, 1:4] = True
    masks.append(m)
    masks.append(rng.random((16, 16)) > 0.6)

    for mask in masks:
        native = c.find_contours(mask)

        # pure-python path: temporarily hide the native lib
        from rten_tpu.native import bindings

        orig = bindings.load_library
        bindings.load_library = lambda auto_build=True: None
        try:
            python = c.find_contours(mask)
        finally:
            bindings.load_library = orig

        assert len(native) == len(python)
        for a, b in zip(native, python):
            np.testing.assert_array_equal(a.as_array(), b.as_array())
