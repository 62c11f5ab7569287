"""Smoke tests: every example app runs end-to-end in --demo mode.

The reference's examples are its de-facto integration suite (17 bin targets,
rten-examples/Cargo.toml); this runs each TPU-native counterpart's full
pipeline on CPU with synthetic weights.
"""

import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, os.path.join(EXAMPLES_DIR, ".."))

ALL_EXAMPLES = [
    ("imagenet", []),
    ("yolo", []),
    ("deeplab", []),
    ("detr", []),
    ("depth_anything", []),
    ("segment_anything", []),
    ("distilvit", ["-n", "3"]),
    ("trocr", ["-n", "4"]),
    ("bert_qa", []),
    ("jina_similarity", []),
    ("gpt2", ["-n", "4"]),
    ("qwen2_chat", ["-n", "3", "--turns", "2"]),
    ("piper", []),
    ("silero", []),
    ("wav2vec2", ["--beam", "2"]),
]


@pytest.mark.parametrize("name,extra", ALL_EXAMPLES, ids=[n for n, _ in ALL_EXAMPLES])
def test_example_demo(name, extra, capsys):
    import importlib

    mod = importlib.import_module(f"examples.{name}")
    rc = mod.main(["--demo", *extra])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.strip(), f"{name} printed nothing"


def test_example_outputs(tmp_path):
    """Examples that write artifacts produce non-empty files."""
    import importlib

    for name, flag in (("yolo", "--out"), ("deeplab", "--out"), ("piper", "--out")):
        ext = ".wav" if name == "piper" else ".png"
        path = str(tmp_path / f"{name}{ext}")
        mod = importlib.import_module(f"examples.{name}")
        assert mod.main(["--demo", flag, path]) == 0
        assert os.path.getsize(path) > 0
