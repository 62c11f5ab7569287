"""Audio I/O (reference: the hound-based .wav paths in rten-examples)."""

from rten_tpu.audio.io import read_wav, resample, write_wav

__all__ = ["read_wav", "write_wav", "resample"]
