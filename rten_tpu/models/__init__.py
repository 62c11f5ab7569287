"""Native flagship models (the counterparts of the reference's
rten-examples model zoo, re-implemented TPU-first instead of loaded from
ONNX graphs): a generic transformer decoder covering GPT-2-class and
Llama-class configs, ResNet-style CNNs, and a Whisper-class encoder-decoder.

Graph-loaded `.rten` models run through rten_tpu.runtime; these native models
are the serving/benchmark path where we control sharding, KV caches and
Pallas kernel placement end to end.
"""
