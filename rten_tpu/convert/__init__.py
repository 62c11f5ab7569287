"""ONNX → `.rten` converter (reference: rten-convert package).

    python -m rten_tpu.convert model.onnx [model.rten] [--quantize]

Unlike the reference's offline-only converter, rten_tpu can also load .onnx
directly (Model.load_onnx); this CLI exists for producing reference-
compatible .rten artifacts (plus the INT8 extension with --quantize).
"""
