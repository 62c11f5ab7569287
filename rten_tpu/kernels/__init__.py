"""Pallas TPU kernels — the replacements for the reference's native compute
(rten-simd, rten-vecmath, src/gemm BLIS GEMM): blocked MXU matmul with fused
bias/activation, fused INT8 weight-dequant + matmul, and flash/paged
attention. ``dispatch`` routes ops to Pallas or plain XLA per shape/platform.
"""
