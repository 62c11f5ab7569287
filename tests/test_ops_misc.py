"""Norm, reduce, resize, einsum, generate, quant, NMS, RNN op tests."""

import numpy as np
import pytest

from helpers import run_op
from rten_tpu.ops.registry import OpContext, get_op


def test_softmax_logsoftmax(rng):
    x = rng.standard_normal((3, 5)).astype(np.float32)
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    sm = e / e.sum(axis=-1, keepdims=True)
    np.testing.assert_allclose(run_op("Softmax", x, attrs={"axis": -1}), sm, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        run_op("LogSoftmax", x, attrs={"axis": -1}), np.log(sm), rtol=1e-4, atol=1e-5
    )


def test_batch_norm(rng):
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    scale = rng.standard_normal(3).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)
    mean = rng.standard_normal(3).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 3).astype(np.float32)
    out = run_op("BatchNormalization", x, scale, b, mean, var, attrs={"epsilon": 1e-5})
    ref = (x - mean[:, None, None]) / np.sqrt(var[:, None, None] + 1e-5) * scale[
        :, None, None
    ] + b[:, None, None]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_instance_norm(rng):
    x = rng.standard_normal((2, 3, 8)).astype(np.float32)
    scale = rng.standard_normal(3).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)
    out = run_op("InstanceNormalization", x, scale, b, attrs={"epsilon": 1e-5})
    mean = x.mean(axis=2, keepdims=True)
    var = x.var(axis=2, keepdims=True)
    ref = (x - mean) / np.sqrt(var + 1e-5) * scale[:, None] + b[:, None]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_layer_norm(rng):
    x = rng.standard_normal((2, 5, 8)).astype(np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    out = run_op("LayerNormalization", x, scale, bias, attrs={"axis": -1, "epsilon": 1e-5})
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


REDUCES = {
    "ReduceSum": np.sum,
    "ReduceMean": np.mean,
    "ReduceProd": np.prod,
    "ReduceMin": np.min,
    "ReduceMax": np.max,
    "ReduceL2": lambda x, axis, keepdims: np.sqrt((x * x).sum(axis=axis, keepdims=keepdims)),
    "ReduceSumSquare": lambda x, axis, keepdims: (x * x).sum(axis=axis, keepdims=keepdims),
}


@pytest.mark.parametrize("name", sorted(REDUCES))
def test_reduce(name, rng):
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    fn = REDUCES[name]
    np.testing.assert_allclose(
        run_op(name, x, attrs={"axes": [1], "keep_dims": True}),
        fn(x, axis=(1,), keepdims=True),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        run_op(name, x, attrs={"axes": [-1, 0], "keep_dims": False}),
        fn(x, axis=(2, 0), keepdims=False),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        run_op(name, x, attrs={"keep_dims": False}),
        fn(x, axis=(0, 1, 2), keepdims=False),
        rtol=1e-4, atol=1e-5,
    )


def test_argmax_argmin(rng):
    x = rng.standard_normal((3, 5)).astype(np.float32)
    out = run_op("ArgMax", x, attrs={"axis": 1, "keep_dims": True})
    np.testing.assert_array_equal(out, x.argmax(1, keepdims=True))
    assert out.dtype == np.int32
    out = run_op("ArgMin", x, attrs={"axis": 0, "keep_dims": False})
    np.testing.assert_array_equal(out, x.argmin(0))


def test_cumsum(rng):
    x = rng.standard_normal((3, 4)).astype(np.float32)
    np.testing.assert_allclose(run_op("CumSum", x, np.int32(1)), np.cumsum(x, 1), rtol=1e-5)


def test_nonzero():
    x = np.array([[1, 0], [0, 3]], dtype=np.float32)
    out = run_op("NonZero", x)
    np.testing.assert_array_equal(out, [[0, 1], [0, 1]])


def test_topk(rng):
    x = rng.standard_normal((3, 8)).astype(np.float32)
    vals, idx = run_op("TopK", x, np.int32(3), attrs={"axis": -1, "largest": True, "sorted": True})
    ref_idx = np.argsort(-x, axis=-1)[:, :3]
    np.testing.assert_allclose(vals, np.take_along_axis(x, ref_idx, -1), rtol=1e-6)
    vals, idx = run_op("TopK", x, np.int32(2), attrs={"axis": -1, "largest": False, "sorted": True})
    ref_idx = np.argsort(x, axis=-1)[:, :2]
    np.testing.assert_allclose(vals, np.take_along_axis(x, ref_idx, -1), rtol=1e-6)


def test_resize_nearest():
    x = np.array([[[[1.0, 2.0], [3.0, 4.0]]]], dtype=np.float32)
    out = run_op(
        "Resize", x, None, np.array([1, 1, 2, 2], np.float32),
        attrs={"mode": "nearest", "coord_mode": "asymmetric", "nearest_mode": "floor"},
    )
    ref = x.repeat(2, axis=2).repeat(2, axis=3)
    np.testing.assert_array_equal(out, ref)


def test_resize_linear_align_corners():
    x = np.array([[[[0.0, 1.0], [2.0, 3.0]]]], dtype=np.float32)
    out = run_op(
        "Resize", x, None, np.array([1, 1, 1.5, 1.5], np.float32),
        attrs={"mode": "linear", "coord_mode": "align_corners"},
    )
    assert out.shape == (1, 1, 3, 3)
    np.testing.assert_allclose(out[0, 0], [[0, 0.5, 1], [1, 1.5, 2], [2, 2.5, 3]], rtol=1e-5)


def test_resize_linear_half_pixel_vs_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((1, 2, 4, 4)).astype(np.float32)
    out = run_op(
        "Resize", x, None, np.array([1, 1, 2, 2], np.float32),
        attrs={"mode": "linear", "coord_mode": "half_pixel"},
    )
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), scale_factor=2, mode="bilinear", align_corners=False
        ).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_einsum(rng):
    a = rng.standard_normal((2, 3, 4)).astype(np.float32)
    b = rng.standard_normal((2, 4, 5)).astype(np.float32)
    np.testing.assert_allclose(
        run_op("Einsum", a, b, attrs={"equation": "bij,bjk->bik"}),
        np.einsum("bij,bjk->bik", a, b),
        rtol=1e-4, atol=1e-5,
    )
    c = rng.standard_normal((3, 3)).astype(np.float32)
    np.testing.assert_allclose(
        run_op("Einsum", c, attrs={"equation": "ii"}), np.einsum("ii", c), rtol=1e-5
    )


def test_constant_of_shape():
    out = run_op("ConstantOfShape", np.array([2, 3], np.int32), attrs={"value": np.int32(7)})
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, np.full((2, 3), 7))


def test_range():
    np.testing.assert_array_equal(
        run_op("Range", np.float32(1), np.float32(6), np.float32(2)), [1, 3, 5]
    )


def test_random_ops_deterministic_with_seed():
    ctx = OpContext("eager")
    out1 = get_op("RandomUniform").fn(ctx, {"shape": [4, 4], "low": 0.0, "high": 1.0, "seed": 1.0})
    out2 = get_op("RandomUniform").fn(ctx, {"shape": [4, 4], "low": 0.0, "high": 1.0, "seed": 1.0})
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.asarray(out1).min() >= 0 and np.asarray(out1).max() <= 1


def test_random_like(rng):
    import jax
    x = np.zeros((3, 5), np.float32)
    ctx = OpContext("eager", rng=jax.random.PRNGKey(0))
    out = get_op("RandomNormalLike").fn(ctx, {"mean": 1.0, "scale": 0.1}, x)
    assert np.asarray(out).shape == (3, 5)
    assert 0.5 < np.asarray(out).mean() < 1.5


def test_quantize_dequantize_round_trip(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    scale = np.float32(0.05)
    zp = np.uint8(128)
    q = run_op("QuantizeLinear", x, scale, zp)
    assert q.dtype == np.uint8
    deq = run_op("DequantizeLinear", q, scale, zp)
    np.testing.assert_allclose(deq, x, atol=0.05 / 2 + 1e-6)


def test_dynamic_quantize_linear(rng):
    x = (rng.standard_normal((16,)) * 3).astype(np.float32)
    q, scale, zp = run_op("DynamicQuantizeLinear", x)
    assert q.dtype == np.uint8 and zp.dtype == np.uint8
    deq = (q.astype(np.float32) - zp.astype(np.float32)) * scale
    np.testing.assert_allclose(deq, x, atol=float(scale) * 0.51)


def test_qlinear_matmul(rng):
    a = rng.standard_normal((4, 6)).astype(np.float32)
    b = rng.standard_normal((6, 3)).astype(np.float32)
    a_scale, a_zp = np.float32(0.03), np.uint8(120)
    b_scale, b_zp = np.float32(0.03), np.uint8(130)
    qa = np.clip(np.round(a / a_scale) + a_zp, 0, 255).astype(np.uint8)
    qb = np.clip(np.round(b / b_scale) + b_zp, 0, 255).astype(np.uint8)
    y_scale, y_zp = np.float32(0.05), np.uint8(128)
    out = run_op("QLinearMatMul", qa, a_scale, a_zp, qb, b_scale, b_zp, y_scale, y_zp)
    assert out.dtype == np.uint8
    deq_out = (out.astype(np.float32) - y_zp) * y_scale
    np.testing.assert_allclose(deq_out, a @ b, atol=0.25)


def test_nms():
    boxes = np.array(
        [[[0, 0, 1, 1], [0, 0.05, 1, 1.05], [0, 2, 1, 3]]], dtype=np.float32
    )
    scores = np.array([[[0.9, 0.8, 0.7]]], dtype=np.float32)
    out = run_op(
        "NonMaxSuppression", boxes, scores, np.int32(10), np.float32(0.5), np.float32(0.0)
    )
    # box 1 suppressed by box 0 (high IoU); boxes 0 and 2 kept
    np.testing.assert_array_equal(out, [[0, 0, 0], [0, 0, 2]])


def test_lstm_vs_torch(rng):
    torch = pytest.importorskip("torch")
    seq, batch, input_size, hidden = 5, 2, 3, 4
    x = rng.standard_normal((seq, batch, input_size)).astype(np.float32)

    m = torch.nn.LSTM(input_size, hidden)
    with torch.no_grad():
        ref_y, (ref_h, ref_c) = m(torch.from_numpy(x))
    # torch gate order: i,f,g,o → ONNX: i,o,f,c
    w_ih = m.weight_ih_l0.detach().numpy()
    w_hh = m.weight_hh_l0.detach().numpy()
    b_ih = m.bias_ih_l0.detach().numpy()
    b_hh = m.bias_hh_l0.detach().numpy()

    def reorder(w):
        i, f, g, o = np.split(w, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    W = reorder(w_ih)[None]
    R = reorder(w_hh)[None]
    B = np.concatenate([reorder(b_ih), reorder(b_hh)])[None]
    y, h, c = run_op("LSTM", x, W, R, B, attrs={"hidden_size": hidden, "direction": "forward"})
    np.testing.assert_allclose(y[:, 0], ref_y.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(h[0], ref_h[0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(c[0], ref_c[0].numpy(), rtol=1e-4, atol=1e-5)


def test_gru_vs_torch(rng):
    torch = pytest.importorskip("torch")
    seq, batch, input_size, hidden = 4, 2, 3, 5
    x = rng.standard_normal((seq, batch, input_size)).astype(np.float32)
    m = torch.nn.GRU(input_size, hidden)
    with torch.no_grad():
        ref_y, ref_h = m(torch.from_numpy(x))
    # torch gate order: r,z,n → ONNX: z,r,h. torch GRU computes
    # n = tanh(W_n x + b_n + r*(W_hn h + b_hn)) == linear_before_reset=1
    w_ih = m.weight_ih_l0.detach().numpy()
    w_hh = m.weight_hh_l0.detach().numpy()
    b_ih = m.bias_ih_l0.detach().numpy()
    b_hh = m.bias_hh_l0.detach().numpy()

    def reorder(w):
        r, z, n = np.split(w, 3, axis=0)
        return np.concatenate([z, r, n], axis=0)

    W = reorder(w_ih)[None]
    R = reorder(w_hh)[None]
    B = np.concatenate([reorder(b_ih), reorder(b_hh)])[None]
    y, h = run_op(
        "GRU", x, W, R, B,
        attrs={"hidden_size": hidden, "direction": "forward", "linear_before_reset": True},
    )
    np.testing.assert_allclose(y[:, 0], ref_y.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(h[0], ref_h[0].numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_bidirectional_shapes(rng):
    seq, batch, input_size, hidden = 3, 2, 4, 5
    x = rng.standard_normal((seq, batch, input_size)).astype(np.float32)
    W = rng.standard_normal((2, 4 * hidden, input_size)).astype(np.float32) * 0.1
    R = rng.standard_normal((2, 4 * hidden, hidden)).astype(np.float32) * 0.1
    y, h, c = run_op("LSTM", x, W, R, attrs={"hidden_size": hidden, "direction": "bidirectional"})
    assert y.shape == (seq, 2, batch, hidden)
    assert h.shape == (2, batch, hidden)
    # reverse direction at t=0 equals forward-over-reversed-sequence at end
    y_rev_only, h_rev, _ = run_op(
        "LSTM", x[::-1].copy(), W[1:], R[1:], attrs={"hidden_size": hidden, "direction": "forward"}
    )
    np.testing.assert_allclose(y[0, 1], y_rev_only[-1, 0], rtol=1e-5, atol=1e-6)
