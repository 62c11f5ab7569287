"""LSTM / GRU (reference: src/ops/rnn.rs:539 lstm, :311 gru).

TPU-first structure: the input projection X·W^T for the WHOLE sequence is one
big MXU matmul hoisted out of the time loop; only the recurrent H·R^T stays
inside a lax.scan (the reference instead runs per-step per-gate GEMMs,
rnn.rs:363-530). Gate orders follow ONNX: LSTM [i,o,f,c], GRU [z,r,h].
Supports Forward/Reverse/Bidirectional (reference: Direction, rnn.rs:17).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rten_tpu.ops.registry import OpError, register


def _directions(attrs) -> list[bool]:
    d = attrs.get("direction", "forward")
    if d == "forward":
        return [False]
    if d == "reverse":
        return [True]
    if d == "bidirectional":
        return [False, True]
    raise OpError(f"unknown RNN direction {d!r}")


@register("LSTM")
def lstm(ctx, attrs, x, w, r, b=None, seq_lens=None, initial_h=None, initial_c=None):
    if seq_lens is not None:
        raise OpError("LSTM sequence_lens input is not supported")
    x = jnp.asarray(x)  # [seq, batch, input]
    w = jnp.asarray(w)  # [dirs, 4H, input]
    r = jnp.asarray(r)  # [dirs, 4H, H]
    hidden = int(attrs.get("hidden_size") or r.shape[-1])
    seq, batch, _ = x.shape

    ys, hs, cs = [], [], []
    for di, reverse in enumerate(_directions(attrs)):
        wd, rd = w[di], r[di]
        wb = rb = 0.0
        if b is not None:
            bd = jnp.asarray(b)[di]
            wb, rb = bd[: 4 * hidden], bd[4 * hidden :]
        h0 = (
            jnp.asarray(initial_h)[di]
            if initial_h is not None
            else jnp.zeros((batch, hidden), x.dtype)
        )
        c0 = (
            jnp.asarray(initial_c)[di]
            if initial_c is not None
            else jnp.zeros((batch, hidden), x.dtype)
        )
        xs = jnp.flip(x, axis=0) if reverse else x
        # Hoist the input projection out of the scan: one [seq*batch, input]
        # × [input, 4H] MXU matmul.
        gates_x = jnp.einsum("sbi,gi->sbg", xs, wd) + wb

        def step(carry, gx, rd=rd, rb=rb):
            h, c = carry
            g = gx + h @ rd.T + rb
            i, o, f, c_hat = jnp.split(g, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            o = jax.nn.sigmoid(o)
            f = jax.nn.sigmoid(f)
            c_new = f * c + i * jnp.tanh(c_hat)
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_T, c_T), y = jax.lax.scan(step, (h0, c0), gates_x)
        if reverse:
            y = jnp.flip(y, axis=0)
        ys.append(y)
        hs.append(h_T)
        cs.append(c_T)

    y_out = jnp.stack(ys, axis=1)  # [seq, dirs, batch, H]
    return y_out, jnp.stack(hs, axis=0), jnp.stack(cs, axis=0)


@register("GRU")
def gru(ctx, attrs, x, w, r, b=None, seq_lens=None, initial_h=None):
    if seq_lens is not None:
        raise OpError("GRU sequence_lens input is not supported")
    x = jnp.asarray(x)
    w = jnp.asarray(w)  # [dirs, 3H, input] gates z,r,h
    r = jnp.asarray(r)
    hidden = int(attrs.get("hidden_size") or r.shape[-1])
    linear_before_reset = bool(attrs.get("linear_before_reset", False))
    seq, batch, _ = x.shape

    ys, hs = [], []
    for di, reverse in enumerate(_directions(attrs)):
        wd, rd = w[di], r[di]
        wb = jnp.zeros((3 * hidden,), x.dtype)
        rb = jnp.zeros((3 * hidden,), x.dtype)
        if b is not None:
            bd = jnp.asarray(b)[di]
            wb, rb = bd[: 3 * hidden], bd[3 * hidden :]
        h0 = (
            jnp.asarray(initial_h)[di]
            if initial_h is not None
            else jnp.zeros((batch, hidden), x.dtype)
        )
        xs = jnp.flip(x, axis=0) if reverse else x
        gates_x = jnp.einsum("sbi,gi->sbg", xs, wd) + wb

        rz, rr, rh = rd[:hidden], rd[hidden : 2 * hidden], rd[2 * hidden :]
        rbz, rbr, rbh = rb[:hidden], rb[hidden : 2 * hidden], rb[2 * hidden :]

        def step(h, gx, rz=rz, rr=rr, rh=rh, rbz=rbz, rbr=rbr, rbh=rbh):
            gxz, gxr, gxh = jnp.split(gx, 3, axis=-1)
            z = jax.nn.sigmoid(gxz + h @ rz.T + rbz)
            rt = jax.nn.sigmoid(gxr + h @ rr.T + rbr)
            if linear_before_reset:
                h_hat = jnp.tanh(gxh + rt * (h @ rh.T + rbh))
            else:
                h_hat = jnp.tanh(gxh + (rt * h) @ rh.T + rbh)
            h_new = (1.0 - z) * h_hat + z * h
            return h_new, h_new

        h_T, y = jax.lax.scan(step, h0, gates_x)
        if reverse:
            y = jnp.flip(y, axis=0)
        ys.append(y)
        hs.append(h_T)

    return jnp.stack(ys, axis=1), jnp.stack(hs, axis=0)
