"""DETR-style end-to-end detection (query-based, no NMS).

TPU-native counterpart of rten-examples/src/detr.rs: image → CNN backbone →
transformer encoder over flattened feature tokens → learned object queries
cross-attending (here: a light dot-product decoder head) → per-query class
softmax + cxcywh box regression; "no object" class filtered out, boxes
scaled back to pixels — exactly the reference's post-processing.

    python examples/detr.py --demo
    python examples/detr.py --image street.png --model detr.rten

``--model`` takes an exported .rten DETR (the reference loads converted
facebook/detr exports, detr.rs): input [1, 3, H, W]; outputs per-query
class logits [1, Q, C+1] (last class = "no object") and boxes [1, Q, 4]
cxcywh normalized to [0, 1] — exactly the upstream output contract.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--image", help="input image file (PNG/BMP/…)")
    p.add_argument(
        "--model", help="DETR as .rten ([1,3,H,W] → logits [1,Q,C+1], boxes [1,Q,4])"
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    size = 64
    if args.image:
        chw = common.load_image_arg(args.image, size)
        print(f"image: {args.image} -> {chw.shape}")
    else:
        chw = common.synthetic_image(size, size, args.seed)

    if args.model:
        from rten_tpu import Model

        m = Model.load_file(args.model)
        logits, boxes = m.run([chw[None]])[:2]
        cls_p = jax.nn.softmax(jnp.asarray(np.asarray(logits)), axis=-1)[0]
        boxes = jnp.asarray(np.asarray(boxes))[0]
        n_queries = cls_p.shape[0]
        print(f"loaded {args.model}: {n_queries} queries through Model.run")
        cls_np, box_np = np.asarray(cls_p), np.asarray(boxes)
    else:
        n_queries = 8
        cls_np, box_np = _demo_queries(chw, args.seed, n_queries)
    kept = 0
    for qi in range(n_queries):
        cls = int(cls_np[qi, :-1].argmax())
        score = float(cls_np[qi, cls])
        if score < args.threshold or cls_np[qi, -1] > score:
            continue
        cx, cy, w, h = box_np[qi] * size
        print(
            f"query {qi}: class {cls} score {score:.3f} "
            f"box ({cx - w / 2:.0f},{cy - h / 2:.0f})-({cx + w / 2:.0f},{cy + h / 2:.0f})"
        )
        kept += 1
    print(f"{kept}/{n_queries} queries above threshold {args.threshold}")
    return 0


def _demo_queries(chw, seed, n_queries):
    """Seeded backbone + encoder + query head (no checkpoint)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.models import resnet, vit

    n_classes = 4
    cfg = resnet.ResNetConfig(block="basic", stage_sizes=(1, 1), width=8)
    params = resnet.init_params(jax.random.PRNGKey(seed), cfg)
    feats = resnet.forward(params, cfg, jnp.asarray(chw[None]), features=True)
    b, c, gh, gw = feats.shape
    tokens = feats.reshape(b, c, gh * gw).transpose(0, 2, 1)  # [B, N, C]

    # Transformer encoder over feature tokens (ViT blocks, no cls token).
    enc_cfg = vit.ViTConfig(
        image_size=gh * 8, patch_size=8, n_layers=2, n_heads=2,
        d_model=c, d_ff=4 * c, use_cls_token=False,
    )
    enc_params = vit.init_params(jax.random.PRNGKey(seed + 1), enc_cfg)
    x = tokens + enc_params["pos_emb"][None, : tokens.shape[1]]
    for layer in enc_params["layers"]:
        x = _block(x, layer, enc_cfg)

    # Object queries attend to encoder memory (single cross-attention read).
    rng = jax.random.PRNGKey(seed + 2)
    queries = jax.random.normal(rng, (n_queries, c)) * 0.5
    attn = jax.nn.softmax(queries @ x[0].T / np.sqrt(c), axis=-1)
    q_feats = attn @ x[0]  # [n_queries, C]

    w_cls = jax.random.normal(jax.random.PRNGKey(3), (c, n_classes + 1)) * 0.5
    w_box = jax.random.normal(jax.random.PRNGKey(4), (c, 4)) * 0.5
    cls_p = jax.nn.softmax(q_feats @ w_cls, axis=-1)  # last col = "no object"
    boxes = jax.nn.sigmoid(q_feats @ w_box)  # cxcywh in [0,1]
    return np.asarray(cls_p), np.asarray(boxes)


def _block(x, layer, cfg):
    import jax
    import jax.numpy as jnp

    from rten_tpu.models.vit import _ln_f

    b, t, d = x.shape
    h, hd = cfg.n_heads, cfg.d_model // cfg.n_heads
    xn = _ln_f(x, layer["ln1"], cfg.layer_norm_eps)
    qkv = xn @ layer["wqkv"] + layer["bqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    s = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) / (hd**0.5), -1)
    attn = jnp.einsum("bhqk,bhkd->bhqd", s, v).transpose(0, 2, 1, 3).reshape(b, t, d)
    x = x + attn @ layer["wo"] + layer["bo"]
    xn = _ln_f(x, layer["ln2"], cfg.layer_norm_eps)
    up = jax.nn.gelu(xn @ layer["w_up"] + layer["b_up"])
    return x + up @ layer["w_down"] + layer["b_down"]


if __name__ == "__main__":
    common.run_main(main)
