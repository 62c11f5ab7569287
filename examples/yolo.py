"""YOLO-style object detection: grid head decode + NMS + box drawing.

TPU-native counterpart of rten-examples/src/yolo.rs: image → backbone →
per-cell (box, objectness, class) predictions → confidence filter →
NonMaxSuppression (rten_tpu.ops.nms, ≙ src/ops/non_max_suppression.rs) →
boxes drawn with rten_tpu.image.drawing (≙ rten-imageproc drawing.rs).

    python examples/yolo.py --demo [--out boxes.png]
    python examples/yolo.py --image street.png --model yolo.rten

``--model`` takes an exported .rten detector (the reference loads converted
ultralytics exports, yolo.rs): input [1, 3, H, W], output [1, N, 5+C] raw
per-candidate predictions — absolute-pixel (cx, cy, w, h), objectness
logit, class logits. The example applies sigmoid/softmax, NMS, and drawing.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--out", help="write detections over the image to this PNG")
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--image", help="input image file (PNG/BMP/…)")
    p.add_argument("--model", help="detector as .rten ([1,3,H,W] → [1,N,5+C])")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.image.drawing import Rect, stroke_rect
    from rten_tpu.image.io import write_image
    from rten_tpu.ops.nms import non_max_suppression
    from rten_tpu.ops.registry import OpContext

    size = 64
    if args.image:
        chw = common.load_image_arg(args.image, size)
        print(f"image: {args.image} -> {chw.shape}")
    else:
        chw = common.synthetic_image(size, size, args.seed)

    if args.model:
        from rten_tpu import Model

        m = Model.load_file(args.model)
        preds = np.asarray(m.run([chw[None]])[0], np.float32)  # [1, N, 5+C]
        print(f"loaded {args.model}: {preds.shape[1]} candidates through Model.run")
        boxes_cxcywh = jnp.asarray(preds[..., :4])
        obj = jax.nn.sigmoid(jnp.asarray(preds[..., 4:5]))
        cls_p = jax.nn.softmax(jnp.asarray(preds[..., 5:]), axis=-1) * obj
        cxy, wh = boxes_cxcywh[..., :2], boxes_cxcywh[..., 2:4]
        boxes_xyxy = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
    else:
        boxes_xyxy, cls_p = _demo_head(chw, size, args.seed)

    # ONNX NMS layout: boxes [B, N, 4] (y1,x1,y2,x2), scores [B, C, N].
    x1, y1, x2, y2 = jnp.split(boxes_xyxy, 4, axis=-1)
    nms_boxes = jnp.concatenate([y1, x1, y2, x2], axis=-1)
    scores = jnp.transpose(cls_p, (0, 2, 1))
    sel = non_max_suppression(
        OpContext(),
        {"box_order": "corners"},
        np.asarray(nms_boxes),
        np.asarray(scores),
        np.int64(10),
        np.float32(args.iou),
        np.float32(args.conf),
    )
    sel = np.asarray(sel)  # [n, 3] (batch, class, box)
    print(f"{len(sel)} detections (conf>{args.conf}, iou<{args.iou})")
    boxes_np = np.asarray(boxes_xyxy)[0]
    scores_np = np.asarray(cls_p)[0]
    for bi, ci, ni in sel:
        bx = boxes_np[ni]
        print(
            f"  class {ci}  score {scores_np[ni, ci]:.3f}  "
            f"box ({bx[0]:.0f},{bx[1]:.0f})-({bx[2]:.0f},{bx[3]:.0f})"
        )

    if args.out:
        canvas = (chw.copy() * 255).astype(np.uint8)
        for bi, ci, ni in sel:
            x1_, y1_, x2_, y2_ = boxes_np[ni]
            r = Rect(
                int(max(0, y1_)), int(max(0, x1_)),
                int(min(size - 1, y2_)), int(min(size - 1, x2_)),
            )
            for ch in range(3):
                stroke_rect(canvas[ch], r, 255 if ch == ci % 3 else 0)
        write_image(args.out, canvas.astype(np.float32) / 255.0)
        print(f"wrote {args.out}")
    return 0


def _demo_head(chw, size, seed):
    """Seeded tiny backbone + detection head (no checkpoint)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.models import resnet

    cfg = resnet.ResNetConfig(block="basic", stage_sizes=(1, 1), width=8, num_classes=8)
    params = resnet.init_params(jax.random.PRNGKey(seed), cfg)
    feats = resnet.forward(params, cfg, jnp.asarray(chw[None]), features=True)
    b, c, g = feats.shape[0], feats.shape[1], feats.shape[2]

    rng = jax.random.PRNGKey(seed + 1)
    n_classes = 3
    w_head = jax.random.normal(rng, (c, 5 + n_classes), jnp.float32) * 0.5
    head = jnp.einsum("bcgh,co->bgho", feats, w_head).reshape(b, g * g, 5 + n_classes)

    # Decode: cell-relative center + size, sigmoid objectness/class scores.
    cell = size / g
    gy, gx = np.mgrid[0:g, 0:g].astype(np.float32)
    cxy = jax.nn.sigmoid(head[..., 0:2]) + jnp.asarray(
        np.stack([gx.ravel(), gy.ravel()], -1)[None]
    )
    wh = jnp.exp(jnp.clip(head[..., 2:4], -4, 2))
    boxes_xyxy = jnp.concatenate(
        [(cxy - wh / 2) * cell, (cxy + wh / 2) * cell], axis=-1
    )
    obj = jax.nn.sigmoid(head[..., 4:5])
    cls_p = jax.nn.softmax(head[..., 5:], axis=-1) * obj  # [B, N, n_classes]
    return boxes_xyxy, cls_p


if __name__ == "__main__":
    common.run_main(main)
