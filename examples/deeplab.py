"""DeepLab-style semantic segmentation.

TPU-native counterpart of rten-examples/src/deeplab.rs: image → backbone
features → per-pixel class logits → argmax → PASCAL-style color mask
(deeplab.rs paints per-class colors) upsampled back to the input size.

    python examples/deeplab.py --demo [--out mask.png]
    python examples/deeplab.py --image scene.png --model deeplab.rten

``--model`` takes an exported .rten segmenter (the reference loads
converted torchvision deeplabv3 exports, deeplab.rs): input [1, 3, H, W],
output per-pixel class logits [1, K, h, w] (any grid size — the example
bilinearly upsamples to the input resolution, like the in-graph Resize the
reference's export carries).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common

PALETTE = [
    (0, 0, 0), (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
    (245, 130, 48), (145, 30, 180), (70, 240, 240),
]


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--out", help="write the color mask to this PNG")
    p.add_argument("--image", help="input image file (PNG/BMP/…)")
    p.add_argument("--model", help="segmenter as .rten ([1,3,H,W] → [1,K,h,w])")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.image.io import write_image
    from rten_tpu.models import resnet

    size = 64
    if args.image:
        chw = common.load_image_arg(args.image, size)
        print(f"image: {args.image} -> {chw.shape}")
    else:
        chw = common.synthetic_image(size, size, args.seed)

    if args.model:
        from rten_tpu import Model

        m = Model.load_file(args.model)
        logits = jnp.asarray(np.asarray(m.run([chw[None]])[0], np.float32))
        n_classes = logits.shape[1]
        print(f"loaded {args.model}: {n_classes} classes through Model.run")
    else:
        n_classes = 8
        cfg = resnet.ResNetConfig(block="basic", stage_sizes=(1, 1), width=8)
        params = resnet.init_params(jax.random.PRNGKey(args.seed), cfg)
        feats = resnet.forward(params, cfg, jnp.asarray(chw[None]), features=True)

        # 1x1 conv segmentation head (the real head lives inside --model
        # graphs; the upsample below matches their in-graph Resize).
        c = feats.shape[1]
        w_head = jax.random.normal(jax.random.PRNGKey(args.seed + 1), (c, n_classes)) * 0.5
        logits = jnp.einsum("bchw,ck->bkhw", feats, w_head)
    logits = jax.image.resize(logits, (1, n_classes, size, size), "bilinear")
    mask = np.asarray(jnp.argmax(logits, axis=1))[0]  # [H, W]

    counts = np.bincount(mask.ravel(), minlength=n_classes)
    for cls, cnt in enumerate(counts):
        if cnt:
            print(f"class {cls}: {cnt} px ({100.0 * cnt / mask.size:.1f}%)")

    if args.out:
        color = np.zeros((3, size, size), np.float32)
        for cls in range(n_classes):
            r, g, b = PALETTE[cls % len(PALETTE)]
            m = mask == cls
            color[0][m], color[1][m], color[2][m] = r / 255.0, g / 255.0, b / 255.0
        write_image(args.out, color)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    common.run_main(main)
