"""Promptable segmentation (Segment-Anything-style).

TPU-native counterpart of rten-examples/src/segment_anything.rs: image →
ViT image encoder (run once) → point prompt embedding → mask head → binary
mask → contour extraction + polygon simplification with
rten_tpu.image.contours/poly (≙ rten-imageproc contours.rs/poly_algos.rs,
the reference's mask post-processing toolkit).

    python examples/segment_anything.py --demo --point 40,20
    python examples/segment_anything.py --image cat.png --model sam_enc.rten

``--model`` takes an exported .rten SAM-class image encoder (the reference
loads converted SAM exports, segment_anything.rs): input [1, 3, H, W],
output patch embeddings [1, D, g, g]; the prompt-similarity mask head and
contour post-processing run on the embeddings, as in the demo.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--point", default="40,20", help="prompt point as x,y")
    p.add_argument("--image", help="input image file (PNG/BMP/…)")
    p.add_argument(
        "--model", help="SAM image encoder as .rten ([1,3,H,W] → [1,D,g,g])"
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.image.contours import find_contours
    from rten_tpu.image.poly import simplify_polygon
    from rten_tpu.models import vit

    size = 32
    px, py = (int(v) for v in args.point.split(","))
    if args.image:
        chw = common.load_image_arg(args.image, size)
        print(f"image: {args.image} -> {chw.shape}")
    else:
        chw = common.synthetic_image(size, size, args.seed)

    if args.model:
        from rten_tpu import Model

        m = Model.load_file(args.model)
        fm = jnp.asarray(np.asarray(m.run([chw[None]])[0], np.float32))
        print(
            f"loaded {args.model}: embeddings {tuple(fm.shape)} through Model.run"
        )
    else:
        cfg = vit.ViTConfig(
            image_size=size, patch_size=4, n_layers=2, n_heads=2,
            d_model=64, d_ff=128, use_cls_token=False,
        )
        params = vit.init_params(jax.random.PRNGKey(args.seed), cfg)
        hidden = vit.encode(params, cfg, jnp.asarray(chw[None]))
        fm = vit.feature_map(hidden, cfg)  # [1, D, g, g]
    g = fm.shape[-1]

    # Point prompt → the prompt token is the image embedding at that location;
    # mask logits = similarity of every patch embedding to the prompt token
    # (the SAM decoder reduced to its dot-product core).
    prompt = fm[0, :, py * g // size, px * g // size]  # [D]
    sim = jnp.einsum("dhw,d->hw", fm[0], prompt) / jnp.sqrt(fm.shape[1] * 1.0)
    mask_logits = jax.image.resize(sim, (size, size), "bilinear")
    mask = np.asarray(mask_logits > jnp.percentile(mask_logits, 75)).astype(np.uint8)

    print(f"mask covers {mask.sum()} px ({100.0 * mask.mean():.1f}%)")
    contours = find_contours(mask)
    print(f"{len(contours)} contour(s)")
    for i, contour in enumerate(contours[:3]):
        poly = simplify_polygon(contour, epsilon=1.5)
        pts = getattr(poly, "points", poly)
        print(f"  contour {i}: {len(pts)} vertices after simplification")
    return 0


if __name__ == "__main__":
    common.run_main(main)
