"""Monocular depth estimation (Depth-Anything-style ViT + dense head).

TPU-native counterpart of rten-examples/src/depth_anything.rs: image → ViT
encoder → patch feature map → upsampling head → relative depth map,
normalized to [0, 1] and written as a grayscale image (the reference's
post-processing does exactly this normalize + save).

    python examples/depth_anything.py --demo [--out depth.png]
    python examples/depth_anything.py --image room.png --model depth.rten

``--model`` takes an exported .rten monodepth model (the reference loads
converted Depth-Anything exports, depth_anything.rs): input [1, 3, H, W],
output a depth grid [1, 1, h, w] (or [1, h, w]) — upsampled and normalized
by the example.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--out", help="write normalized depth to this PNG")
    p.add_argument("--image", help="input image file (PNG/BMP/…)")
    p.add_argument(
        "--model", help="depth model as .rten ([1,3,H,W] → [1,1,h,w] or [1,h,w])"
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.image.io import write_image
    from rten_tpu.models import vit

    size = 32
    if args.image:
        chw = common.load_image_arg(args.image, size)
        print(f"image: {args.image} -> {chw.shape}")
    else:
        chw = common.synthetic_image(size, size, args.seed)

    if args.model:
        from rten_tpu import Model

        m = Model.load_file(args.model)
        out = np.asarray(m.run([chw[None]])[0], np.float32)
        coarse = jnp.asarray(out.reshape(1, out.shape[-2], out.shape[-1]))
        print(f"loaded {args.model}: depth grid {coarse.shape[1:]} through Model.run")
    else:
        cfg = vit.ViTConfig(
            image_size=size, patch_size=8, n_layers=2, n_heads=2,
            d_model=64, d_ff=128, use_cls_token=True,
        )
        params = vit.init_params(jax.random.PRNGKey(args.seed), cfg)
        hidden = vit.encode(params, cfg, jnp.asarray(chw[None]))
        fm = vit.feature_map(hidden, cfg)  # [1, D, g, g]

        w_depth = jax.random.normal(jax.random.PRNGKey(args.seed + 1), (fm.shape[1],)) * 0.3
        coarse = jnp.einsum("bdhw,d->bhw", fm, w_depth)
    depth = jax.image.resize(coarse, (1, size, size), "bilinear")[0]
    d = np.asarray(depth)
    d = (d - d.min()) / max(d.max() - d.min(), 1e-9)

    print(f"depth map {d.shape}: min 0.0 max 1.0 mean {d.mean():.3f}")
    hist, _ = np.histogram(d, bins=5, range=(0, 1))
    print("histogram (5 bins):", hist.tolist())
    if args.out:
        write_image(args.out, np.repeat(d[None], 3, 0).astype(np.float32))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    common.run_main(main)
