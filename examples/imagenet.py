"""ImageNet classification with a native ResNet.

TPU-native counterpart of rten-examples/src/imagenet.rs (preprocessing at
:56-100): image → CHW f32 → ImageNet mean/std normalization → ResNet →
softmax top-5.

    python examples/imagenet.py --demo [--image path.png]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples import common


def main(argv=None):
    argv = common.force_cpu_if_requested(argv or sys.argv[1:])
    p = common.make_parser(__doc__)
    p.add_argument("--image", help="image file (PNG/BMP); synthetic if omitted")
    p.add_argument(
        "--model",
        help="real weights: .npz of a torchvision resnet18/resnet50 state "
        "dict (BN folded at load, models/resnet.load_torchvision_state_dict);"
        " --demo uses seeded weights",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.image.io import IMAGENET_MEAN, IMAGENET_STD, normalize_image, read_image
    from rten_tpu.models import resnet

    if args.image:
        chw = read_image(args.image)
    else:
        chw = common.synthetic_image(64, 64, args.seed)
    chw = normalize_image(chw, IMAGENET_MEAN, IMAGENET_STD)

    if args.model:
        state = common.load_state_npz(args.model)
        # resnet50 blocks have conv3 (bottleneck); resnet18 does not.
        cfg = (
            resnet.RESNET50
            if "layer1.0.conv3.weight" in state
            else resnet.RESNET18
        )
        n_cls = state["fc.weight"].shape[0]
        if n_cls != cfg.num_classes:
            import dataclasses

            cfg = dataclasses.replace(cfg, num_classes=n_cls)
        print(f"loaded {args.model}: {cfg.block} blocks, {n_cls} classes")
        params = resnet.load_torchvision_state_dict(state, cfg)
    else:
        cfg = resnet.ResNetConfig(
            block="basic", stage_sizes=(1, 1, 1, 1), width=16, num_classes=10
        )
        params = resnet.init_params(jax.random.PRNGKey(args.seed), cfg)
    logits = resnet.forward(params, cfg, jnp.asarray(chw[None]))
    probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), -1))[0]
    top = np.argsort(probs)[::-1][:5]
    for rank, cls in enumerate(top, 1):
        print(f"top-{rank}: class {cls}  p={probs[cls]:.4f}")
    return 0


if __name__ == "__main__":
    common.run_main(main)
