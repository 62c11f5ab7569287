"""ResNet tests (BASELINE config 1; no torchvision in the image, so block
semantics are cross-checked against hand-built torch conv/bn layers)."""

import jax
import numpy as np
import pytest

from rten_tpu.models import resnet

torch = pytest.importorskip("torch")

TINY = resnet.ResNetConfig(
    block="bottleneck", stage_sizes=(1, 1), num_classes=10, width=8, dtype=np.float32
)


def test_forward_shapes(rng):
    params = resnet.init_params(jax.random.PRNGKey(0), TINY)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    logits = resnet.forward(params, TINY, x)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_basic_block_config(rng):
    cfg = resnet.ResNetConfig(
        block="basic", stage_sizes=(1, 1), num_classes=5, width=8, dtype=np.float32
    )
    params = resnet.init_params(jax.random.PRNGKey(1), cfg)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    assert resnet.forward(params, cfg, x).shape == (1, 5)


def test_resnet50_param_count():
    params = resnet.init_params(jax.random.PRNGKey(0), resnet.RESNET50)
    n = sum(int(np.asarray(p).size) for p in jax.tree.leaves(params))
    # torchvision resnet50 has 25.56M params; ours folds BN (scale+shift vs
    # weight+bias+mean+var) so slightly fewer.
    assert 25_000_000 < n < 26_000_000


def test_bn_folding_matches_torch(rng):
    """Folded scale/shift must reproduce torch BatchNorm2d.eval()."""
    bn = torch.nn.BatchNorm2d(6).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.standard_normal(6).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.standard_normal(6).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(rng.standard_normal(6).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 2.0, 6).astype(np.float32)))
    state = {f"bn.{k}": v.numpy() for k, v in bn.state_dict().items()}

    gamma = state["bn.weight"]
    beta = state["bn.bias"]
    mean = state["bn.running_mean"]
    var = state["bn.running_var"]
    scale = gamma / np.sqrt(var + 1e-5)
    shift = beta - mean * scale

    x = rng.standard_normal((2, 6, 4, 4)).astype(np.float32)
    ours = x * scale[None, :, None, None] + shift[None, :, None, None]
    with torch.no_grad():
        ref = bn(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_torch_state_dict_import_block_parity(rng):
    """One conv→bn→relu stem through our loader vs torch, end to end."""
    conv = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    bn = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(rng.standard_normal(8).astype(np.float32) * 0.1))
        bn.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, 8).astype(np.float32)))

    state = {
        "conv1.weight": conv.weight.detach().numpy(),
        **{f"bn1.{k}": v.numpy() for k, v in bn.state_dict().items()},
        # minimal single-stage model
        "layer1.0.conv1.weight": rng.standard_normal((8, 8, 3, 3)).astype(np.float32) * 0.1,
        **{f"layer1.0.bn1.{k}": v.numpy() for k, v in torch.nn.BatchNorm2d(8).state_dict().items()},
        "layer1.0.conv2.weight": rng.standard_normal((8, 8, 3, 3)).astype(np.float32) * 0.1,
        **{f"layer1.0.bn2.{k}": v.numpy() for k, v in torch.nn.BatchNorm2d(8).state_dict().items()},
        "fc.weight": rng.standard_normal((10, 8)).astype(np.float32),
        "fc.bias": np.zeros(10, np.float32),
    }
    state = {k: v for k, v in state.items() if "num_batches" not in k}
    cfg = resnet.ResNetConfig(block="basic", stage_sizes=(1,), num_classes=10, width=8, dtype=np.float32)
    params = resnet.load_torchvision_state_dict(state, cfg)

    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    logits = resnet.forward(params, cfg, x)

    # torch reference of the same computation
    with torch.no_grad():
        t = torch.relu(bn(conv(torch.from_numpy(x))))
        t = torch.nn.functional.max_pool2d(t, 3, 2, padding=1)
        b1 = torch.nn.functional.conv2d(
            t, torch.from_numpy(state["layer1.0.conv1.weight"]), padding=1
        )
        bn1 = torch.nn.BatchNorm2d(8).eval()
        b1 = torch.relu(bn1(b1))
        b2 = torch.nn.functional.conv2d(
            b1, torch.from_numpy(state["layer1.0.conv2.weight"]), padding=1
        )
        bn2 = torch.nn.BatchNorm2d(8).eval()
        out = torch.relu(t + bn2(b2))
        pooled = out.mean(dim=(2, 3))
        ref = pooled @ torch.from_numpy(state["fc.weight"]).T
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_fp32_bf16_agree(rng):
    import jax.numpy as jnp
    import dataclasses

    params32 = resnet.init_params(jax.random.PRNGKey(0), TINY)
    cfg16 = dataclasses.replace(TINY, dtype=jnp.bfloat16)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    l32 = np.asarray(resnet.forward(params32, TINY, x))
    l16 = np.asarray(resnet.forward(params32, cfg16, x))
    # bf16 tolerance — same argmax, coarse logit agreement
    assert l32.argmax() == l16.argmax()
    np.testing.assert_allclose(l32, l16, rtol=0.1, atol=0.25)
