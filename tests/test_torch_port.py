"""Torch->flax backbone weight-port tests with a synthetic state_dict."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from future_od_tpu.models.resnet import CDetrBackbone
from future_od_tpu.utils.torch_port import convert_torchvision_resnet


def fake_torchvision_state_dict(rng):
    """A torchvision-resnet50-shaped dict of numpy arrays (OIHW convs)."""
    sd = {}

    def conv(name, out_c, in_c, k):
        # fan-in scaling keeps the 50-layer product numerically sane
        scale = 1.0 / np.sqrt(in_c * k * k)
        sd[name] = (rng.normal(size=(out_c, in_c, k, k)) * scale).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = (rng.normal(size=(c,)) * 0.1).astype(np.float32)
        sd[f"{prefix}.running_mean"] = (rng.normal(size=(c,)) * 0.1).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.5

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    in_c = 64
    planes = 64
    for stage, blocks in {1: 3, 2: 4, 3: 6, 4: 3}.items():
        for b in range(blocks):
            p = f"layer{stage}.{b}"
            conv(f"{p}.conv1.weight", planes, in_c if b == 0 else planes * 4, 1)
            bn(f"{p}.bn1", planes)
            conv(f"{p}.conv2.weight", planes, planes, 3)
            bn(f"{p}.bn2", planes)
            conv(f"{p}.conv3.weight", planes * 4, planes, 1)
            bn(f"{p}.bn3", planes * 4)
            if b == 0:
                conv(f"{p}.downsample.0.weight", planes * 4, in_c, 1)
                bn(f"{p}.downsample.1", planes * 4)
        in_c = planes * 4
        planes *= 2
    return sd


class TestTorchPort:
    def test_shapes_and_values(self, rng):
        m = CDetrBackbone(hidden_dim=32)
        x = jnp.zeros((1, 64, 96, 3))
        variables = m.init(jax.random.key(0), x)
        sd = fake_torchvision_state_dict(rng)
        new_params, new_frozen = convert_torchvision_resnet(
            sd, variables["params"]["body"], variables["frozen"]["body"]
        )
        # stem kernel transposed OIHW -> HWIO
        np.testing.assert_allclose(
            new_params["conv1"]["kernel"],
            sd["conv1.weight"].transpose(2, 3, 1, 0),
        )
        np.testing.assert_allclose(
            new_frozen["layer3_block2"]["bn2"]["running_var"],
            sd["layer3.2.bn2.running_var"],
        )
        np.testing.assert_allclose(
            new_params["layer2_block0"]["downsample_conv"]["kernel"],
            sd["layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0),
        )
        # the model still runs with the ported weights
        out = m.apply(
            {
                "params": {**variables["params"], "body": new_params},
                "frozen": {"body": new_frozen},
            },
            jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32)),
        )
        assert out.shape == (1, 2, 3, 32) and bool(jnp.isfinite(out).all())

    def test_frozen_bn_matches_torch_semantics(self, rng):
        # y = (x - mean) * w / sqrt(var + 1e-5) + b on a single channel
        from future_od_tpu.models.resnet import FrozenBatchNorm

        m = FrozenBatchNorm(4)
        x = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
        variables = m.init(jax.random.key(0), x)
        frozen = {
            "weight": jnp.asarray([2.0, 1.0, 1.0, 1.0]),
            "bias": jnp.asarray([0.5, 0.0, 0.0, 0.0]),
            "running_mean": jnp.asarray([1.0, 0.0, 0.0, 0.0]),
            "running_var": jnp.asarray([4.0, 1.0, 1.0, 1.0]),
        }
        out = m.apply({"frozen": frozen}, x)
        expected = (np.asarray(x)[..., 0] - 1.0) * 2.0 / np.sqrt(4.0 + 1e-5) + 0.5
        np.testing.assert_allclose(out[..., 0], expected, rtol=1e-5)
