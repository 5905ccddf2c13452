"""Port torchvision ResNet weights into the NHWC flax backbone.

The reference initializes its backbone from torchvision's pretrained ResNet-50
(paper.py:94-98). This environment has no network egress and no torchvision,
so pretrained init is file-based: given a torch `state_dict` (loaded from a
user-provided file with `torch.load`), `convert_torchvision_resnet` maps it
onto the `CDetrBackbone.body` params + frozen-BN stats.

Conventions: torch conv weights are OIHW -> flax HWIO; BN runningstats map to
the "frozen" collection; `fc.*` (the classifier) is dropped.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_kernel(w) -> np.ndarray:
    return _to_np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def convert_torchvision_resnet(
    state_dict: Mapping[str, Any],
    body_params: Dict[str, Any],
    body_frozen: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, frozen) for the `body` subtree of CDetrBackbone with
    values from a torchvision resnet state_dict. Shapes are validated against
    the existing (randomly initialized) trees."""
    params = {k: dict(v) if isinstance(v, dict) else v for k, v in body_params.items()}
    frozen = {k: dict(v) if isinstance(v, dict) else v for k, v in body_frozen.items()}

    def set_conv(module: str, torch_key: str):
        kernel = _conv_kernel(state_dict[torch_key])
        assert params[module]["kernel"].shape == kernel.shape, (
            module, params[module]["kernel"].shape, kernel.shape,
        )
        params[module] = {**params[module], "kernel": kernel}

    def set_bn(module: str, torch_prefix: str):
        mapping = {
            "weight": "weight",
            "bias": "bias",
            "running_mean": "running_mean",
            "running_var": "running_var",
        }
        new = dict(frozen[module])
        for ours, theirs in mapping.items():
            value = _to_np(state_dict[f"{torch_prefix}.{theirs}"])
            assert new[ours].shape == value.shape, (module, ours)
            new[ours] = value
        frozen[module] = new

    stem_kernel = _conv_kernel(state_dict["conv1.weight"])  # (7,7,3,64)
    if params["conv1"]["kernel"].shape == (4, 4, 12, 64):
        # space-to-depth stem (models/resnet.py): transform exactly
        from future_od_tpu.models.resnet import stem_weights_to_space_to_depth
        import jax.numpy as jnp

        stem_kernel = np.asarray(
            stem_weights_to_space_to_depth(jnp.asarray(stem_kernel))
        )
    assert params["conv1"]["kernel"].shape == stem_kernel.shape
    params["conv1"] = {**params["conv1"], "kernel": stem_kernel}
    set_bn("bn1", "bn1")

    stage_blocks = {1: 3, 2: 4, 3: 6, 4: 3}
    for stage, num_blocks in stage_blocks.items():
        for block in range(num_blocks):
            ours = f"layer{stage}_block{block}"
            theirs = f"layer{stage}.{block}"
            if ours not in params:  # smaller resnet variant
                continue
            # params[ours] is a nested dict: conv1/conv2/conv3/(downsample_conv)
            block_params = dict(params[ours])
            block_frozen = dict(frozen[ours])
            for conv_idx in (1, 2, 3):
                kernel = _conv_kernel(state_dict[f"{theirs}.conv{conv_idx}.weight"])
                sub = dict(block_params[f"conv{conv_idx}"])
                assert sub["kernel"].shape == kernel.shape
                sub["kernel"] = kernel
                block_params[f"conv{conv_idx}"] = sub
                bn = dict(block_frozen[f"bn{conv_idx}"])
                for key in ("weight", "bias", "running_mean", "running_var"):
                    bn[key] = _to_np(state_dict[f"{theirs}.bn{conv_idx}.{key}"])
                block_frozen[f"bn{conv_idx}"] = bn
            if "downsample_conv" in block_params:
                kernel = _conv_kernel(state_dict[f"{theirs}.downsample.0.weight"])
                sub = dict(block_params["downsample_conv"])
                assert sub["kernel"].shape == kernel.shape
                sub["kernel"] = kernel
                block_params["downsample_conv"] = sub
                bn = dict(block_frozen["downsample_bn"])
                for key in ("weight", "bias", "running_mean", "running_var"):
                    bn[key] = _to_np(state_dict[f"{theirs}.downsample.1.{key}"])
                block_frozen["downsample_bn"] = bn
            params[ours] = block_params
            frozen[ours] = block_frozen

    return params, frozen


def load_pretrained_backbone(variables: Dict[str, Any], state_dict_path: str):
    """Load a torch state_dict file into a model's backbone subtree.

    variables: full model variables with params/.../backbone/body and
    frozen/.../backbone/body. Returns updated variables (new dict).
    """
    import torch

    state_dict = torch.load(state_dict_path, map_location="cpu", weights_only=True)

    def find_subtree(tree, name):
        """DFS for the first subtree key == name."""
        if isinstance(tree, dict):
            if name in tree:
                return tree[name]
            for v in tree.values():
                found = find_subtree(v, name)
                if found is not None:
                    return found
        return None

    def replace_subtree(tree, name, new):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k == name:
                    out[k] = new
                else:
                    out[k] = replace_subtree(v, name, new)
            return out
        return tree

    body_params = find_subtree(variables["params"], "body")
    body_frozen = find_subtree(variables["frozen"], "body")
    assert body_params is not None and body_frozen is not None
    new_params, new_frozen = convert_torchvision_resnet(
        state_dict, body_params, body_frozen
    )
    return {
        **variables,
        "params": replace_subtree(variables["params"], "body", new_params),
        "frozen": replace_subtree(variables["frozen"], "body", new_frozen),
    }
