"""Convert a reference `.pth.tar` checkpoint into future_od_tpu variables.

The reference saves `{"net": state_dict, ...}` (trainer.py:286-299) for the
flagship `SpatioTemporalDETR(FuturePredCore(...))` model (runs/_model.py).
This module maps every key of that state_dict onto our param/frozen trees so
published weights can be loaded for AP-parity validation.

Layout conversions:
- torch Linear weight (out, in) -> flax kernel (in, out);
- torch Conv weight OIHW -> flax HWIO;
- torch nn.MultiheadAttention packed in_proj (3D, D) -> split q/k/v kernels;
- BatchNorm running stats -> the "frozen" collection;
- torchvision ResNet body via utils/torch_port.py (incl. the optional
  space-to-depth stem transform).

Usage:
    variables = convert_reference_checkpoint(torch.load(p)["net"], variables)
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from future_od_tpu.utils.torch_port import _to_np, convert_torchvision_resnet


def _linear(sd, prefix):
    out = {"kernel": _to_np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _to_np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd, prefix):
    return {"scale": _to_np(sd[f"{prefix}.weight"]), "bias": _to_np(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix, num_layers):
    return {
        f"layer{i}": _linear(sd, f"{prefix}.layers.{i}") for i in range(num_layers)
    }


def _torch_mha(sd, prefix, dim):
    """nn.MultiheadAttention: packed in_proj + out_proj -> q/k/v/out kernels."""
    w = _to_np(sd[f"{prefix}.in_proj_weight"])  # (3D, D)
    b = _to_np(sd[f"{prefix}.in_proj_bias"])
    return {
        "q_proj": {"kernel": w[:dim].T, "bias": b[:dim]},
        "k_proj": {"kernel": w[dim : 2 * dim].T, "bias": b[dim : 2 * dim]},
        "v_proj": {"kernel": w[2 * dim :].T, "bias": b[2 * dim :]},
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def _feedforward(sd, prefix, idx0=0, idx1=3):
    """torch Sequential(Linear, ReLU, Dropout, Linear[, Dropout]) -> fc1/fc2."""
    return {
        "fc1": _linear(sd, f"{prefix}.{idx0}"),
        "fc2": _linear(sd, f"{prefix}.{idx1}"),
    }


def _slot_attention(sd, prefix, with_query_pos=True, with_query_sine=False):
    """SlotToSlot / SlotToImage attention: caller-side projections + the
    custom MHA's out_proj (transformer.py:51-181)."""
    out = {
        "query_content": _linear(sd, f"{prefix}.query_content"),
        "key_content": _linear(sd, f"{prefix}.key_content"),
        "key_pos": _linear(sd, f"{prefix}.key_pos"),
        "value": _linear(sd, f"{prefix}.value"),
        "out_proj": _linear(sd, f"{prefix}.fun.out_proj"),
    }
    if with_query_pos and f"{prefix}.query_pos.weight" in sd:
        out["query_pos"] = _linear(sd, f"{prefix}.query_pos")
    if with_query_sine:
        out["query_sine"] = _linear(sd, f"{prefix}.query_sine")
    return out


def _egodeep(sd, prefix, with_mlp):
    out = {
        "query_content": _linear(sd, f"{prefix}.query_content"),
        "query_pos": _linear(sd, f"{prefix}.query_pos"),
        "key": _linear(sd, f"{prefix}.key"),
        "value": _linear(sd, f"{prefix}.value"),
        "out_proj": _linear(sd, f"{prefix}.fun.out_proj"),
    }
    if with_mlp:
        out["norm1"] = _layernorm(sd, f"{prefix}.norm1")
        out["norm2"] = _layernorm(sd, f"{prefix}.norm2")
        out["mlp"] = _feedforward(sd, f"{prefix}.mlp")
    return out


def _encoder_attention(sd, prefix, dim):
    """EncoderAttention (transformer.py:401-419)."""
    return {
        "attn": _torch_mha(sd, f"{prefix}.attn", dim),
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "mlp": _feedforward(sd, f"{prefix}.mlp"),
    }


def convert_reference_checkpoint(
    state_dict: Mapping[str, Any],
    variables: Dict[str, Any],
    dim: int = 256,
) -> Dict[str, Any]:
    """Map the flagship reference state_dict onto our variables.

    Returns new {"params", "frozen"} trees; shapes validated leaf-by-leaf.
    """
    sd = dict(state_dict)
    params = jax_tree_to_dict(variables["params"])
    frozen = jax_tree_to_dict(variables["frozen"])
    core_p = params["core"]
    core_f = frozen["core"]

    # --- separate encoder ---
    sep = "_model.separate_encoder"
    body_p, body_f = convert_torchvision_resnet(
        {k[len(f"{sep}.backbone.body.") :]: v for k, v in sd.items()
         if k.startswith(f"{sep}.backbone.body.")},
        core_p["separate_encoder"]["backbone"]["body"],
        core_f["separate_encoder"]["backbone"]["body"],
    )
    core_p["separate_encoder"]["backbone"]["body"] = body_p
    core_f["separate_encoder"]["backbone"]["body"] = body_f
    ip = _to_np(sd[f"{sep}.backbone.input_proj.weight"]).transpose(2, 3, 1, 0)
    core_p["separate_encoder"]["backbone"]["input_proj"] = {
        "kernel": ip, "bias": _to_np(sd[f"{sep}.backbone.input_proj.bias"]),
    }
    core_p["separate_encoder"]["imu_layers"] = {
        "fc1": _linear(sd, f"{sep}.imu_layers.0"),
        "fc2": _linear(sd, f"{sep}.imu_layers.2"),
    }
    enc_layers = sorted(
        {int(k.split(".")[4]) for k in sd if k.startswith(f"{sep}.transformer.layers.")}
    )
    for i in enc_layers:
        p = f"{sep}.transformer.layers.{i}"
        layer = {
            "self_attn": _encoder_attention(sd, f"{p}.self_attn", dim),
        }
        if f"{p}.egodeep_attend.query_content.weight" in sd:
            layer["egodeep_attend"] = _egodeep(sd, f"{p}.egodeep_attend", with_mlp=True)
            layer["norm_eda"] = _layernorm(sd, f"{p}.norm_eda")
        if f"{p}.prevout_attn.attn.in_proj_weight" in sd:
            layer["prevout_attn"] = _encoder_attention(sd, f"{p}.prevout_attn", dim)
        core_p["separate_encoder"]["transformer"][f"layer{i}"] = layer

    # --- detector ---
    det = "_model.detector"
    det_p = core_p["detector"]
    det_p["class_embed"] = _linear(sd, f"{det}.class_embed")
    det_p["bbox_embed"] = _mlp(sd, f"{det}.bbox_embed", 3)
    det_p["query_embed"] = {"embedding": _to_np(sd[f"{det}.query_embed.weight"])}

    dec = f"{det}.decoder"
    dec_p = det_p["decoder"]
    dec_p["query_scale"] = _mlp(sd, f"{dec}.query_scale", 2)
    dec_p["ref_point_head"] = _mlp(sd, f"{dec}.ref_point_head", 2)
    dec_p["norm"] = _layernorm(sd, f"{dec}.norm")
    dec_layers = sorted(
        {int(k.split(".")[4]) for k in sd if k.startswith(f"{dec}.layers.")}
    )
    for i in dec_layers:
        p = f"{dec}.layers.{i}"
        layer = {
            "self_attend": _slot_attention(sd, f"{p}.self_attend"),
            "norm_sa": _layernorm(sd, f"{p}.norm_sa"),
            "feedforward": _feedforward(sd, f"{p}.feedforward"),
            "norm_out": _layernorm(sd, f"{p}.norm_out"),
        }
        j = 0
        while f"{p}.image_attend.{j}.key_content.weight" in sd:
            layer[f"image_attend{j}"] = _slot_attention(
                sd, f"{p}.image_attend.{j}", with_query_pos=(i == 0),
                with_query_sine=True,
            )
            layer[f"norm_ia{j}"] = _layernorm(sd, f"{p}.norm_ia.{j}")
            j += 1
        if f"{p}.egodeep_attend.query_content.weight" in sd:
            layer["egodeep_attend"] = _egodeep(sd, f"{p}.egodeep_attend", with_mlp=False)
            layer["norm_eda"] = _layernorm(sd, f"{p}.norm_eda")
        if f"{p}.slotstates_attend.query_content.weight" in sd:
            layer["slotstates_attend"] = _slot_attention(sd, f"{p}.slotstates_attend")
            layer["norm_ssa"] = _layernorm(sd, f"{p}.norm_ssa")
        dec_p[f"layer{i}"] = layer

    new_vars = {"params": params, "frozen": frozen}
    _validate_shapes(variables, new_vars)
    return new_vars


def jax_tree_to_dict(tree):
    if isinstance(tree, Mapping):
        return {k: jax_tree_to_dict(v) for k, v in tree.items()}
    return tree


def _validate_shapes(old: Any, new: Any, path: str = ""):
    if isinstance(old, Mapping):
        missing = set(old) - set(new)
        extra = set(new) - set(old)
        assert not missing and not extra, f"{path}: missing={missing} extra={extra}"
        for k in old:
            _validate_shapes(old[k], new[k], f"{path}/{k}")
    else:
        assert tuple(np.shape(old)) == tuple(np.shape(new)), (
            f"{path}: {np.shape(old)} vs {np.shape(new)}"
        )
