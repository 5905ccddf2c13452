"""Execute demo.ipynb headlessly (VERDICT r3 #7).

The notebook is the parity artifact for the reference's demo.ipynb cells 2-11
(build model with attention capture -> load clip -> forward -> draw future
boxes -> per-object decoder attention maps). Here it runs end-to-end under
nbclient on the CPU platform with its config cells parametrized to tiny dims
(the full flagship at 256x448 is not CPU-CI-sized), against a tiny synthetic
checkpoint written by the test — exercising the checkpoint-load path the
notebook documents, not just random init.
"""
import json
import os
import re

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = dict(
    num_classes=2, num_queries=8, hidden_dim=32, enc_layers=1, dec_layers=2,
    dim_feedforward=64, enc_nheads=4, nheads=4,
)


def _tiny_checkpoint(tmp_path):
    """A real orbax checkpoint of the tiny flagship (what `_final` exports)."""
    import jax

    from future_od_tpu.data.loader import collate
    from future_od_tpu.data.synthetic import SyntheticClipDataset
    from future_od_tpu.models.build import build_flagship
    from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
    from future_od_tpu.utils.checkpoint import save_checkpoint

    args = SpatioTemporalDETRArgs(**TINY)
    model = build_flagship(args, store_attention=True)
    ds = SyntheticClipDataset(num_samples=1, image_size=(64, 96), seed=11)
    data = {
        k: v for k, v in collate([ds[0]]).items() if not isinstance(v, list)
    }
    variables = model.init({"params": jax.random.key(7)}, data, deterministic=True)
    save_checkpoint(
        str(tmp_path), "demo_tiny_final",
        {"params": variables["params"], "frozen": variables["frozen"]},
        {"net_type": "SpatioTemporalDETR", "detr_args": None},
    )
    return variables


def test_demo_notebook_executes(tmp_path):
    nbformat = pytest.importorskip("nbformat")
    nbclient = pytest.importorskip("nbclient")

    variables = _tiny_checkpoint(tmp_path)

    nb = nbformat.read(os.path.join(REPO, "demo.ipynb"), as_version=4)
    code_cells = [c for c in nb.cells if c.cell_type == "code"]
    assert len(code_cells) >= 5, "demo notebook lost its code cells"

    # Parametrize the CONFIG cells only (the VERDICT-prescribed knob); every
    # other cell runs verbatim.
    tiny_kwargs = ", ".join(f"{k}={v}" for k, v in TINY.items())
    patched = {"args": False, "data": False, "ckpt": False}
    for cell in code_cells:
        if "SpatioTemporalDETRArgs(num_classes=2" in cell.source:
            cell.source = re.sub(
                r"SpatioTemporalDETRArgs\([^)]*\)",
                f"SpatioTemporalDETRArgs({tiny_kwargs})",
                cell.source,
            )
            patched["args"] = True
        if "image_size=(256, 448)" in cell.source:
            cell.source = cell.source.replace(
                "image_size=(256, 448)", "image_size=(64, 96)"
            )
            # activate the documented trained-weights path against the tiny
            # checkpoint written above
            cell.source += (
                f"\nrestored = load_checkpoint({str(tmp_path)!r}, 'demo_tiny_final',"
                "\n    target={'params': variables['params'], 'frozen': variables['frozen']})"
                "\nassert restored is not None, 'demo checkpoint must load'"
                "\nvariables = {'params': restored[0]['params'], 'frozen': restored[0]['frozen']}"
            )
            patched["data"] = True
            patched["ckpt"] = True
    assert all(patched.values()), f"notebook config cells changed shape: {patched}"

    out_dir = tmp_path / "nb"
    os.makedirs(out_dir)
    client = nbclient.NotebookClient(
        nb, timeout=900, kernel_name="python3",
        resources={"metadata": {"path": str(out_dir)}},
    )
    # the kernel subprocess must run on CPU and find the repo
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    prev_pp = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = REPO  # scrub the axon sitecustomize
    try:
        client.execute()
    finally:
        if prev_pp is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = prev_pp

    # every code cell produced no error output, and the forward cell printed
    executed = nbformat.writes(nb)
    assert "scores:" in executed
    for cell in nb.cells:
        for out in cell.get("outputs", []):
            assert out.get("output_type") != "error", json.dumps(out)[:2000]
