"""Speed-of-light (roofline) model of the flagship inference path on TPU v5e.

For every conv in the ResNet-50 trunk (and aggregate encoder/decoder matmul
groups) this computes the two analytic lower bounds on execution time:

  t_mxu   = FLOPs / peak            (2e14 bf16 FLOP/s per v5e chip)
  t_hbm   = moved bytes / bandwidth (8.19e11 B/s per v5e chip)

with the standard best-case fusion assumptions — frozen-BN + ReLU fused into
the conv epilogue (zero extra traffic), weights resident once per program,
residual adds counted as one extra read of the identity tensor.  The per-op
bound is max(t_mxu, t_hbm); a measured time near the bound means the op is at
speed-of-light and further kernel work cannot pay.  The reference has no such
analysis; see jax-ml's scaling-book roofline methodology.

Run: python tools/roofline.py  (pure arithmetic — no jax, no device)
"""
from __future__ import annotations

import json

PEAK_FLOPS = 197e12  # v5e bf16 MXU peak, FLOP/s
HBM_BW = 819e9       # v5e HBM bandwidth, B/s
BYTES = 2            # bf16
# VPU elementwise throughput (op/s) and softmax cost model: the online
# softmax touches every score element with ~5 VPU ops (max-reduce, subtract,
# exp2, sum-reduce, + rescale amortized). 4e12 op/s is calibrated against the
# measured 4.55 ms/encoder-layer at 3.8e9 scores (BENCHMARKS.md round 3) and
# is consistent with v5e's ~940 MHz x 8x128-lane x ~4-slot VPU.
PEAK_VPU = 4e12
SOFTMAX_OPS_PER_SCORE = 5.0


def conv_cost(B, H, W, Cin, Cout, k=1, stride=1):
    """(flops, bytes) for a kxk conv at input HxW, NHWC bf16, fused epilogue."""
    Ho, Wo = H // stride, W // stride
    flops = 2.0 * B * Ho * Wo * k * k * Cin * Cout
    bts = BYTES * (B * H * W * Cin + k * k * Cin * Cout + B * Ho * Wo * Cout)
    return flops, bts


def add_op(table, stage, name, flops, bts, vpu_ops=0.0):
    table.append({
        "stage": stage, "op": name, "gflops": flops / 1e9, "mbytes": bts / 1e6,
        "t_mxu_ms": flops / PEAK_FLOPS * 1e3, "t_hbm_ms": bts / HBM_BW * 1e3,
        "t_sol_ms": max(
            flops / PEAK_FLOPS, bts / HBM_BW, vpu_ops / PEAK_VPU
        ) * 1e3,
    })


def resnet50(table, B, H, W):
    # stem: 7x7/2 conv (3->64) + fused BN/ReLU + 3x3/2 maxpool
    f, b = conv_cost(B, H, W, 3, 64, k=7, stride=2)
    add_op(table, "stem", "conv7x7s2", f, b)
    h, w = H // 2, W // 2
    add_op(table, "stem", "maxpool3x3s2",
           0.0, BYTES * (B * h * w * 64 + B * (h // 2) * (w // 2) * 64))
    h, w = h // 2, w // 2

    cin = 64
    for stage, (blocks, planes) in enumerate(
        [(3, 64), (4, 128), (6, 256), (3, 512)], start=1
    ):
        cout = planes * 4
        for blk in range(blocks):
            stride = 2 if (blk == 0 and stage > 1) else 1
            sname = f"layer{stage}"
            f, b = conv_cost(B, h, w, cin, planes, k=1)
            add_op(table, sname, f"b{blk}.conv1", f, b)
            f, b = conv_cost(B, h, w, planes, planes, k=3, stride=stride)
            add_op(table, sname, f"b{blk}.conv2", f, b)
            ho, wo = h // stride, w // stride
            f, b = conv_cost(B, ho, wo, planes, cout, k=1)
            add_op(table, sname, f"b{blk}.conv3", f, b)
            if blk == 0:
                f, b = conv_cost(B, h, w, cin, cout, k=1, stride=stride)
                add_op(table, sname, f"b{blk}.down", f, b)
            # residual add: one extra read of the identity (write is fused)
            add_op(table, sname, f"b{blk}.add", 0.0, BYTES * B * ho * wo * cout)
            h, w, cin = ho, wo, cout


def transformer(table, B, T, D, ffn, layers, stage, n_mem=1, heads=8, t_mem=None):
    """Aggregate matmul groups for encoder/decoder layers (flash attention
    keeps the TxT score matrix on-chip, so attention traffic = QKV + out;
    the dominant attention cost at these shapes is the VPU softmax over
    B·heads·T² scores — see PEAK_VPU)."""
    t_mem = t_mem or T  # cross-attention key length (decoder: image tokens)
    for name, flops, bts, vpu in [
        ("qkv+out proj", 2.0 * B * T * D * D * 4 * layers,
         BYTES * B * T * D * (1 + 3 + 1 + 1) * layers, 0.0),
        ("attn (flash)", 2.0 * B * T * t_mem * D * 2 * n_mem * layers,
         BYTES * B * t_mem * D * 3 * n_mem * layers,
         SOFTMAX_OPS_PER_SCORE * B * heads * T * t_mem * n_mem * layers),
        ("ffn", 2.0 * B * T * D * ffn * 2 * layers,
         BYTES * B * T * (D + ffn + D) * layers, 0.0),
    ]:
        add_op(table, stage, name, flops, bts, vpu)


def main():
    B_clip, L = 12, 2
    H, W = 896, 1600
    table: list = []
    resnet50(table, B_clip * L, H, W)
    # input projection C5 -> hidden_dim
    f, b = conv_cost(B_clip * L, H // 32, W // 32, 2048, 256, k=1)
    add_op(table, "proj", "1x1", f, b)
    T = (H // 32) * (W // 32)  # 1400 tokens/image
    transformer(table, B_clip * L, T, 256, 2048, 6, "encoder")
    # decoder: 128 queries, self-attn + cross-attn into L frame memories
    transformer(table, B_clip, 128, 256, 2048, 6, "decoder", n_mem=L, t_mem=T)
    f = 2.0 * B_clip * 128 * 256 * 256 * 2 * 6  # cross-attn q/k extra projs
    add_op(table, "decoder", "cond-qk proj", f, BYTES * B_clip * 128 * 256 * 6)

    stages: dict = {}
    for row in table:
        s = stages.setdefault(row["stage"], dict.fromkeys(
            ("gflops", "mbytes", "t_mxu_ms", "t_hbm_ms", "t_sol_ms"), 0.0))
        for k in s:
            s[k] += row[k]

    hdr = f"{'stage':9s} {'GFLOP':>8s} {'MB':>8s} {'t_mxu':>7s} {'t_hbm':>7s} {'t_SoL':>7s}"
    print(hdr + "\n" + "-" * len(hdr))
    tot = dict.fromkeys(("gflops", "mbytes", "t_mxu_ms", "t_hbm_ms", "t_sol_ms"), 0.0)
    for name, s in stages.items():
        print(f"{name:9s} {s['gflops']:8.1f} {s['mbytes']:8.0f} "
              f"{s['t_mxu_ms']:7.2f} {s['t_hbm_ms']:7.2f} {s['t_sol_ms']:7.2f}")
        for k in tot:
            tot[k] += s[k]
    print("-" * len(hdr))
    print(f"{'total':9s} {tot['gflops']:8.1f} {tot['mbytes']:8.0f} "
          f"{tot['t_mxu_ms']:7.2f} {tot['t_hbm_ms']:7.2f} {tot['t_sol_ms']:7.2f}")
    print(json.dumps({"per_stage_sol_ms": {k: round(v["t_sol_ms"], 2) for k, v in stages.items()},
                      "total_sol_ms": round(tot["t_sol_ms"], 2),
                      "total_gflop": round(tot["gflops"], 1)}))


if __name__ == "__main__":
    main()
