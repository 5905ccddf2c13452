"""future_od_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for future
object detection with spatiotemporal transformers.

This is a from-scratch, TPU-first re-design with the capabilities of the PyTorch
reference `atonderski/future-object-detection` (arXiv 2204.10321):

- ResNet-50 + transformer encoder + conditional cross-attention decoder detection
  stack, with spatiotemporal extensions (per-frame encoding, joint / causal / F2F
  cross-frame encoders, a recurrent frame-memory decoder, IMU token conditioning).
- Set-prediction training with an on-device assignment solver (batched auction)
  so the full train step compiles to a single XLA program; exact Hungarian
  (scipy or the bundled C++ solver) is available as a host-callback arm.
- NuScenes / NuImages clip input pipelines on the host feeding device-resident
  batches, a fully tensorized future-detection mAP metric, orbax checkpointing,
  data-parallel (+ optional tensor-parallel) training over a `jax.sharding.Mesh`.

Layout convention: images are NHWC / (B, L, H, W, 3) — the TPU-native layout —
whereas the reference uses NCHW. All other batch-dict keys keep the reference's
contract (see SURVEY.md §2.6).
"""

__version__ = "0.1.0"
