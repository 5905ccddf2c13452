"""FUTURE-prediction overfit probe: flagship spatiotemporal+IMU model on 8
synthetic 3-frame clips where boxes are visible only in the 2 past frames —
the model must extrapolate motion to the unseen annotated frame.

Measured on TPU v5 lite: AP50 reaches 1.0 on both classes by ~step 1000
(loss 23.9 -> 0.5 over 3000 steps) — the paper-task machinery (recurrent
frame-memory decoder, IMU conditioning, future supervision) closes.
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from future_od_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from future_od_tpu.data.loader import collate, ARRAY_KEYS
from future_od_tpu.data.synthetic import SyntheticClipDataset
from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.train.optimizer import build_optimizer
from future_od_tpu.train.step import TrainState, make_train_step
from future_od_tpu.metrics.od_map import aggregate_mean_average_precision

# FUTURE prediction: 3-frame clips, boxes drawn only on the 2 past frames,
# model must extrapolate motion to the unseen annotated frame. IMU carries the
# ego-compensation signal.
args = SpatioTemporalDETRArgs(
    freeze_stem=False,  # from-scratch run: backprop the whole trunk
    num_classes=2, num_queries=32, hidden_dim=128,
    enc_layers=2, dec_layers=3, dim_feedforward=512, enc_nheads=8, nheads=8,
    lr=3e-4, lr_backbone=3e-4)
model = build_flagship(args)
ds = SyntheticClipDataset(num_samples=8, num_frames=3, image_size=(128, 192), max_objects=3, seed=5)
batch = collate([ds[i] for i in range(8)])
data = {k: jnp.asarray(v) for k, v in batch.items() if k in ARRAY_KEYS}

variables = jax.jit(lambda k: model.init({"params": k}, data, deterministic=True))(jax.random.key(0))
tx, opt_state = build_optimizer(variables["params"], lr=3e-4, lr_backbone=3e-4, max_norm=0.1, freeze_stem=False)
state = TrainState(variables["params"], variables["frozen"], opt_state, jnp.int32(0))
step = jax.jit(make_train_step(model, args.criterion_config(), tx), donate_argnums=(0,))
key = jax.random.key(1)
for it in range(3001):
    state, loss, stats, odmap, out = step(state, data, key)
    if it % 500 == 0:
        s = {k: float(np.asarray(v)) for k, v in stats.items()}
        ap = aggregate_mean_average_precision(
            *[np.asarray(x) for x in odmap[:3]], np.asarray(odmap[3])[..., None]
        )
        print(f"it {it}: loss={float(np.asarray(loss)):.3f} l1={s['box_l1']:.3f} "
              f"giou={s['box_giou']:.3f} labels={s['labels']:.3f} "
              f"AP50={np.round(ap['all'][0, :, 0], 3)}", flush=True)
print("DONE", flush=True)
