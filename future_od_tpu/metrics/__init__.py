from future_od_tpu.metrics.od_map import (  # noqa: F401
    aggregate_mean_average_precision,
    prepare_od_map_stuffs,
)
