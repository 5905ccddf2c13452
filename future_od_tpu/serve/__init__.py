from future_od_tpu.serve.streaming import make_streaming_fns, StreamingSession
from future_od_tpu.serve.server import MultiStreamServer
from future_od_tpu.serve.export import (
    export_inference,
    export_serving,
    export_streaming,
    load_serving,
)

__all__ = [
    "make_streaming_fns",
    "StreamingSession",
    "MultiStreamServer",
    "export_serving",
    "export_inference",
    "export_streaming",
    "load_serving",
]
