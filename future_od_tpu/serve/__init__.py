from future_od_tpu.serve.streaming import make_streaming_fns, StreamingSession

__all__ = ["make_streaming_fns", "StreamingSession"]
