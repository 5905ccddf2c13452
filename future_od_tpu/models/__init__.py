"""Model stack: attention layers, ResNet backbone, transformer encoder/decoder,
model cores, and the SpatioTemporalDETR task wrapper."""
