"""Host input pipeline: joint transforms, NuScenes/NuImages clip datasets,
synthetic data, and the prefetching device loader."""
