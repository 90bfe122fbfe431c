from .incremental import IncrementalPipeline, WatermarkStore

__all__ = ["IncrementalPipeline", "WatermarkStore"]
