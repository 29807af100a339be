from .sharded import make_mesh, make_sharded_pipeline, pad_frames

__all__ = ["make_mesh", "make_sharded_pipeline", "pad_frames"]
