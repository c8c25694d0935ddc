from . import stream_collide

__all__ = ["stream_collide"]
