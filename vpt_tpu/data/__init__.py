from vpt_tpu.data.video import VideoReader, VideoWriter, native_available
from vpt_tpu.data.cursor import default_cursor

__all__ = ["VideoReader", "VideoWriter", "native_available", "default_cursor"]
