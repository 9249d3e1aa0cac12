from .types import VideoClip, VideoClipBatch
