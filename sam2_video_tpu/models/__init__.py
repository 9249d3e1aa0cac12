from . import (hiera, image_encoder, mask_decoder, memory_attention,
               memory_encoder, prompt_encoder, sam2, video_model)
from .sam2 import SAM2Config
from .video_model import VideoModelConfig, forward_train
