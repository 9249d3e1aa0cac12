from .inference import InferenceConfig, InferenceRunner, inference
from .metrics import evaluate
from .predictor import VideoPredictor
