"""sam2_video_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for fine-tuning
SAM2-style video segmentation models on surgical video datasets.

Built from scratch with the capabilities of the PyTorch reference
``yangkunyi/sam2-video-training`` (see SURVEY.md), re-designed TPU-first:

- the full SAM2 model stack (Hiera windowed-attention encoder, FPN neck, prompt
  encoder, two-way-transformer mask decoder, memory encoder, memory attention)
  as pure-functional JAX modules over plain param pytrees (``models/``),
- the per-frame tracking recurrence as a ``jax.lax.scan`` over a fixed-shape
  ring-buffer memory bank (``models/sam2.py``),
- Pallas TPU kernels + XLA compute primitives (``ops/``),
- GSPMD/pjit data parallelism over a device mesh (``parallel/``),
- a host-side COCO-RLE video-clip data pipeline (``data/``),
- losses / optimizer / train loop / orbax checkpointing (``training/``),
- a streaming video predictor + IoU/Dice/MAE eval + threshold search (``eval/``).
"""

__version__ = "0.1.0"
