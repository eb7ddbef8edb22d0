"""acai_omr_tpu: TPU-native optical music recognition framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the reference
acai-omr system (pianoform sheet music -> Linearized MusicXML -> MusicXML):
MAE-pretrained ViT encoder, LMX transformer decoder with compiled KV-cached
decode, three-stage training (MAE -> scheduled sampling -> GRPO), bucketed
ragged batching, mesh parallelism, serving with SSE streaming.
"""

from enum import Enum


class InferenceEvent(Enum):
    """Streaming inference events (reference: acai_omr/__init__.py:10-17);
    the serving layer writes these to JSON for the frontend."""
    ENCODING_START = "encoding_start"
    ENCODING_FINISH = "encoding_finish"
    STEP = "step"
    INFERENCE_FINISH = "inference_finish"
    ALL_INFERENCE_FINISH = "all_inference_finish"
