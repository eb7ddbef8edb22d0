"""High-level one-call API: image file -> LMX / MusicXML.

Convenience layer over the inference stack for library users:

    from acai_omr_tpu.api import OmrModel
    model = OmrModel.load("tf_omr_train/vitomr")
    result = model.transcribe("score.png")
    result.lmx          # LMX token string
    result.musicxml     # full MusicXML document (None if delinearization failed)
    result.confidence   # exp(mean token log prob)
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


@dataclasses.dataclass
class Transcription:
    lmx: str
    musicxml: str | None
    confidence: float
    problems: list


class OmrModel:
    def __init__(self, cfg, params, tokenizer, transform):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.transform = transform

    @classmethod
    def load(cls, weights_path: str | None = None, compute_dtype=None) -> "OmrModel":
        import jax.numpy as jnp
        from .inference.vitomr_inference import set_up_omr_inference
        cfg, params, tokenizer, transform = set_up_omr_inference(
            weights_path, compute_dtype or jnp.bfloat16)
        return cls(cfg, params, tokenizer, transform)

    def _load_image(self, img):
        from PIL import Image
        if isinstance(img, (str, bytes)) or hasattr(img, "read"):
            img = Image.open(img).convert("L")
        if isinstance(img, Image.Image):
            return self.transform(img)
        return self.transform(np.asarray(img))

    def transcribe(self, img, max_len: int = 1536, beam_size: int = 1,
                   quantized_kv: bool = False) -> Transcription:
        """One system image (path / PIL / array) -> Transcription."""
        return self.transcribe_batch([img], max_len, beam_size, quantized_kv)[0]

    def transcribe_batch(self, imgs, max_len: int = 1536,
                         beam_size: int = 1,
                         quantized_kv: bool = False) -> list:
        """Ragged list of system images -> list of Transcription.

        ``beam_size > 1`` uses beam-search decode (quality over speed);
        ``quantized_kv`` uses int8 KV caches (speed over exactness — ~1.5x
        decode throughput on TPU; composes with beams).
        """
        from .inference.batch_inference import batch_inference
        from .lmx.delinearizer import DelinearizationError, delinearize

        arrays = [self._load_image(i) for i in imgs]
        import jax.numpy as jnp
        res = batch_inference(self.params, self.cfg, arrays, self.tokenizer,
                              max_inference_len=max_len, beam_size=beam_size,
                              cache_dtype=jnp.int8 if quantized_kv else jnp.bfloat16)
        out = []
        for lmx, avg_lp in zip(res.lmx, res.avg_log_probs):
            try:
                xml, problems = delinearize(lmx)
            except DelinearizationError as e:
                xml, problems = None, [str(e)]
            out.append(Transcription(lmx, xml, float(math.exp(avg_lp)), problems))
        return out
