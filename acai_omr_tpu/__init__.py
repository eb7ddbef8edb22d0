"""acai_omr_tpu: TPU-native optical music recognition framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the reference
acai-omr system (pianoform sheet music -> Linearized MusicXML -> MusicXML):
MAE-pretrained ViT encoder, LMX transformer decoder with compiled KV-cached
decode, three-stage training (MAE -> scheduled sampling -> GRPO), bucketed
ragged batching, mesh parallelism, serving with SSE streaming.
"""

import os
from enum import Enum
from pathlib import Path


def _setup_jax_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache for every entrypoint.

    Remote compiles through the axon TPU tunnel take minutes for the large
    decode/training programs; the backend's own cache only helps within a
    process (repeat cross-process compiles still pay ~1 s each for small
    programs and the full compile for cold ones). The persistent cache
    brings cross-process recompiles down to disk-read time (measured
    1.44 s -> 0.07 s on a probe program; minutes -> seconds for the
    monolith kernel). Only compiles that took >= 1 s are written, so test
    suites full of tiny CPU programs don't flood the directory.

    Opt out with ``ACAI_JAX_CACHE=0``; override the location with
    ``ACAI_JAX_CACHE_DIR`` (default: ``<repo>/.jax_cache``, falling back to
    ``~/.cache/acai_omr_tpu/jax`` when the checkout isn't writable, e.g. a
    pip install into a read-only site-packages). Respects JAX's native
    ``JAX_COMPILATION_CACHE_DIR`` / an already-configured cache dir — those
    win over our default.
    """
    if os.environ.get("ACAI_JAX_CACHE", "1") != "1":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:  # user already configured it
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            return
        cache_dir = os.environ.get("ACAI_JAX_CACHE_DIR")
        if not cache_dir:
            repo_root = Path(__file__).resolve().parent.parent
            if os.access(repo_root, os.W_OK):
                cache_dir = str(repo_root / ".jax_cache")
            else:
                cache_dir = str(Path.home() / ".cache" / "acai_omr_tpu" / "jax")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never let cache setup break an import
        pass


_setup_jax_compilation_cache()


class InferenceEvent(Enum):
    """Streaming inference events (reference: acai_omr/__init__.py:10-17);
    the serving layer writes these to JSON for the frontend."""
    ENCODING_START = "encoding_start"
    ENCODING_FINISH = "encoding_finish"
    STEP = "step"
    INFERENCE_FINISH = "inference_finish"
    ALL_INFERENCE_FINISH = "all_inference_finish"
