"""Flask app factory for the OMR web service.

Parity with the reference serving stack (reference: acai_omr/__init__.py:21-44
create_app; ui/routes.py): same route surface (tmpdir lifecycle, upload, bbox
system cropping, SSE streaming inference, postprocess to MusicXML + rendered
image + confidence, download, clear) on top of the TPU inference path. The
InferenceEvent enum is exported to JSON for the frontend exactly like the
reference.
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

from .. import InferenceEvent


def create_app():
    from flask import Flask

    static_dir = Path(__file__).parent / "static"
    static_dir.mkdir(exist_ok=True)
    (static_dir / "inference_events.json").write_text(
        json.dumps({e.name: e.value for e in InferenceEvent}, indent=2))

    logger = logging.getLogger()
    logger.setLevel(logging.DEBUG)
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter("%(module)s - %(levelname)s: %(message)s"))
    logger.addHandler(handler)

    app = Flask(__name__,
                template_folder=str(Path(__file__).parent / "templates"),
                static_folder=str(static_dir))

    from .routes import main
    app.register_blueprint(main)

    import os
    if os.environ.get("ACAI_DYNAMIC_BATCHING") == "1":
        # cross-request TPU batch formation for /inference/stream
        import jax.numpy as jnp
        from .routes import enable_dynamic_batching
        enable_dynamic_batching(
            max_batch=int(os.environ.get("ACAI_BATCH_MAX", "32")),
            max_wait_ms=float(os.environ.get("ACAI_BATCH_WAIT_MS", "25")),
            # ACAI_BATCH_INT8=1: quantized KV decode (~1.5x, exact on
            # trained checkpoints — docs/PERF.md)
            cache_dtype=(jnp.int8 if os.environ.get("ACAI_BATCH_INT8") == "1"
                         else jnp.bfloat16))

    @app.errorhandler(ValueError)
    def bad_request(e):  # tmpdir validation parity with wsgi_app.py:174-176
        from flask import jsonify
        return jsonify({"ok": False, "error": str(e)}), 400

    return app
