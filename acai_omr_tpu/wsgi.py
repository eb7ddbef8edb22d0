"""WSGI entrypoint (reference: acai_omr/wsgi.py).

``gunicorn acai_omr_tpu.wsgi:app`` serves the Flask app when Flask is
installed, else the dependency-free WSGI application — same routes either way.
"""

import os

try:
    from acai_omr_tpu.serving.app import create_app
    app = create_app()  # create_app honors ACAI_DYNAMIC_BATCHING itself
except ModuleNotFoundError:
    from acai_omr_tpu.serving.wsgi_app import application as app
    if os.environ.get("ACAI_DYNAMIC_BATCHING") == "1":
        # same opt-in as the Flask factory (serving/app.py)
        import jax.numpy as jnp
        from acai_omr_tpu.serving.routes import enable_dynamic_batching
        enable_dynamic_batching(
            max_batch=int(os.environ.get("ACAI_BATCH_MAX", "32")),
            max_wait_ms=float(os.environ.get("ACAI_BATCH_WAIT_MS", "25")),
            cache_dtype=(jnp.int8 if os.environ.get("ACAI_BATCH_INT8") == "1"
                         else jnp.bfloat16))
