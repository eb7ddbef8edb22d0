"""WSGI entrypoint (reference: acai_omr/wsgi.py)."""
from acai_omr_tpu.serving.app import create_app

app = create_app()
