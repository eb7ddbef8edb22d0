"""WSGI entrypoint (reference: acai_omr/wsgi.py).

``gunicorn acai_omr_tpu.wsgi:app`` serves the Flask app when Flask is
installed, else the dependency-free WSGI application — same routes either way.
"""

try:
    from acai_omr_tpu.serving.app import create_app
    app = create_app()
except ModuleNotFoundError:
    from acai_omr_tpu.serving.wsgi_app import application as app
