"""Dependency-free WSGI application for the OMR service.

Same route surface as the Flask blueprint (serving/routes.py; reference:
acai_omr/ui/routes.py:46-205) implemented on the WSGI protocol directly, so
serving works in environments without Flask and deploys under any WSGI server
(gunicorn config parity with the reference's webservice_setup.sh). SSE
streaming is a plain generator response.
"""

from __future__ import annotations

import io
import json
import tempfile
from pathlib import Path
from urllib.parse import parse_qs

import numpy as np

from .. import InferenceEvent
from . import routes as impl

_HTML_DIR = Path(__file__).parent / "templates"
_STATIC_DIR = Path(__file__).parent / "static"


def _export_inference_events():
    """Write the InferenceEvent enum for the frontend (reference app-factory
    behavior, acai_omr/__init__.py:21-23) — also needed when gunicorn imports
    ``application`` directly without going through serve()."""
    try:
        _STATIC_DIR.mkdir(exist_ok=True)
        (_STATIC_DIR / "inference_events.json").write_text(
            json.dumps({e.name: e.value for e in InferenceEvent}, indent=2))
    except OSError:
        pass


_export_inference_events()


def _response(start, status: str, body: bytes, ctype="application/json",
              extra=()):
    headers = [("Content-Type", ctype), ("Content-Length", str(len(body)))]
    headers += list(extra)
    start(status, headers)
    return [body]


def _json(start, obj, status="200 OK"):
    return _response(start, status, json.dumps(obj).encode())


def _validate_tmpdir(d: str) -> "Path":
    """Resolve-and-contain check: the client-supplied working dir must be a
    real directory strictly inside the system temp dir. A plain
    ``startswith`` on the raw string admitted ``/tmp/../anywhere`` traversal
    and ``/tmpfoo`` prefix collisions (round-4 review)."""
    if not d:
        raise ValueError("invalid or missing tmpdir")
    p = Path(d).resolve()
    root = Path(tempfile.gettempdir()).resolve()
    if not p.is_dir() or p == root or root not in p.parents:
        raise ValueError("invalid or missing tmpdir")
    return p


def _tmpdir_from(environ) -> Path:
    d = environ.get("HTTP_X_TMPDIR")
    if not d:
        qs = parse_qs(environ.get("QUERY_STRING", ""))
        d = (qs.get("tmpdir") or [None])[0]
    return _validate_tmpdir(d)


def _read_body(environ) -> bytes:
    length = int(environ.get("CONTENT_LENGTH") or 0)
    return environ["wsgi.input"].read(length)


def _parse_multipart_image(environ) -> bytes:
    """Extract the first file part from a multipart/form-data body."""
    ctype = environ.get("CONTENT_TYPE", "")
    boundary = None
    for part in ctype.split(";"):
        part = part.strip()
        if part.startswith("boundary="):
            boundary = part[len("boundary="):].strip('"')
    if not boundary:
        raise ValueError("not multipart")
    body = _read_body(environ)
    delim = b"--" + boundary.encode()
    for chunk in body.split(delim):
        if b"\r\n\r\n" not in chunk:
            continue
        headers, _, payload = chunk.partition(b"\r\n\r\n")
        if b"filename=" in headers:
            # the part body ends with exactly one CRLF before the next
            # delimiter; strip only that (an rstrip over b"\r\n-" could eat
            # legitimate trailing payload bytes)
            if payload.endswith(b"\r\n"):
                payload = payload[:-2]
            return payload
    raise ValueError("no file part found")


def application(environ, start_response):
    method = environ["REQUEST_METHOD"]
    path = environ.get("PATH_INFO", "/")

    try:
        if path == "/" and method == "GET":
            body = (_HTML_DIR / "index.html").read_text()
            # resolve url_for-style template refs for the stdlib server
            body = body.replace("{{ url_for('static', filename='main.css') }}",
                                "/static/main.css")
            body = body.replace("{{ url_for('static', filename='inference.js') }}",
                                "/static/inference.js")
            return _response(start_response, "200 OK", body.encode(),
                             "text/html; charset=utf-8")

        if path.startswith("/static/") and method == "GET":
            f = _STATIC_DIR / path[len("/static/"):]
            # containment compares RESOLVED against RESOLVED: the unresolved
            # _STATIC_DIR never appears among f.resolve()'s parents when the
            # repo path goes through a symlink, 404ing every asset
            if not f.is_file() \
                    or _STATIC_DIR.resolve() not in f.resolve().parents:
                return _response(start_response, "404 Not Found", b"not found",
                                 "text/plain")
            ctype = {"css": "text/css", "js": "application/javascript",
                     "json": "application/json"}.get(f.suffix[1:], "application/octet-stream")
            return _response(start_response, "200 OK", f.read_bytes(), ctype)

        if path == "/tmpdir/create" and method == "POST":
            return _json(start_response,
                         {"tmpdir": tempfile.mkdtemp(prefix="acai_omr_")})

        if path == "/upload" and method == "POST":
            d = _tmpdir_from(environ)
            data = _parse_multipart_image(environ)
            from PIL import Image, ImageOps
            img = Image.open(io.BytesIO(data))
            img = ImageOps.exif_transpose(img)
            img.convert("L").save(d / "upload.png")
            return _json(start_response, {"ok": True, "path": str(d / "upload.png")})

        if path == "/inference/setup" and method == "POST":
            d = _tmpdir_from(environ)
            payload = json.loads(_read_body(environ) or b"{}")
            bboxes = payload.get("bboxes", [])
            from PIL import Image
            img = Image.open(d / "upload.png").convert("L")
            if not bboxes:
                bboxes = [[0, 0, img.width, img.height]]
            impl.clear_system_files(d)
            for i, (x0, y0, x1, y1) in enumerate(bboxes):
                img.crop((int(x0), int(y0), int(x1), int(y1))).save(
                    d / f"system_{i}.png")
            return _json(start_response, {"ok": True, "num_systems": len(bboxes)})

        if path == "/inference/stream" and method == "GET":
            d = _tmpdir_from(environ)
            start_response("200 OK", [
                ("Content-Type", "text/event-stream"),
                ("Cache-Control", "no-cache"),
                ("X-Accel-Buffering", "no"),
            ])
            return (chunk.encode() for chunk in impl._sse_stream(d))

        if path == "/inference/postprocess" and method == "POST":
            d = _tmpdir_from(environ)
            return _json(start_response, impl.postprocess_systems(d))

        if path == "/download" and method == "GET":
            d = _tmpdir_from(environ)
            body = (d / "result.musicxml").read_bytes()
            return _response(
                start_response, "200 OK", body, "application/xml",
                [("Content-Disposition", "attachment; filename=result.musicxml")])

        if path == "/clear" and method == "POST":
            d = _tmpdir_from(environ)
            for p in d.iterdir():
                p.unlink()
            d.rmdir()
            return _json(start_response, {"ok": True})

        return _response(start_response, "404 Not Found", b"not found", "text/plain")

    except ValueError as e:
        return _json(start_response, {"ok": False, "error": str(e)},
                     "400 Bad Request")
    except FileNotFoundError as e:
        return _json(start_response, {"ok": False, "error": str(e)},
                     "404 Not Found")


def serve(host: str = "127.0.0.1", port: int = 8000):
    """Threaded stdlib server (dev use; production runs gunicorn on
    ``acai_omr_tpu.serving.wsgi_app:application``)."""
    from wsgiref.simple_server import WSGIServer, make_server
    from socketserver import ThreadingMixIn

    class ThreadingWSGIServer(ThreadingMixIn, WSGIServer):
        daemon_threads = True

    # export inference events for the frontend (reference app factory behavior)
    _STATIC_DIR.mkdir(exist_ok=True)
    (_STATIC_DIR / "inference_events.json").write_text(
        json.dumps({e.name: e.value for e in InferenceEvent}, indent=2))

    httpd = make_server(host, port, application, server_class=ThreadingWSGIServer)
    print(f"Serving Acai OMR on http://{host}:{port}")
    httpd.serve_forever()


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()
    serve(args.host, args.port)
