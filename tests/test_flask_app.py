"""Flask-app-factory tests (reference: acai_omr/__init__.py:21-44 create_app,
acai_omr/ui/routes.py:46-205).

The production deploy can run either the dependency-free WSGI app or the
Flask factory; tests/test_serving.py drives the former, this file drives the
latter through Flask's test client — blueprint registration, route surface,
Flask-native SSE streaming, multi-system ordering, and the postprocess
confidence formula. Skips when Flask isn't installed (it is optional —
serving/routes.py gates on import)."""

import io
import json

import numpy as np
import pytest

flask = pytest.importorskip("flask")

from test_serving import _png_bytes, tiny_model  # noqa: E402,F401  (fixture)


@pytest.fixture()
def client(tiny_model):  # noqa: F811
    from acai_omr_tpu.serving.app import create_app

    app = create_app()
    app.config["TESTING"] = True
    with app.test_client() as c:
        yield c


def test_blueprint_route_surface(client):
    """All 8 reference routes registered on the blueprint
    (reference routes.py:46,58,64,80,93,100,106,112)."""
    rules = {r.rule for r in client.application.url_map.iter_rules()}
    expected = {"/", "/tmpdir/create", "/upload", "/inference/setup",
                "/inference/stream", "/inference/postprocess", "/download",
                "/clear"}
    assert expected <= rules


def test_flask_full_flow_multi_system(client, rng):
    """Upload -> 11-bbox setup -> SSE stream (numeric system order; catches a
    lexicographic system_10 < system_2 sort) -> postprocess confidence =
    exp(mean per-system avg log prob) (reference routes.py:93-104,190)."""
    r = client.post("/tmpdir/create")
    tmpdir = r.get_json()["tmpdir"]
    hdr = {"X-Tmpdir": tmpdir}

    r = client.post("/upload", headers=hdr, data={
        "image": (io.BytesIO(_png_bytes(rng)), "t.png")})
    assert r.status_code == 200 and r.get_json()["ok"]

    n = 11
    bboxes = [[0, 0, 32 + i, 32] for i in range(n)]
    r = client.post("/inference/setup", headers=hdr, json={"bboxes": bboxes})
    assert r.get_json()["num_systems"] == n

    r = client.get(f"/inference/stream?tmpdir={tmpdir}")
    assert r.content_type.startswith("text/event-stream")
    text = r.get_data(as_text=True)
    finished = []
    for block in text.strip().split("\n\n"):
        lines = block.split("\n")
        ev = lines[0].removeprefix("event: ")
        data = json.loads(lines[1].removeprefix("data: "))
        if ev == "inference_finish":
            finished.append(data["system"])
    assert finished == list(range(n))
    assert "event: all_inference_finish" in text

    r = client.post("/inference/postprocess", headers=hdr)
    data = r.get_json()
    assert "ok" in data
    if data["ok"]:
        from pathlib import Path
        lps = [json.loads(p.read_text())["avg_log_prob"]
               for p in Path(tmpdir).glob("system_*.meta.json")]
        assert data["confidence"] == pytest.approx(float(np.exp(np.mean(lps))))

    r = client.post("/clear", headers=hdr)
    assert r.get_json()["ok"]


def test_flask_tmpdir_validation(client):
    r = client.post("/upload", headers={"X-Tmpdir": "/etc"})
    assert r.status_code == 400 and not r.get_json()["ok"]
