"""HTTP serving daemon (ccmh/serve.py).

The reference has no deployment story at all (its test() path dumps .mat
files, train/base.py:277-323); these tests pin the new JSON-over-HTTP
front-end: encode/search/add round-trips through a real socket, error
mapping, and parity with direct Retriever/HashIndex calls.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from ccmh.retrieval import HashIndex
from ccmh.serve import RetrievalService, ServiceError, serve
from tests.test_retrieval import TINY, _build_retriever, _demo_ids, random_codes


@pytest.fixture(scope="module")
def server():
    retriever, method, params, aux, cfg = _build_retriever()
    gallery = random_codes(64, cfg.output_dim, seed=3, with_ties=False)
    service = RetrievalService(retriever, {"image": HashIndex(gallery)})
    srv = serve(service, port=0)     # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, service, retriever, gallery
    srv.shutdown()
    srv.server_close()


def _call(srv, path, body=None, method=None):
    url = f"http://127.0.0.1:{srv.server_address[1]}{path}"
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(url, data=data, method=method)
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def test_healthz(server):
    srv, service, retriever, gallery = server
    got = _call(srv, "/healthz")
    assert got["ok"] and got["method"] == "DSPH"
    assert got["indexes"] == {"image": 64}
    assert got["resolution"] == TINY.image_resolution


def test_encode_ids_matches_retriever(server):
    srv, service, retriever, _ = server
    ids = _demo_ids(3)
    got = _call(srv, "/v1/encode", {"ids": ids.tolist()})
    want = retriever.encode_texts(ids)
    np.testing.assert_array_equal(np.asarray(got["codes"]), want.astype(int))


def test_encode_texts(server):
    srv, service, retriever, _ = server
    got = _call(srv, "/v1/encode", {"texts": ["a dog on grass", "red car"]})
    want = retriever.encode_texts(["a dog on grass", "red car"])
    np.testing.assert_array_equal(np.asarray(got["codes"]), want.astype(int))


def test_search_matches_direct(server):
    srv, service, retriever, gallery = server
    ids = _demo_ids(2)
    got = _call(srv, "/v1/search", {"ids": ids.tolist(), "k": 5})
    codes = retriever.encode_texts(ids)
    dist, idx = service.indexes["image"].search(codes, 5)
    np.testing.assert_array_equal(np.asarray(got["indices"]), idx)
    np.testing.assert_array_equal(np.asarray(got["distances"]), dist)


def test_images_b64_roundtrip(server):
    srv, service, retriever, _ = server
    rng = np.random.RandomState(0)
    imgs = rng.randn(2, TINY.image_resolution, TINY.image_resolution,
                     3).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, imgs)
    got = _call(srv, "/v1/encode",
                {"images_b64": base64.b64encode(buf.getvalue()).decode()})
    want = retriever.encode_images(imgs)
    np.testing.assert_array_equal(np.asarray(got["codes"]), want.astype(int))


def test_add_appends_and_search_sees_new_rows(server):
    srv, service, retriever, gallery = server
    new = random_codes(8, 16, seed=9, with_ties=False)
    got = _call(srv, "/v1/add", {"index": "image", "codes": new.tolist()})
    assert got["size"] == 64 + 8
    assert _call(srv, "/healthz")["indexes"]["image"] == 72
    # an exact-duplicate query of an appended row must surface it
    got = _call(srv, "/v1/search",
                {"ids": _demo_ids(1).tolist(), "k": 72})
    assert sorted(got["indices"][0]) == list(range(72))


def test_error_mapping(server):
    srv, service, retriever, _ = server

    def status_of(path, body):
        try:
            _call(srv, path, body)
            return 200
        except urllib.error.HTTPError as exc:
            payload = json.loads(exc.read())
            assert "error" in payload
            return exc.code

    assert status_of("/v1/encode", {}) == 400                    # no modality
    assert status_of("/v1/encode", {"texts": [1, 2]}) == 400     # bad type
    assert status_of("/v1/search",
                     {"ids": _demo_ids(1).tolist(), "k": 0}) == 400
    assert status_of("/v1/search",
                     {"ids": _demo_ids(1).tolist(),
                      "index": "nope"}) == 400
    assert status_of("/v1/nope", {}) == 404
    assert status_of("/v1/encode",
                     {"images": [[0.0]]}) == 400                 # bad shape
    assert status_of("/v1/encode", {"images_b64": "!!"}) == 400


def test_add_bootstraps_missing_index():
    """A daemon started without --gallery grows its first index from the
    first /v1/add (then appends normally)."""
    retriever, *_ = _build_retriever()
    service = RetrievalService(retriever, {})
    first = random_codes(6, 16, seed=11, with_ties=False)
    got = service.add({"index": "image", "codes": first.tolist()})
    assert got["size"] == 6
    got = service.add({"index": "image",
                       "codes": random_codes(2, 16, seed=12,
                                             with_ties=False).tolist()})
    assert got["size"] == 8
    # the bootstrapped index is searchable
    out = service.search({"ids": _demo_ids(1).tolist(), "k": 8})
    assert sorted(out["indices"][0]) == list(range(8))


def test_service_requires_single_modality():
    retriever, *_ = _build_retriever()
    service = RetrievalService(retriever, {})
    with pytest.raises(ServiceError):
        service.encode({"texts": ["a"], "ids": [[0]]})
