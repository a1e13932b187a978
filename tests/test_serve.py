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
from ccmh.serve import RetrievalService, ServiceError, _Batcher, serve
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
    # wrong-width / ragged pre-tokenized ids must 400 BEFORE enqueueing
    # (a bad row in a coalesced batch would fail other tenants' requests)
    assert status_of("/v1/encode", {"ids": [[1, 2, 3]]}) == 400
    assert status_of("/v1/encode", {"ids": [[1, 2], [1]]}) == 400
    # malformed /v1/add bodies are client errors, not daemon faults
    assert status_of("/v1/add", {"codes": [[1, -1], [1]]}) == 400   # ragged
    assert status_of("/v1/add", {"codes": [[1.0, -1.0]]}) == 400    # width
    # nonzero-row zero-width batches must 400, not return 0 codes for 2 rows
    assert status_of("/v1/encode", {"ids": [[], []]}) == 400
    # ... and zero-width codes must not bootstrap a poisoned 0-bit index
    assert status_of("/v1/add", {"codes": [[], []], "index": "fresh"}) == 400


def test_encode_empty_texts(server):
    srv, service, retriever, _ = server
    out = _call(srv, "/v1/encode", {"texts": []})
    assert out["codes"] == []


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


# --------------------------------------------------- dynamic micro-batching

def _fanout(n, fn):
    """Run fn(i) on n threads released together; return results in order."""
    barrier = threading.Barrier(n)
    out, errs = [None] * n, [None] * n

    def worker(i):
        barrier.wait()
        try:
            out[i] = fn(i)
        except BaseException as exc:  # noqa: BLE001
            errs[i] = exc

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for exc in errs:
        if exc is not None:
            raise exc
    return out


def test_batcher_coalesces_and_splits():
    calls = []

    def run(rows):
        calls.append(rows.shape[0])
        return rows * 2

    b = _Batcher(run, max_rows=16, window_ms=300)
    out = _fanout(6, lambda i: b.submit(np.full((1, 4), i, np.float32)))
    for i in range(6):
        np.testing.assert_array_equal(out[i], np.full((1, 4), 2 * i))
    stats = b.stats()
    assert stats["requests"] == 6 and stats["rows"] == 6
    assert stats["batches"] < 6          # coalescing actually happened
    assert sum(calls) == 6


def test_batcher_tuple_outputs_and_row_cap():
    calls = []

    def run(rows):
        calls.append(rows.shape[0])
        return rows + 1, rows - 1

    b = _Batcher(run, max_rows=4, window_ms=300)
    out = _fanout(6, lambda i: b.submit(np.full((2, 3), i, np.float32)))
    for i in range(6):
        plus, minus = out[i]
        np.testing.assert_array_equal(plus, np.full((2, 3), i + 1))
        np.testing.assert_array_equal(minus, np.full((2, 3), i - 1))
    assert all(c <= 4 for c in calls)    # groups respect max_rows
    # a single oversized request still goes through alone
    big = b.submit(np.zeros((10, 3), np.float32))
    assert big[0].shape == (10, 3)
    assert calls[-1] == 10


def test_batcher_propagates_errors_to_all_waiters():
    def run(rows):
        raise RuntimeError("device fell over")

    b = _Batcher(run, max_rows=8, window_ms=100)
    with pytest.raises(RuntimeError, match="device fell over"):
        b.submit(np.zeros((1, 2), np.float32))


def test_service_microbatched_encode_matches_serial():
    """Concurrent single-row encodes coalesce into fewer device calls and
    return exactly the rows a serial encode produces."""
    retriever, *_ = _build_retriever()
    service = RetrievalService(retriever, {}, window_ms=300, max_batch=64)
    ids = _demo_ids(8)
    want = retriever.encode_texts(ids).astype(int)
    out = _fanout(8, lambda i: service.encode({"ids": [ids[i].tolist()]}))
    for i in range(8):
        np.testing.assert_array_equal(np.asarray(out[i]["codes"][0]), want[i])
    stats = service.healthz()["batching"]["text"]
    assert stats["requests"] == 8 and stats["batches"] < 8


def test_service_microbatched_search_matches_direct():
    retriever, *_ = _build_retriever()
    gallery = random_codes(48, 16, seed=21, with_ties=False)
    index = HashIndex(gallery)
    service = RetrievalService(retriever, {"image": index},
                               window_ms=300, max_batch=64)
    ids = _demo_ids(6)
    codes = retriever.encode_texts(ids)
    want_d, want_i = index.search(codes, 5)
    out = _fanout(6, lambda i: service.search(
        {"ids": [ids[i].tolist()], "k": 5}))
    for i in range(6):
        np.testing.assert_array_equal(np.asarray(out[i]["indices"][0]),
                                      want_i[i])
        np.testing.assert_array_equal(np.asarray(out[i]["distances"][0]),
                                      want_d[i])
    stats = service.healthz()["batching"]["search"]
    assert stats["requests"] == 6 and stats["batches"] < 6


def test_bucket_padding_parity_across_request_sizes():
    """Odd-sized requests ride power-of-two buckets (bounded executable
    set); padded rows must never leak into results."""
    retriever, *_ = _build_retriever()
    service = RetrievalService(retriever, {}, max_batch=4)
    ids = _demo_ids(7)
    want = retriever.encode_texts(ids).astype(int)
    start = 0
    for size in (1, 3, 2, 1):    # buckets 1, 4, 2, 1 (and 7 > max_batch=4
        part = ids[start:start + size]  # exercises the chunk loop via 3+4)
        got = service.encode({"ids": part.tolist()})
        np.testing.assert_array_equal(np.asarray(got["codes"]),
                                      want[start:start + size])
        start += size
    got = service.encode({"ids": ids.tolist()})   # 7 rows > max_batch
    np.testing.assert_array_equal(np.asarray(got["codes"]), want)


def test_no_batching_mode_still_serves():
    retriever, *_ = _build_retriever()
    service = RetrievalService(retriever, {}, batching=False)
    ids = _demo_ids(2)
    got = service.encode({"ids": ids.tolist()})
    want = retriever.encode_texts(ids).astype(int)
    np.testing.assert_array_equal(np.asarray(got["codes"]), want)
    assert service.healthz()["batching"]["enabled"] is False
    with pytest.raises(ServiceError, match="batch_size"):
        service.encode({"ids": ids.tolist(), "batch_size": 0})
    # empty input returns an empty code list instead of crashing _chunked
    assert service.encode({"ids": np.empty((0, retriever.cfg.max_words),
                                           int).tolist()})["codes"] == []


def test_images_jpeg_b64_roundtrip(server):
    """Raw JPEG/PNG bytes in, codes out: the server decodes with the same
    images_from_bytes helper the test calls directly (that helper's PIL
    parity is pinned in test_native_loader.py), so codes must agree
    bit-for-bit.  Undecodable payloads map to 400."""
    from PIL import Image

    from ccmh.data.dataset import images_from_bytes

    srv, service, retriever, _ = server
    rng = np.random.RandomState(11)
    res = TINY.image_resolution
    blobs = []
    for fmt, (w, h) in [("JPEG", (40, 30)), ("PNG", (res, res))]:
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format=fmt)
        blobs.append(buf.getvalue())

    got = _call(srv, "/v1/encode", {
        "images_jpeg_b64": [base64.b64encode(b).decode() for b in blobs]})
    want = retriever.encode_images(images_from_bytes(blobs, res))
    np.testing.assert_array_equal(np.asarray(got["codes"]), want.astype(int))

    # search accepts the same body
    got = _call(srv, "/v1/search", {
        "images_jpeg_b64": [base64.b64encode(blobs[0]).decode()], "k": 3})
    dist, idx = service.indexes["image"].search(want[:1], 3)
    np.testing.assert_array_equal(np.asarray(got["indices"]), idx)

    for bad_body, frag in [
        ({"images_jpeg_b64": [base64.b64encode(b"junk").decode()]},
         "not a decodable image"),
        ({"images_jpeg_b64": ["%%%not-base64%%%"]}, "not valid base64"),
        ({"images_jpeg_b64": "one-string-not-a-list"}, "list of base64"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as err:
            _call(srv, "/v1/encode", bad_body)
        assert err.value.code == 400
        assert frag in json.loads(err.value.read())["error"]
