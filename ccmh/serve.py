"""HTTP serving daemon for cross-modal hash retrieval.

The reference stops at offline eval (``test()`` re-encodes splits and dumps
``.mat`` files, train/base.py:277-323); deployment is left to the user.
This module is the missing production front-end: a thread-per-request JSON
HTTP service (stdlib ``http.server`` — zero new dependencies) over the
device-resident serving stack (:class:`ccmh.retrieval.Retriever` +
:class:`ccmh.retrieval.HashIndex`).

Endpoints (all JSON):

* ``GET  /healthz`` — liveness + model/gallery metadata.
* ``POST /v1/encode`` — ``{"texts": [...]}`` or ``{"images": [[...]]}``
  (nested lists, CLIP-normalized NHWC) or ``{"images_b64": "<base64 .npy>"}``
  → ``{"codes": [[±1, ...]]}``.
* ``POST /v1/search`` — an encode body plus ``{"k": 10, "index": "image"}``
  → ``{"indices": [[...]], "distances": [[...]]}`` (exact Hamming top-k,
  the stable tie order of the exact eval path).
* ``POST /v1/add`` — ``{"index": "image", "codes": [[...]]}`` or an encode
  body → appends to the gallery via the streaming ``HashIndex.add``
  (on-device slice update, no rebuild/recompile) → new gallery size.

Device work is serialized with a lock: one jitted encode/search at a time
keeps per-request latency predictable on a single chip (XLA programs are
not preemptible anyway); the HTTP layer stays threaded so slow clients
don't block encode-ready ones.

Start: ``python -m ccmh.serve --method DSPH --pretrained ckpt.npz
--gallery codes.mat --port 8080`` (see ``--help``; any checkpoint form the
Trainer accepts — reference ``.pth``, orbax dir, ``.npz`` — works, plus a
saved ``HashIndex.save`` gallery for instant restarts).
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["RetrievalService", "serve", "main"]


class ServiceError(ValueError):
    """Client error -> HTTP 400 with a JSON message."""


class RetrievalService:
    """Request-level logic, HTTP-free (reused by tests and custom hosts).

    ``indexes`` maps name -> :class:`HashIndex`; the conventional names are
    ``"image"`` (searched by text queries) and ``"text"``.
    """

    def __init__(self, retriever, indexes: Optional[Dict[str, Any]] = None):
        self.retriever = retriever
        self.indexes: Dict[str, Any] = dict(indexes or {})
        self._device_lock = threading.Lock()

    # ------------------------------------------------------------- requests
    def healthz(self) -> Dict[str, Any]:
        cfg = self.retriever.cfg
        return {
            "ok": True,
            "method": cfg.method,
            "output_dim": cfg.output_dim,
            "max_words": cfg.max_words,
            "resolution": self.retriever.clip_cfg.image_resolution,
            "indexes": {name: len(ix) for name, ix in self.indexes.items()},
        }

    def _queries(self, body: Dict[str, Any]) -> np.ndarray:
        """Encode whichever modality the body carries -> ±1 codes."""
        given = [k for k in ("texts", "ids", "images", "images_b64")
                 if k in body]
        if len(given) != 1:
            raise ServiceError(
                "provide exactly one of 'texts', 'ids', 'images', "
                f"'images_b64' (got {given or 'none'})")
        bs = int(body.get("batch_size", 256))
        with self._device_lock:
            if "texts" in body:
                texts = body["texts"]
                if (not isinstance(texts, list)
                        or not all(isinstance(t, str) for t in texts)):
                    raise ServiceError("'texts' must be a list of strings")
                return self.retriever.encode_texts(texts, batch_size=bs)
            if "ids" in body:  # pre-tokenized [B, max_words]
                ids = np.asarray(body["ids"], np.int32)
                if ids.ndim != 2:
                    raise ServiceError("'ids' must be [B, max_words]")
                return self.retriever.encode_texts(ids, batch_size=bs)
            arr = (_decode_npy_b64(body["images_b64"])
                   if "images_b64" in body
                   else np.asarray(body["images"], np.float32))
            res = self.retriever.clip_cfg.image_resolution
            if arr.ndim != 4 or arr.shape[1:] != (res, res, 3):
                raise ServiceError(
                    f"'images' must be [B, {res}, {res}, 3] CLIP-normalized "
                    f"NHWC (got {list(arr.shape)})")
            return self.retriever.encode_images(arr, batch_size=bs)

    def encode(self, body: Dict[str, Any]) -> Dict[str, Any]:
        codes = self._queries(body)
        return {"codes": codes.astype(int).tolist()}

    def search(self, body: Dict[str, Any]) -> Dict[str, Any]:
        index = self._index(body.get("index", "image"))
        k = int(body.get("k", 10))
        if not 1 <= k <= len(index):
            raise ServiceError(f"k must be in [1, {len(index)}] (got {k})")
        codes = self._queries(body)
        with self._device_lock:
            dist, idx = index.search(codes, k)
        return {"indices": idx.tolist(), "distances": dist.tolist()}

    def add(self, body: Dict[str, Any]) -> Dict[str, Any]:
        name = body.get("index", "image")
        codes = (np.asarray(body["codes"], np.float32)
                 if "codes" in body else self._queries(body))
        with self._device_lock:
            index = self.indexes.get(name)
            if index is None:
                # bootstrap: a daemon started without --gallery grows its
                # first index from the first /v1/add
                from ccmh.retrieval import HashIndex

                self.indexes[name] = HashIndex(
                    codes, **self.retriever._index_kw())
            else:
                index.add(codes)
        return {"index": name, "size": len(self.indexes[name])}

    def _index(self, name: str):
        try:
            return self.indexes[name]
        except KeyError:
            raise ServiceError(
                f"no index {name!r} (have {sorted(self.indexes)})") from None

    ROUTES = {"/v1/encode": encode, "/v1/search": search, "/v1/add": add}


def _decode_npy_b64(payload: str) -> np.ndarray:
    try:
        arr = np.load(io.BytesIO(base64.b64decode(payload)),
                      allow_pickle=False)
    except Exception as exc:
        raise ServiceError(f"images_b64 is not a base64 .npy: {exc}") from None
    return np.asarray(arr, np.float32)


class _Handler(BaseHTTPRequestHandler):
    service: RetrievalService   # set by serve()

    # quiet by default; the daemon logs through its own logger
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def _reply(self, code: int, payload: Dict[str, Any]) -> None:
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # noqa: N802
        if self.path == "/healthz":
            self._reply(200, self.service.healthz())
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        handler = RetrievalService.ROUTES.get(self.path)
        if handler is None:
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            if not isinstance(body, dict):
                raise ServiceError("request body must be a JSON object")
            self._reply(200, handler(self.service, body))
        except ServiceError as exc:
            self._reply(400, {"error": str(exc)})
        except Exception as exc:  # noqa: BLE001 — keep the daemon alive
            self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})


def serve(service: RetrievalService, host: str = "127.0.0.1",
          port: int = 8080) -> ThreadingHTTPServer:
    """Bind and return the server (caller runs ``serve_forever``; tests run
    it on a daemon thread with ``port=0`` for an ephemeral port)."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None) -> int:
    import argparse

    from ccmh.config import Config
    from ccmh.retrieval import HashIndex, Retriever

    ap = argparse.ArgumentParser(
        description="cross-modal hash retrieval HTTP daemon")
    ap.add_argument("--method", required=True)
    ap.add_argument("--pretrained", required=True,
                    help="checkpoint: .npz / orbax state_ckpt dir / "
                         "reference model-<e>.pth")
    ap.add_argument("--clip-path", default="",
                    help="converted CLIP weights (decides the architecture)")
    ap.add_argument("--clip-arch", default="vit-b-32",
                    choices=["vit-b-32", "tiny"],
                    help="architecture when --clip-path is empty (tiny = "
                         "the test-scale tower, matching ccmh.cli "
                         "--clip-arch tiny checkpoints)")
    ap.add_argument("--output-dim", type=int, default=64)
    ap.add_argument("--nclass", type=int, default=80)
    ap.add_argument("--max-words", type=int, default=32)
    ap.add_argument("--gallery", default="",
                    help="image gallery: a HashIndex.save .npz, a PR_cruve "
                         ".mat (field r_img), or empty to start with no "
                         "index and fill via /v1/add")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--compilation-cache", default="",
                    help="persistent XLA compile cache dir (fast restarts)")
    args = ap.parse_args(argv)

    cfg = Config(method=args.method, output_dim=args.output_dim,
                 nclass=args.nclass, max_words=args.max_words,
                 pretrained=args.pretrained, clip_path=args.clip_path,
                 compilation_cache=args.compilation_cache)
    clip_cfg = None
    if not args.clip_path and args.clip_arch == "tiny":
        from ccmh.clip.model import ClipConfig

        clip_cfg = ClipConfig.tiny()
    retriever = Retriever.from_pretrained(cfg, clip_cfg=clip_cfg)
    indexes: Dict[str, Any] = {}
    if args.gallery.endswith(".mat"):
        indexes["image"] = HashIndex.from_mat(args.gallery,
                                              **retriever._index_kw())
    elif args.gallery:
        indexes["image"] = HashIndex.load(args.gallery,
                                          **retriever._index_kw())
    server = serve(RetrievalService(retriever, indexes),
                   args.host, args.port)
    print(f"serving {args.method} ({args.output_dim} bits) on "
          f"http://{args.host}:{server.server_address[1]}  "
          f"(indexes: { {k: len(v) for k, v in indexes.items()} })")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
