"""serve CLI: a batching JSON-over-HTTP front end for exported artifacts.

Stdlib-only (http.server) so the serving host needs nothing beyond jax +
numpy. One artifact per process; requests are padded to the artifact's
compiled shape buckets, so latency is flat and no request ever triggers
a compile.

    python -m fbk_fairseq_st_tpu.cli.serve exported/ --port 8000

With --batch-window-ms, instances from CONCURRENT requests are coalesced
into shared bucket dispatches by serving/batcher.py (TF-Serving-style
dynamic batching; identical outputs, measured per-request cost drops
toward cost/batch_size under load).

API:
    GET  /health           -> {"status": "ok"}
    GET  /stats            -> dynamic-batching dispatch counters
    GET  /meta             -> the artifact's meta.json
    POST /translate        body: {"instances": [INSTANCE...], "nbest": 1}
        INSTANCE (audio artifacts):  {"features": [[...frame floats...]...]}
        INSTANCE (text artifacts):   {"text": "raw source line"}
                                  or {"tokens": [int ids incl. eos]}
        -> {"predictions": [[{"text", "score", "tokens"}, ...] per instance]}
"""

from __future__ import annotations

import argparse
import json
import logging
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..serving.runtime import ServingModel

logger = logging.getLogger("fbk_fairseq_st_tpu.cli.serve")


def _instance_to_array(model: ServingModel, inst: dict) -> np.ndarray:
    if model.src_kind == "audio":
        if "features" not in inst:
            raise ValueError("audio artifact: instance needs 'features'")
        return np.asarray(inst["features"], np.float32)
    if "tokens" in inst:
        return np.asarray(inst["tokens"], np.int32)
    if "text" in inst:
        return model.encode_source(inst["text"])
    raise ValueError("text artifact: instance needs 'tokens' or 'text'")


def translate_payload(model: ServingModel, payload: dict,
                      batcher=None) -> dict:
    instances = payload.get("instances")
    if not isinstance(instances, list) or not instances:
        raise ValueError("payload needs a non-empty 'instances' list")
    nbest = int(payload.get("nbest", 1))
    arrays = [_instance_to_array(model, inst) for inst in instances]
    if batcher is not None:
        # cross-request dynamic batching: instances from concurrent
        # requests share one bucket dispatch (serving/batcher.py)
        results = batcher.submit_many(arrays, nbest=nbest)
    else:
        # adaptive chunking: width shrinks with each chunk's longest input
        results = model.translate_many(arrays, nbest=nbest)
    preds = [
        [
            {
                "text": h["text"],
                "score": h["score"],
                "tokens": np.asarray(h["tokens"]).tolist(),
            }
            for h in sent
        ]
        for sent in results
    ]
    return {"predictions": preds}


def make_handler(model: ServingModel, batcher=None):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, {"status": "ok"})
            elif self.path == "/stats":
                self._reply(200, {
                    "batching": batcher is not None,
                    "batches_dispatched": getattr(
                        batcher, "batches_dispatched", None),
                    "items_dispatched": getattr(
                        batcher, "items_dispatched", None),
                })
            elif self.path == "/meta":
                self._reply(200, model.meta)
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/translate":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                self._reply(
                    200, translate_payload(model, payload, batcher)
                )
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # surface server faults to the client
                logger.exception("translate failed")
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):
            logger.info("%s " + fmt, self.client_address[0], *args)

    return Handler


def main(args):
    logging.basicConfig(level=logging.INFO)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ..options import enable_compilation_cache

    enable_compilation_cache(args.jax_cache_dir)
    model = ServingModel.load(args.artifact)
    if not args.no_warmup:
        logger.info("warming up %d bucket(s)", len(model.meta["programs"]))
        model.warmup()
    batcher = None
    if args.batch_window_ms is not None:
        from ..serving.batcher import DynamicBatcher

        batcher = DynamicBatcher(model, window_ms=args.batch_window_ms)
        logger.info(
            "dynamic batching on: window=%.1fms, max items/dispatch=%d",
            args.batch_window_ms, batcher.max_items,
        )
    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(model, batcher)
    )
    logger.info("serving %s on %s:%d", args.artifact, args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        if batcher is not None:
            batcher.close()


def cli_main(input_args=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("artifact", help="exported artifact directory")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip executing each bucket once at startup")
    parser.add_argument("--batch-window-ms", type=float, default=None,
                        metavar="MS",
                        help="enable cross-request dynamic batching: wait "
                             "up to MS for concurrent instances to share "
                             "one bucket dispatch (0 = coalesce only what "
                             "queued while the previous dispatch ran)")
    parser.add_argument("--cpu", action="store_true",
                        help="serve on CPU instead of TPU")
    parser.add_argument("--jax-cache-dir", default=None,
                        help="enable XLA's persistent compilation cache "
                             "at this directory")
    main(parser.parse_args(input_args))


if __name__ == "__main__":
    cli_main()
