"""GUI backend server.

Reference: GUI/deep_fir_server.py — a Flask app wrapping SISRInterface
with base64-image HTTP routes consumed by the Electron frontend:
/super_resolve, /super_resolve_and_crop, /super_resolve_bicubic(_and_crop),
/update_model, /test_page, plus a models.csv registry of selectable models.

Flask is not available in this image, so the same route/JSON contract is
served with the stdlib http.server — zero-dependency, same API — and the
Electron shell is replaced by a single static browser page (index.html,
served at "/") that consumes the same routes:

  POST /super_resolve          {"image": <b64 png>, "metadata": "..."}
                               -> {"output": <b64 png>, "runtime": s}
  POST /super_resolve_and_crop {..., "x","y","width","height"}
  POST /super_resolve_bicubic  {"image": <b64>} -> bicubic upsample
  POST /update_model           {"model": <name-from-models.csv>}
  GET  /test_page              -> liveness text
  GET  /models                 -> registry listing
"""

from __future__ import annotations

import base64
import io
import json
import os
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np
from PIL import Image


class ModelServer:
    def __init__(self, model_loc: str, models_csv: Optional[str] = None,
                 default_model: Optional[str] = None, scale: int = 4):
        self.model_loc = model_loc
        self.scale = scale
        self.registry: Dict[str, Dict] = {}
        if models_csv and os.path.isfile(models_csv):
            import pandas as pd
            df = pd.read_csv(models_csv)
            for _, row in df.iterrows():
                self.registry[row["name"]] = dict(row)
        self.interface = None
        if default_model:
            self.load_model(default_model)

    def load_model(self, name: str) -> None:
        from rumpy_tpu.interface import SISRInterface
        spec = self.registry.get(name, {"experiment": name})
        self.interface = SISRInterface(
            model_loc=self.model_loc, experiment=spec["experiment"],
            mode="eval", load_epoch=spec.get("epoch", "best"),
            no_directories=True)
        self.current_model = name

    # -- image helpers (deep_fir_server.py:21-82 equivalents) ----------

    @staticmethod
    def _decode_b64(b64_string: str) -> np.ndarray:
        raw = base64.b64decode(b64_string.split(",")[-1])
        img = Image.open(io.BytesIO(raw)).convert("RGB")
        return np.asarray(img).astype(np.float32) / 255.0

    @staticmethod
    def _encode_b64(img: np.ndarray) -> str:
        u8 = (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(u8).save(buf, "PNG")
        return base64.b64encode(buf.getvalue()).decode()

    @staticmethod
    def _parse_metadata(meta_string: Optional[str]) -> Optional[np.ndarray]:
        if not meta_string:
            return None
        vals = [float(v) for v in str(meta_string).replace(",", " ").split()]
        return np.asarray(vals, np.float32)[None]

    def bicubic(self, img: np.ndarray) -> np.ndarray:
        from rumpy_tpu.ops import resize
        u8 = (img * 255).astype(np.uint8)
        h, w = u8.shape[:2]
        out = np.asarray(resize.pil_resize(u8, (h * self.scale,
                                                w * self.scale)))
        return out.astype(np.float32) / 255.0

    def super_resolve(self, img: np.ndarray,
                      metadata: Optional[np.ndarray] = None):
        if self.interface is None:
            raise RuntimeError("No model loaded; POST /update_model first")
        inp = img
        if getattr(self.interface.model, "im_input", "") == "interp":
            inp = self.bicubic(img)
        t0 = time.perf_counter()
        # pad to 8-px buckets: arbitrary uploaded sizes must share
        # compiled programs, not trigger a fresh XLA compile each
        rgb, _, _, _ = self.interface.net_run_and_process(
            inp[None], metadata=metadata, pad_multiple=8)
        return rgb[0], time.perf_counter() - t0


def make_handler(server: ModelServer):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, payload, code=200):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                page = os.path.join(os.path.dirname(__file__), "index.html")
                with open(page, "rb") as f:
                    body = f.read()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/test_page":
                self._json({"status": "rumpy_tpu model server alive",
                            "model": getattr(server, "current_model", None)})
            elif self.path == "/models":
                self._json({"models": list(server.registry) or ["<by experiment name>"]})
            else:
                self._json({"error": "unknown route"}, 404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/update_model":
                    server.load_model(req["model"])
                    self._json({"status": "ok", "model": req["model"]})
                    return
                img = server._decode_b64(req["image"])
                if self.path.endswith("_and_crop"):
                    # the reference crops the INPUT selection first and
                    # super-resolves it (deep_fir_server.py:117-128) —
                    # x/y/width/height are input-space coordinates
                    x, y = int(req["x"]), int(req["y"])
                    w, h = int(req["width"]), int(req["height"])
                    img = img[y:y + h, x:x + w]
                if self.path.startswith("/super_resolve_bicubic"):
                    out = server.bicubic(img)
                    runtime = 0.0
                elif self.path.startswith("/super_resolve"):
                    meta = server._parse_metadata(req.get("metadata"))
                    out, runtime = server.super_resolve(img, meta)
                else:
                    self._json({"error": "unknown route"}, 404)
                    return
                self._json({"output": server._encode_b64(out),
                            "runtime": runtime})
            except Exception as e:  # surface errors to the frontend
                self._json({"error": str(e)}, 500)

    return Handler


def run_server(model_loc: str, port: int = 5000, **kwargs):
    server = ModelServer(model_loc, **kwargs)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(server))
    print(f"rumpy_tpu GUI backend on http://127.0.0.1:{port}")
    httpd.serve_forever()


if __name__ == "__main__":
    import sys
    run_server(sys.argv[1] if len(sys.argv) > 1 else ".",
               port=int(sys.argv[2]) if len(sys.argv) > 2 else 5000)
