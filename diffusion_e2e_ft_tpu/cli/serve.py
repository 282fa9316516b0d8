"""Minimal production-style inference server for depth / normal estimation.

A deployment surface the reference lacks: a threaded HTTP server wrapping a warm
jitted pipeline. Compiles once at startup (fixed processing resolution), then serves:

  POST /v1/depth    image body (png/jpeg) -> response
  POST /v1/normals  image body (png/jpeg) -> response
  GET  /healthz     readiness probe (200 once the model is compiled)

Response format by Accept header: `application/x-npy` (default, npy bytes) or
`image/png` (colorized visualization).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from diffusion_e2e_ft_tpu.cli.common import make_parser


def build_parser():
    p = make_parser(__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--processing_res", type=int, default=768)
    p.add_argument("--denoise_steps", type=int, default=1)
    p.add_argument("--half_precision", action="store_true")
    return p


class PipelineService:
    """Holds the warm pipeline; one device at a time (the jit graph serializes)."""

    def __init__(self, pipe, processing_res: int, denoise_steps: int):
        self.pipe = pipe
        self.processing_res = processing_res
        self.denoise_steps = denoise_steps
        self.lock = threading.Lock()
        self.ready = False

    def warmup(self):
        img = np.zeros((self.processing_res, self.processing_res, 3), np.uint8)
        self.predict(img, normals=False)
        self.ready = True

    def predict(self, rgb: np.ndarray, normals: bool):
        with self.lock:
            out = self.pipe(
                rgb,
                denoising_steps=self.denoise_steps,
                processing_res=self.processing_res,
                noise="zeros",
                normals=normals,
                color_map=None,
            )
        return out.normal_np if normals else out.depth_np


def make_handler(service: PipelineService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                code = 200 if service.ready else 503
                body = json.dumps({"ready": service.ready}).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path not in ("/v1/depth", "/v1/normals"):
                self.send_error(404)
                return
            normals = self.path.endswith("normals")
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self.send_error(400, "empty body")
                return
            data = self.rfile.read(length)
            try:
                from PIL import Image

                rgb = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            except Exception as e:
                self.send_error(400, f"bad image: {e}")
                return
            try:
                pred = service.predict(rgb, normals)
            except Exception as e:  # surfaced as a 500 with the message
                self.send_error(500, str(e))
                return

            accept = self.headers.get("Accept", "application/x-npy")
            if "image/png" in accept:
                from diffusion_e2e_ft_tpu.ops import image as im
                from PIL import Image

                if normals:
                    vis = im.colorize_normals(pred)
                else:
                    vis = (im.colorize_depth(pred, 0, 1) * 255).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(vis).save(buf, format="PNG")
                payload, ctype = buf.getvalue(), "image/png"
            else:
                buf = io.BytesIO()
                np.save(buf, pred)
                payload, ctype = buf.getvalue(), "application/x-npy"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    return Handler


def serve(service: PipelineService, host: str, port: int) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(service))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

    args = build_parser().parse_args(argv)
    dtype = jnp.bfloat16 if args.half_precision else jnp.float32
    pipe = MarigoldPipeline.from_hf_dir(args.checkpoint, dtype=dtype)
    service = PipelineService(pipe, args.processing_res, args.denoise_steps)
    server = serve(service, args.host, args.port)
    print(f"[serve] warming up at {args.host}:{args.port} ...", flush=True)
    service.warmup()
    print("[serve] ready", flush=True)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
