"""In-browser live progressive view (the reference GUI's live window,
re-imagined for a headless TPU host).

The reference opens a GLFW/ImGui window and re-uploads the accumulated
frame every iteration (main.cpp:60-600, 576-577).  A TPU pod has no
display, but it always has a port: :class:`LiveServer` is a zero-dependency
``http.server`` thread that serves

- ``/``          — a dark page with the frame ``<img>`` refreshed ~1/s
- ``/frame.png`` — the latest tonemapped accumulation (re-encoded by the
                   render loop via :func:`path_tracing_tpu.film.encode_png`)
- ``/meta.json`` — ``{"iter": N}`` so the page can show progress

The render loop calls :meth:`LiveServer.update` with fresh PNG bytes after
every iteration; requests never touch JAX state (bytes are swapped under a
lock), so a slow/absent viewer cannot stall the render.  Wired behind the
CLI's ``--live-http PORT`` next to ``--live`` (file) and ``--live-term``
(ANSI) — together they replace the GUI's observable outputs (SURVEY.md §2
component 21).
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = b"""<!doctype html>
<html><head><title>path_tracing_tpu live</title><style>
body { background:#111; color:#ccc; font-family:monospace; text-align:center }
img { image-rendering:pixelated; max-width:95vw; max-height:85vh;
      border:1px solid #333; margin-top:1em }
</style></head><body>
<div id="s">waiting for first frame...</div>
<img id="f" src="/frame.png">
<script>
setInterval(async () => {
  const m = await (await fetch('/meta.json')).json();
  document.getElementById('s').textContent = 'iteration ' + m.iter;
  document.getElementById('f').src = '/frame.png?i=' + m.iter;
}, 1000);
</script></body></html>
"""


class LiveServer:
    """Background HTTP server publishing the latest rendered frame."""

    def __init__(self, port: int, host: str | None = None):
        if host is None:
            # default loopback: the frames are unauthenticated, so binding
            # all interfaces must be an explicit opt-in (for viewing from
            # another machine set PT_TPU_HTTP_HOST=0.0.0.0 or ssh -L)
            import os

            host = os.environ.get("PT_TPU_HTTP_HOST", "127.0.0.1")
        self._lock = threading.Lock()
        self._png: bytes = b""
        self._iter = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr spam
                pass

            def do_GET(self):
                path = self.path.split("?", 1)[0]
                if path == "/frame.png":
                    with outer._lock:
                        body = outer._png
                    if not body:
                        self.send_error(404, "no frame yet")
                        return
                    ctype = "image/png"
                elif path == "/meta.json":
                    with outer._lock:
                        body = json.dumps({"iter": outer._iter}).encode()
                    ctype = "application/json"
                elif path == "/":
                    body, ctype = _PAGE, "text/html"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    @property
    def host(self) -> str:
        return self._httpd.server_address[0]

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def update(self, png_bytes: bytes, iteration: int) -> None:
        with self._lock:
            self._png = png_bytes
            self._iter = iteration

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
