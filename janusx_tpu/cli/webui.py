"""`jx webui` — minimal local results browser
(reference: python/janusx/ui/server.py — stdlib ThreadingHTTPServer)."""

from __future__ import annotations

import argparse
import html
import os
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer


def build_parser(prog="jx webui") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Browse analysis outputs")
    p.add_argument("-d", "--dir", type=str, default=".", help="results directory")
    p.add_argument("-port", "--port", type=int, default=8080)
    p.add_argument("-bind", "--bind", type=str, default="127.0.0.1")
    return p


def _index_html(root: str) -> str:
    rows = []
    for dirpath, _dirs, files in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        for f in sorted(files):
            if f.endswith((".tsv", ".png", ".json", ".nwk", ".log", ".Q", ".P")):
                href = os.path.join("" if rel == "." else rel, f)
                size = os.path.getsize(os.path.join(dirpath, f))
                rows.append(
                    f"<tr><td><a href='{html.escape(href)}'>{html.escape(href)}</a>"
                    f"</td><td>{size:,}</td></tr>"
                )
    return (
        "<html><head><title>janusx-tpu results</title>"
        "<style>body{font-family:sans-serif;margin:2em}"
        "table{border-collapse:collapse}td{padding:4px 12px;"
        "border-bottom:1px solid #ddd}</style></head><body>"
        "<h2>janusx-tpu results</h2><table><tr><th>file</th><th>bytes</th></tr>"
        + "".join(rows)
        + "</table></body></html>"
    )


class _Handler(SimpleHTTPRequestHandler):
    def do_GET(self):
        if self.path in ("/", "/index.html"):
            body = _index_html(self.directory).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        super().do_GET()

    def log_message(self, fmt, *args):
        pass


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    root = os.path.abspath(args.dir)
    handler = lambda *a, **kw: _Handler(*a, directory=root, **kw)
    srv = ThreadingHTTPServer((args.bind, args.port), handler)
    print(f"serving {root} at http://{args.bind}:{args.port}/ (Ctrl-C to stop)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0
