"""S6: remote JSON config over HTTP (reference app/config_handler.py:114-159)
against a real in-process HTTP server — load (with/without basic auth),
save (form-encoded json_config POST), log (json_config + json_result),
and the swallow-and-report failure contract."""

import base64
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from feature_extractor_spark.plans.remote_config import (
    remote_load_config,
    remote_log,
    remote_save_config,
)

CONFIG = {"window_size": 32, "latent_dim": 8, "encoder_plugin": "vae_small"}
USER, PASSWORD = "u1", "secret"


class _Handler(BaseHTTPRequestHandler):
    posts: list[tuple[str, dict]] = []

    def _authed(self) -> bool:
        expect = "Basic " + base64.b64encode(f"{USER}:{PASSWORD}".encode()).decode()
        return self.headers.get("Authorization") == expect

    def do_GET(self):
        if self.path == "/config":
            body = json.dumps(CONFIG).encode()
        elif self.path == "/private" and self._authed():
            body = json.dumps({"secret_cfg": True}).encode()
        elif self.path == "/private":
            self.send_response(401), self.end_headers()
            return
        else:
            self.send_response(404), self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        if not self._authed():
            self.send_response(401), self.end_headers()
            return
        n = int(self.headers.get("Content-Length", 0))
        fields = dict(urllib.parse.parse_qsl(self.rfile.read(n).decode()))
        _Handler.posts.append((self.path, fields))
        self.send_response(200), self.end_headers()

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_remote_load(server):
    assert remote_load_config(f"{server}/config") == CONFIG


def test_remote_load_basic_auth(server):
    assert remote_load_config(f"{server}/private", USER, PASSWORD) == {
        "secret_cfg": True
    }
    # wrong credentials -> None, not an exception (reference contract)
    assert remote_load_config(f"{server}/private", USER, "wrong") is None


def test_remote_load_failure_returns_none(server, capsys):
    assert remote_load_config(f"{server}/missing") is None
    assert remote_load_config("http://127.0.0.1:9/unroutable") is None
    assert "Failed to load remote configuration" in capsys.readouterr().err


def test_remote_save_posts_json_config(server):
    _Handler.posts.clear()
    assert remote_save_config(CONFIG, f"{server}/save", USER, PASSWORD) is True
    path, fields = _Handler.posts[-1]
    assert path == "/save"
    assert json.loads(fields["json_config"]) == CONFIG
    # unauthenticated -> False
    assert remote_save_config(CONFIG, f"{server}/save", USER, "bad") is False


def test_remote_log_posts_both_fields(server):
    _Handler.posts.clear()
    debug = {"mae": 0.123, "n_rows": 77}
    assert remote_log(CONFIG, debug, f"{server}/log", USER, PASSWORD) is True
    path, fields = _Handler.posts[-1]
    assert path == "/log"
    assert json.loads(fields["json_config"]) == CONFIG
    assert json.loads(fields["json_result"]) == debug


def test_pipeline_remote_layer_precedence(server):
    """--remote_load_config replaces the file layer; typed CLI flags still
    win over it (reference precedence chain)."""
    from feature_extractor_spark.plans.config import (
        DEFAULT_VALUES,
        merge_config,
        typed_flags_from_argv,
    )

    remote = remote_load_config(f"{server}/config")
    argv = ["--latent_dim", "99"]
    cfg = merge_config(
        defaults=DEFAULT_VALUES,
        file_config=remote,
        cli_args={"latent_dim": 99},
        typed_flags=typed_flags_from_argv(argv),
    )
    assert cfg["window_size"] == 32  # remote layer beat the default (144)
    assert cfg["latent_dim"] == 99  # typed CLI beat the remote layer


def test_remote_save_strips_credentials_from_body(server):
    """username/password merged from CLI args must never appear in the
    POSTed json_config (auth belongs in the Authorization header; the
    posted body lands in server-side logs)."""
    _Handler.posts.clear()
    leaky = dict(CONFIG, username=USER, password=PASSWORD)
    assert remote_save_config(leaky, f"{server}/save", USER, PASSWORD) is True
    _, fields = _Handler.posts[-1]
    posted = json.loads(fields["json_config"])
    assert "password" not in posted and "username" not in posted
    assert posted == CONFIG

    _Handler.posts.clear()
    assert remote_log(leaky, {"ok": 1}, f"{server}/log", USER, PASSWORD) is True
    _, fields = _Handler.posts[-1]
    posted = json.loads(fields["json_config"])
    assert "password" not in posted and "username" not in posted
