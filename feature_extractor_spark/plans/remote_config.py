"""S6: remote JSON config source/sink over HTTP (driver-side).

Reference parity (/root/reference/app/config_handler.py):

- ``remote_load_config`` (:129-140): GET the config JSON, optional basic
  auth; returns the parsed dict, or None + a stderr message on any failure.
- ``remote_save_config`` (:114-127): POST the config as a form-encoded
  ``json_config`` field with basic auth; returns True/False.
- ``remote_log`` (:142-159): POST ``json_config`` + ``json_result``.

Implemented with the stdlib (urllib) — no third-party HTTP client. These
are pure driver-side calls (config fetch happens once, before any Spark
job); nothing here touches executors, so there is no serialization or
scale concern. The wiring mirrors the reference's main.py: a
``--remote_load_config URL`` replaces the file layer (main.py:48-50), and
a ``remote_save_config`` key in the merged config triggers a save after
the merge (main.py:124-127).
"""

from __future__ import annotations

import base64
import json
import sys
import urllib.error
import urllib.parse
import urllib.request

_TIMEOUT = 10.0


def _basic_auth_header(username: str, password: str) -> str:
    token = base64.b64encode(f"{username}:{password}".encode()).decode("ascii")
    return f"Basic {token}"


def remote_load_config(
    url: str, username: str | None = None, password: str | None = None
) -> dict | None:
    """GET a JSON config. Returns the dict, or None on any failure (with a
    message on stderr) — same contract as the reference (it never raises,
    the caller falls back to the other config layers)."""
    req = urllib.request.Request(url, method="GET")
    if username and password:
        req.add_header("Authorization", _basic_auth_header(username, password))
    try:
        with urllib.request.urlopen(req, timeout=_TIMEOUT) as resp:
            if not 200 <= resp.status < 300:
                raise urllib.error.HTTPError(
                    url, resp.status, "bad status", resp.headers, None
                )
            return json.loads(resp.read().decode("utf-8"))
    except Exception as e:  # noqa: BLE001 — parity: swallow, report, None
        print(f"Failed to load remote configuration: {e}", file=sys.stderr)
        return None


def _post_form(
    url: str, fields: dict[str, str], username: str | None, password: str | None
) -> bool:
    body = urllib.parse.urlencode(fields).encode("utf-8")
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", "application/x-www-form-urlencoded")
    if username and password:
        req.add_header("Authorization", _basic_auth_header(username, password))
    with urllib.request.urlopen(req, timeout=_TIMEOUT) as resp:
        if not 200 <= resp.status < 300:
            raise urllib.error.HTTPError(
                url, resp.status, "bad status", resp.headers, None
            )
    return True


# credential keys never serialized into a POSTed body (the reference posts
# them verbatim — a leak into server logs we deliberately do NOT reproduce)
_CREDENTIAL_KEYS = ("password", "username")


def _strip_credentials(config: dict) -> dict:
    return {k: v for k, v in config.items() if k not in _CREDENTIAL_KEYS}


def remote_save_config(
    config: dict, url: str, username: str | None = None, password: str | None = None
) -> bool:
    """POST the config as form field ``json_config`` (reference
    config_handler.py:114-127). True on 2xx, else False + stderr.
    Credentials (username/password keys merged from CLI args) are stripped
    from the posted body — auth goes in the Authorization header only."""
    try:
        return _post_form(
            url,
            {"json_config": json.dumps(_strip_credentials(config))},
            username,
            password,
        )
    except Exception as e:  # noqa: BLE001
        print(f"Failed to save remote configuration: {e}", file=sys.stderr)
        return False


def remote_log(
    config: dict,
    debug_info: dict,
    url: str,
    username: str | None = None,
    password: str | None = None,
) -> bool:
    """POST ``json_config`` + ``json_result`` (reference
    config_handler.py:142-159). True on 2xx, else False + stderr."""
    try:
        return _post_form(
            url,
            {
                "json_config": json.dumps(_strip_credentials(config)),
                "json_result": json.dumps(debug_info),
            },
            username,
            password,
        )
    except Exception as e:  # noqa: BLE001
        print(f"Failed to log remote information: {e}", file=sys.stderr)
        return False
