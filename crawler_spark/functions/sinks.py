"""Pipeline ping sink (D6) — ``pingPipeline`` (``CrawlerPet911/Utils.fs:
107-130``): POST ``{"cardIds": [...]}`` to the processing pipeline endpoint,
expect HTTP 201.

The reference hard-exits the whole process with code 4 when the ping fails
(``Program.fs:136-141``); here that policy belongs to the caller — the sink
raises :class:`PingError` and the newcards driver decides (the metrics
table / crawl_log stands in when no pipeline endpoint is configured).

Network access is injectable (``opener``) so tests run hermetically; in the
sandbox there is no network at all, which is fine — the deterministic
corpus never needs a live ping.
"""

from __future__ import annotations

import json
import urllib.request


class PingError(RuntimeError):
    pass


def ping_pipeline(card_ids: list[str], endpoint: str = "http://127.0.0.1:5001/",
                  timeout_s: float = 10.0, opener=None) -> None:
    """POST the successfully-crawled card ids; raise PingError unless 201.

    ``opener`` defaults to urllib's; inject a fake for tests.
    """
    body = json.dumps({"cardIds": list(card_ids)}).encode("utf-8")
    req = urllib.request.Request(
        endpoint, data=body,
        headers={"Content-Type": "application/json"}, method="POST",
    )
    open_fn = opener or urllib.request.urlopen
    try:
        with open_fn(req, timeout=timeout_s) as resp:
            status = getattr(resp, "status", None) or resp.getcode()
    except PingError:
        raise
    except Exception as exc:  # transport failure
        raise PingError(f"pipeline ping failed: {exc}") from exc
    if status != 201:
        # Utils.fs:120-124: anything but 201 is a failure
        raise PingError(f"pipeline ping returned HTTP {status}, expected 201")
