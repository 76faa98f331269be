"""In-process mock DynamoDB speaking the real DynamoDB_20120810 JSON
protocol over HTTP (X-Amz-Target dispatch, typed attribute values,
``__type`` error marshalling) — boto3 points at it via endpoint_url.

Condition expressions are evaluated atomically with the write under
the server lock, supporting exactly the two shapes the Iceberg
catalog (and iceberg-aws) uses:

    attribute_not_exists(identifier)        -- create-if-absent
    v = :expected_v                         -- version CAS on commit

plus scan FilterExpressions of the forms the catalog's listings send.
Anything else raises ValidationException so an accidental widening of
the client's expression surface fails loudly here instead of silently
passing a fake.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class DynamoState:
    def __init__(self) -> None:
        # key: (identifier, namespace) -> item (typed attr dict)
        self.items: dict[tuple[str, str], dict] = {}
        self.lock = threading.Lock()
        self.calls: list[str] = []
        # Scan page size (items READ per page, before filtering — the
        # real 1MB-page behavior where a page can return zero matches
        # plus LastEvaluatedKey). None = unpaginated.
        self.page_size: int | None = None


class _DynamoError(Exception):
    def __init__(self, etype: str, message: str):
        super().__init__(message)
        self.etype = f"com.amazonaws.dynamodb.v20120810#{etype}"
        self.message = message


def _key_of(key: dict) -> tuple[str, str]:
    return key["identifier"]["S"], key["namespace"]["S"]


class _Ops:
    def __init__(self, state: DynamoState):
        self.s = state

    def GetItem(self, body):
        item = self.s.items.get(_key_of(body["Key"]))
        return {"Item": item} if item is not None else {}

    def PutItem(self, body):
        item = body["Item"]
        key = _key_of(item)
        cond = body.get("ConditionExpression")
        if cond is not None:
            if cond == "attribute_not_exists(identifier)":
                if key in self.s.items:
                    raise _DynamoError(
                        "ConditionalCheckFailedException",
                        "The conditional request failed",
                    )
            elif cond == "v = :expected_v":
                cur = self.s.items.get(key)
                want = body["ExpressionAttributeValues"][":expected_v"]
                if cur is None or cur.get("v") != want:
                    raise _DynamoError(
                        "ConditionalCheckFailedException",
                        "The conditional request failed",
                    )
            else:
                raise _DynamoError(
                    "ValidationException", f"unsupported condition {cond!r}"
                )
        self.s.items[key] = item
        return {}

    def DeleteItem(self, body):
        self.s.items.pop(_key_of(body["Key"]), None)
        return {}

    def Scan(self, body):
        filt = body.get("FilterExpression", "")
        names = body.get("ExpressionAttributeNames", {})
        values = body.get("ExpressionAttributeValues", {})

        def resolve(token: str) -> str:
            return names.get(token, token)

        ordered = sorted(self.s.items.items())
        start = 0
        esk = body.get("ExclusiveStartKey")
        if esk is not None:
            k = (esk["identifier"]["S"], esk["namespace"]["S"])
            start = next(
                (i + 1 for i, (key, _) in enumerate(ordered) if key == k), 0
            )
        page = ordered[start:]
        last_key = None
        if self.s.page_size is not None and len(page) > self.s.page_size:
            page = page[: self.s.page_size]
            lk = page[-1][0]
            last_key = {"identifier": {"S": lk[0]}, "namespace": {"S": lk[1]}}

        out = []
        for (ident, ns), item in page:
            if not filt:
                out.append(item)
            elif filt == "identifier = :marker":
                if ident == values[":marker"]["S"]:
                    out.append(item)
            elif (
                filt == "#n = :ns AND identifier <> :marker"
                and resolve("#n") == "namespace"
            ):
                if ns == values[":ns"]["S"] and ident != values[":marker"]["S"]:
                    out.append(item)
            else:
                raise _DynamoError(
                    "ValidationException", f"unsupported filter {filt!r}"
                )
        reply = {"Items": out, "Count": len(out)}
        if last_key is not None:
            reply["LastEvaluatedKey"] = last_key
        return reply


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        target = self.headers.get("X-Amz-Target", "")
        op = target.split(".")[-1]
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n) or b"{}")
        state: DynamoState = self.server.state
        ops = _Ops(state)
        with state.lock:
            state.calls.append(op)
            try:
                fn = getattr(ops, op, None)
                if fn is None:
                    raise _DynamoError("ValidationException", f"unknown op {op}")
                code, payload = 200, fn(body)
            except _DynamoError as e:
                code, payload = 400, {"__type": e.etype, "message": e.message}
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/x-amz-json-1.0")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


class MockDynamoServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self):
        self.state = DynamoState()
        super().__init__(("127.0.0.1", 0), _Handler)
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"

    def stop(self) -> None:
        self.shutdown()
        self.server_close()
