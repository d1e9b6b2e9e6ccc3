"""Recorded-session tests for the real REST/GraphQL transport
(S7–S12): a requests.Session-shaped fake scripts status codes and
bodies per (method, path), records every call, and the transport is
exercised both directly and through ``run_sink``. No sockets — the
reference's live-API test (tests/set-field-value.js) is the
anti-pattern this replaces."""

from __future__ import annotations

import json

import pytest

from trello_github_etl_spark.sources.rest_sink import (
    GraphQLError,
    RateLimited,
    SinkConfig,
    http_transport,
    run_sink,
)


class FakeResponse:
    def __init__(self, status_code: int, body):
        self.status_code = status_code
        self._body = body

    def json(self):
        return self._body


class FakeSession:
    """Scripted session: pops the next response for (method, path);
    records every request it sees."""

    def __init__(self, script):
        # script: list of (method, path, response)
        self.script = list(script)
        self.calls = []

    def request(self, method, url, headers=None, json=None):
        path = url.split("api.github.example", 1)[-1]
        self.calls.append(
            {"method": method, "path": path, "headers": headers, "json": json}
        )
        for i, (m, p, resp) in enumerate(self.script):
            if m == method and p == path:
                self.script.pop(i)
                return resp
        raise AssertionError(f"unscripted request {method} {path}")


BASE = "https://api.github.example"


def _transport(script):
    session = FakeSession(script)
    t = http_transport(
        session, owner="acme", repo="widgets", token="tok-123", base_url=BASE
    )
    return t, session


def test_create_issue_posts_reference_shape():
    t, session = _transport(
        [("POST", "/repos/acme/widgets/issues", FakeResponse(201, {"number": 7}))]
    )
    out = t(
        {
            "op": "create_issue",
            "title": "T",
            "body": "B",
            "assignees": ["alice"],
        }
    )
    assert out == {"number": 7}
    call = session.calls[0]
    # path + body per lib/gh.js:193-195, headers per lib/gh.js:25-28
    assert call["json"] == {"title": "T", "body": "B", "assignees": ["alice"]}
    assert call["headers"]["accept"] == "application/vnd.github.v3+json"
    assert call["headers"]["Authorization"] == "token tok-123"


def test_update_issue_patches_and_drops_absent_fields():
    t, session = _transport(
        [
            (
                "PATCH",
                "/repos/acme/widgets/issues/42",
                FakeResponse(200, {"number": 42}),
            )
        ]
    )
    t({"op": "update_issue", "issue_number": 42, "body": "new", "state": "closed"})
    assert session.calls[0]["json"] == {"body": "new", "state": "closed"}


def test_graphql_errors_raise():
    t, _ = _transport(
        [
            (
                "POST",
                "/graphql",
                FakeResponse(200, {"errors": [{"message": "bad"}]}),
            )
        ]
    )
    with pytest.raises(GraphQLError):
        t({"op": "graphql", "query": "query { x }", "variables": {}})


def test_add_to_project_mutation_shape():
    body = {
        "data": {"addProjectNextItem": {"projectNextItem": {"id": "ITEM_1"}}}
    }
    t, session = _transport([("POST", "/graphql", FakeResponse(200, body))])
    out = t(
        {
            "op": "add_to_project",
            "project_id": "PROJ_1",
            "issue_node_id": "ISSUE_1",
        }
    )
    assert out == {"id": "ITEM_1"}
    sent = session.calls[0]["json"]
    assert "addProjectNextItem" in sent["query"]  # lib/gh.js:348-367
    assert sent["variables"] == {"projectId": "PROJ_1", "issueId": "ISSUE_1"}


def test_set_field_value_stringifies():
    body = {
        "data": {
            "updateProjectNextItemField": {"projectNextItem": {"id": "I"}}
        }
    }
    t, session = _transport([("POST", "/graphql", FakeResponse(200, body))])
    t(
        {
            "op": "set_field_value",
            "project_id": "P",
            "item_id": "I",
            "field_id": "F",
            "value": 0.5,  # setDashAmount's value.toString(), lib/gh.js:488-494
        }
    )
    assert session.calls[0]["json"]["variables"]["value"] == "0.5"


def test_get_or_create_repo_404_falls_back_to_create():
    t, session = _transport(
        [
            ("GET", "/repos/acme/newrepo", FakeResponse(404, {"message": "nf"})),
            ("POST", "/orgs/acme/repos", FakeResponse(201, {"name": "newrepo"})),
        ]
    )
    out = t({"op": "get_or_create_repo", "name": "newrepo"})
    assert out == {"name": "newrepo"}
    assert [c["method"] for c in session.calls] == ["GET", "POST"]


def test_get_or_create_repo_existing_skips_create():
    t, session = _transport(
        [("GET", "/repos/acme/widgets", FakeResponse(200, {"name": "widgets"}))]
    )
    out = t({"op": "get_or_create_repo", "name": "widgets"})
    assert out == {"name": "widgets"}
    assert len(session.calls) == 1


def test_secondary_rate_limit_maps_to_ratelimited():
    t, _ = _transport(
        [
            (
                "POST",
                "/repos/acme/widgets/issues",
                FakeResponse(
                    403,
                    {"message": "You have exceeded a secondary rate limit."},
                ),
            )
        ]
    )
    with pytest.raises(RateLimited):
        t({"op": "create_issue", "title": "T"})


def test_other_http_errors_are_fatal():
    t, _ = _transport(
        [
            (
                "POST",
                "/repos/acme/widgets/issues",
                FakeResponse(500, {"message": "boom"}),
            )
        ]
    )
    with pytest.raises(RuntimeError, match="not ok: 500"):
        t({"op": "create_issue", "title": "T"})


def test_run_sink_drives_transport_with_backoff(spark, tmp_path):
    """End-to-end: a 2-row plan through run_sink with the real
    transport; first POST hits the secondary rate limit, the ST4
    backoff retries it, both issues land. The session script is the
    'recorded session'."""
    log = str(tmp_path / "calls.jsonl")

    # foreachPartition pickles the transport; everything it needs is
    # defined inside (cloudpickle serializes locals by value — the
    # test module itself may not be importable on a worker).
    def transport(payload, _log=log):
        import json as _json

        from trello_github_etl_spark.sources.rest_sink import (
            http_transport as _ht,
        )

        with open(_log, "a") as f:
            f.write(_json.dumps(payload) + "\n")
        # replay: first call of entity 0 is rate-limited exactly once
        n_prior = sum(
            1
            for line in open(_log)
            if _json.loads(line).get("entity_id") == payload["entity_id"]
        )
        limited = n_prior == 1 and payload["entity_id"] == "0"

        class _Resp:
            def __init__(self, code, body):
                self.status_code, self._body = code, body

            def json(self):
                return self._body

        class _Session:
            def request(self, method, url, headers=None, json=None):
                assert method == "POST" and url.endswith(
                    "/repos/acme/widgets/issues"
                )
                if limited:
                    return _Resp(
                        403, {"message": "secondary rate limit, slow down"}
                    )
                return _Resp(201, {"number": 1})

        real = _ht(
            _Session(),
            owner="acme",
            repo="widgets",
            base_url="https://api.github.example",
        )
        real(
            {
                "op": "create_issue",
                "title": payload["title"],
                "body": None,
                "assignees": [],
            }
        )

    def fake_sleep(seconds, _log=log):
        import json as _json

        with open(_log, "a") as f:
            f.write(_json.dumps({"slept": seconds}) + "\n")

    df = spark.createDataFrame(
        [("0", "first"), ("1", "second")], "entity_id string, title string"
    ).orderBy("entity_id")
    run_sink(
        df,
        transport,
        SinkConfig(sleep_s=0.0, backoff_start_s=7.0),
        sleep=fake_sleep,
    )
    events = [json.loads(line) for line in open(log)]
    calls = [e["entity_id"] for e in events if "entity_id" in e]
    # entity 0 attempted twice (rate limited then retried), entity 1 once
    assert calls == ["0", "0", "1"]
    # the ST4 backoff slept between entity 0's two attempts
    assert [e["slept"] for e in events if "slept" in e].count(7.0) == 1


def test_get_or_create_repo_rate_limit_maps_to_ratelimited():
    """The GET leg must route secondary-rate-limit responses into the
    sink's backoff contract, same as every other request."""
    t, _ = _transport(
        [
            (
                "GET",
                "/repos/acme/widgets",
                FakeResponse(
                    403, {"message": "secondary rate limit hit"}
                ),
            )
        ]
    )
    with pytest.raises(RateLimited):
        t({"op": "get_or_create_repo", "name": "widgets"})
