"""Catalog resolution (mustInit analog): name→id resolution, settings
parsing, env-DSL validation, fail-fast diagnostics — all hermetic via
a scripted transport."""

from __future__ import annotations

import json

import pytest

from trello_github_etl_spark.sources.catalog import (
    REQUIRED_FIELD_SETTINGS,
    CatalogResolutionError,
    ResolvedCatalog,
    parse_board_lists_dsl,
    resolve_catalog,
)

FIELD_NAMES = {
    "dash_field": "Dash Bounty",
    "owner_field": "Owner",
    "fallback_owner_field": "Fallback Owner",
    "id_field": "Trello ID",
    "type_field": "Trello Type",
    "card_status_field": "Status",
    "card_type_field": "Trello Board Column",
    "labels_field": "Trello Labels",
    "task_parent_field": "Parent",
    "task_parent_link_field": "Parent Link",
    "task_type_field": "Task Type",
}

STATUS_SETTINGS = {
    "options": [
        {"id": "opt1", "name": "Pending"},
        {"id": "opt2", "name": "Considering"},
        {"id": "opt3", "name": "Done"},
    ]
}


def _fields_payload():
    nodes = [
        {
            "id": f"F{i}",
            "name": name,
            # 'settings' is ALWAYS at least 'null' (lib/gh.js:65)
            "settings": json.dumps(STATUS_SETTINGS)
            if name == "Status"
            else "null",
        }
        for i, name in enumerate(FIELD_NAMES.values())
    ]
    return {"data": {"node": {"fields": {"nodes": nodes}}}}


def _boards_payload():
    return {
        "data": {
            "organization": {
                "projectsNext": {
                    "nodes": [
                        {"id": "PROJ", "number": 7, "title": "My Board"},
                        {"id": "OTHER", "number": 8, "title": "Other"},
                    ]
                }
            }
        }
    }


def _transport(calls):
    def transport(payload):
        calls.append(payload)
        assert payload["op"] == "graphql"
        if "projectsNext" in payload["query"]:
            return _boards_payload()
        return _fields_payload()

    return transport


def test_resolves_all_names_to_ids():
    calls = []
    cat = resolve_catalog(
        _transport(calls),
        project_name="My Board",
        login="acme",
        field_names=FIELD_NAMES,
        board_lists_dsl="Concepts:Pending, None:Considering",
    )
    assert cat.project_id == "PROJ" and cat.project_number == 7
    assert set(cat.field_ids) == set(REQUIRED_FIELD_SETTINGS)
    assert cat.field_ids["card_status_field"] == cat.fields_by_name["Status"]["id"]
    assert cat.status_options == ("Pending", "Considering", "Done")
    # dual-keyed cache like the reference's fieldsCache (lib/gh.js:62-64)
    fid = cat.field_ids["owner_field"]
    assert cat.fields_by_id[fid]["name"] == "Owner"
    # settings parsed exactly once, null stays None
    assert cat.fields_by_name["Owner"]["settings"] is None
    # two catalog round-trips total: project query + fields query
    assert len(calls) == 2


def test_option_resolution_j12():
    cat = resolve_catalog(
        _transport([]), "My Board", "acme", FIELD_NAMES, ""
    )
    assert cat.option_id("Status", "Pending") == "opt1"
    with pytest.raises(KeyError, match="Considering"):
        cat.option_id("Status", "Nope")


def test_all_problems_reported_at_once():
    incomplete = dict(FIELD_NAMES)
    incomplete["dash_field"] = "No Such Field"
    del incomplete["task_type_field"]
    with pytest.raises(CatalogResolutionError) as ei:
        resolve_catalog(
            _transport([]),
            "My Board",
            "acme",
            incomplete,
            board_lists_dsl="X:NotAColumn",
        )
    msg = str(ei.value)
    # die-at-the-end: every problem in one exception (lib/gh.js:144-176)
    assert "NotAColumn" in msg
    assert "No Such Field" in msg
    assert "task_type_field" in msg


def test_unknown_project_fails():
    with pytest.raises(CatalogResolutionError, match="Nope"):
        resolve_catalog(_transport([]), "Nope", "acme", FIELD_NAMES, "")


def test_parse_board_lists_dsl():
    # F11 split semantics: commas and/or whitespace (lib/gh.js:78-81)
    assert parse_board_lists_dsl("A:B, C:D,E:F") == {
        "A": "B",
        "C": "D",
        "E": "F",
    }
    assert parse_board_lists_dsl("") == {}


def test_malformed_dsl_pair_is_diagnostic():
    with pytest.raises(CatalogResolutionError, match="malformed"):
        parse_board_lists_dsl("In Progress:Doing")  # space-split DSL limit
    with pytest.raises(CatalogResolutionError, match="malformed"):
        parse_board_lists_dsl("A:B:C")


def test_status_options_follow_configured_field_name():
    """Validation and resolution must agree on which field carries the
    board columns when the status field has a non-default name."""
    renamed = dict(FIELD_NAMES)
    renamed["card_status_field"] = "Pipeline State"

    def transport(payload):
        if "projectsNext" in payload["query"]:
            return _boards_payload()
        nodes = [
            {
                "id": f"F{i}",
                "name": ("Pipeline State" if name == "Status" else name),
                "settings": json.dumps(STATUS_SETTINGS)
                if name == "Status"
                else "null",
            }
            for i, name in enumerate(FIELD_NAMES.values())
        ]
        return {"data": {"node": {"fields": {"nodes": nodes}}}}

    cat = resolve_catalog(
        transport,
        "My Board",
        "acme",
        renamed,
        board_lists_dsl="Concepts:Pending",
    )
    assert cat.status_options == ("Pending", "Considering", "Done")
    assert "Pipeline State" in cat.fields_by_name
