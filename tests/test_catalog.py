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
    UnsupportedFieldError,
    parse_board_lists_dsl,
    prepare_field_update,
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


TRELLO_LABELS_SETTINGS = {
    # "Should be an enum (single select) with Meta, Completed, Paused"
    # (reference tests/set-field-value.js:19)
    "options": [
        {"id": "tl1", "name": "Meta"},
        {"id": "tl2", "name": "Completed"},
        {"id": "tl3", "name": "Paused"},
    ]
}


def _fields_payload():
    def settings(name):
        if name == "Status":
            return json.dumps(STATUS_SETTINGS)
        if name == "Trello Labels":
            return json.dumps(TRELLO_LABELS_SETTINGS)
        return "null"

    nodes = [
        {"id": f"F{i}", "name": name, "settings": settings(name)}
        for i, name in enumerate(FIELD_NAMES.values())
    ]
    # the project also exposes GitHub's built-in Labels field — present
    # in the fields listing, but not writable via the item mutation
    nodes.append({"id": "FLABELS", "name": "Labels", "settings": "null"})
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


def test_set_field_value_sequence_mirrors_reference():
    """The reference's live test sequence (tests/set-field-value.js):
    custom single-select writes resolve option names to ids; the
    plain "Status" write works; writing the BUILT-IN "Labels" field
    must FAIL (lines 22-32: 'Labels are not implemented')."""
    cat = resolve_catalog(_transport([]), "My Board", "acme", FIELD_NAMES, "")

    # "Trello Labels" → "Meta": option name resolved to its id
    p = prepare_field_update(cat, "ITEM1", "Trello Labels", "Meta")
    assert p["op"] == "set_field_value" and p["value"] == "tl1"
    assert p["field_id"] == cat.fields_by_name["Trello Labels"]["id"]
    assert p["project_id"] == "PROJ" and p["item_id"] == "ITEM1"

    # "Status" → "Done"
    assert prepare_field_update(cat, "ITEM1", "Status", "Done")["value"] == "opt3"

    # field addressable by id too (dual-keyed cache, lib/gh.js:436-437)
    fid = cat.fields_by_name["Owner"]["id"]
    assert prepare_field_update(cat, "ITEM1", fid, "alice")["value"] == "alice"

    # non-string values stringified (lib/gh.js:493) — JS toString
    # semantics, not Python str(): int-valued floats drop the ".0",
    # booleans lowercase, None is rejected (r4 advice)
    assert prepare_field_update(cat, "ITEM1", "Dash Bounty", 50)["value"] == "50"
    assert prepare_field_update(cat, "ITEM1", "Dash Bounty", 2.0)["value"] == "2"
    assert prepare_field_update(cat, "ITEM1", "Dash Bounty", 2.5)["value"] == "2.5"
    assert prepare_field_update(cat, "ITEM1", "Dash Bounty", True)["value"] == "true"
    with pytest.raises(ValueError, match="must not be None"):
        prepare_field_update(cat, "ITEM1", "Dash Bounty", None)

    # full JS Number.toString parity across format regimes (r5 review:
    # the first fix only covered int-valued floats in normal range)
    js_pairs = [
        (1e21, "1e+21"),          # integer-valued but >= 1e21: exponent
        (1.5e22, "1.5e+22"),
        (1e-7, "1e-7"),           # JS strips the exponent zero-pad
        (1.23e-7, "1.23e-7"),
        (0.000015, "0.000015"),   # [1e-6,1e-4): Python repr would be 1.5e-05
        (0.0001, "0.0001"),
        (float("nan"), "NaN"),
        (float("inf"), "Infinity"),
        (float("-inf"), "-Infinity"),
        (0.0, "0"),
        (-3.0, "-3"),
    ]
    for v, expect in js_pairs:
        got = prepare_field_update(cat, "ITEM1", "Dash Bounty", v)["value"]
        assert got == expect, f"{v!r}: {got!r} != {expect!r}"

    # built-in "Labels" write fails loudly — the negative assertion
    with pytest.raises(UnsupportedFieldError, match="Labels"):
        prepare_field_update(cat, "ITEM1", "Labels", "bug")
    # ...also when addressed by id
    with pytest.raises(UnsupportedFieldError, match="Labels"):
        prepare_field_update(cat, "ITEM1", "FLABELS", "bug")

    # unknown field: the reference's fieldsCache KeyError (lib/gh.js:434)
    with pytest.raises(KeyError, match="not found in catalog"):
        prepare_field_update(cat, "ITEM1", "No Such Field", "x")

    # unknown option for a single-select: available options in the error
    with pytest.raises(KeyError, match="Completed"):
        prepare_field_update(cat, "ITEM1", "Trello Labels", "Nope")


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
