"""Driver-side GraphQL catalog resolution — the engine's "analyzer"
phase (SURVEY §2.8 Pipeline 3, §3 E1 step 2; reference
`lib/gh.js:48-190` ``mustInit``).

The reference resolves project + field *names* to GraphQL node ids
against the remote catalog at startup, validates the env-DSL board
columns, and mutates ``process.env`` with the resolved ids. Here the
same resolution is a pure function: transport in, an immutable
``ResolvedCatalog`` out — ready to broadcast to executors (the
Spark analog of the reference's global ``fieldsCache``), with
fail-fast diagnostics collected into one exception instead of
``process.exit(1)``.

Single-flight memoization of the project id (the reference's
``_id_promise``, lib/gh.js:305-332) falls out naturally: resolution
happens once on the driver; executors only ever see the frozen
result.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass, field

# The 11 field-name settings the reference requires (lib/gh.js:91-112,
# env names minus the _NAME suffix convention).
REQUIRED_FIELD_SETTINGS = (
    "dash_field",  # "Dash Bounty"
    "owner_field",  # "Owner"
    "fallback_owner_field",  # "Fallback Owner"
    "id_field",  # "Trello ID"
    "type_field",  # "Trello Type"
    "card_status_field",  # "Status"
    "card_type_field",  # "Trello Board Column"
    "labels_field",  # "Trello Labels"
    "task_parent_field",  # "Dash Incubator on Github"
    "task_parent_link_field",  # URL field
    "task_type_field",  # "Task Type"
)

GQL_PROJECT_BY_NAME = """
query($login: String!, $name: String) {
  organization(login: $login) {
    projectsNext(last: 100, query: $name) {
      nodes {
        id
        number
        title
      }
    }
  }
}"""  # lib/gh.js:266-290 (page cap last:100)

GQL_PROJECT_FIELDS = """
query($projectId: ID!) {
    node(id: $projectId) {
        ... on ProjectNext {
            fields(first: 100) {
                nodes {
                    id
                    name
                    settings
                }
            }
        }
    }
}"""  # lib/gh.js:397-426 (page cap first:100)


class CatalogResolutionError(RuntimeError):
    """All missing fields/columns reported at once (the reference
    prints the same diagnostics then process.exit(1),
    lib/gh.js:144-176)."""


class UnsupportedFieldError(RuntimeError):
    """Writing a built-in ProjectNext field that the
    updateProjectNextItemField mutation cannot set.

    The reference's only negative behavioral test
    (tests/set-field-value.js:22-32) asserts that writing the
    built-in "Labels" field FAILS — there it fails server-side with a
    GraphQL error; here the engine rejects it client-side, before any
    mutation is attempted, with the same outcome (a loud error) and a
    better message.  The custom "Trello Labels" field remains fully
    writable (same test, line 20).
    """


# Built-in ProjectNext fields updateProjectNextItemField cannot write
# (they are views over issue state, not project item columns).  The
# reference discovers this via a live server error; we reject up
# front so a 10M-row sink job fails in planning, not mid-write.
UNSUPPORTED_BUILTIN_FIELDS = frozenset(
    {"Labels", "Assignees", "Milestone", "Repository", "Reviewers",
     "Linked Pull Requests"}
)


@dataclass(frozen=True)
class ResolvedCatalog:
    """Broadcast-ready resolution result: tiny (KBs) by construction."""

    project_id: str
    project_number: int
    project_title: str
    field_ids: dict[str, str]  # setting key -> field node id
    fields_by_name: dict[str, dict]  # name -> {id, name, settings}
    fields_by_id: dict[str, dict]  # the reference's dual-keyed cache
    status_options: tuple[str, ...]  # board columns (Status options)
    option_ids: dict[tuple[str, str], str] = field(default_factory=dict)

    def option_id(self, field_name: str, option_name: str) -> str:
        """J12: single-select option-name → option-id
        (lib/gh.js:440-452), raising with the available options."""
        key = (field_name, option_name)
        if key not in self.option_ids:
            have = [n for (f, n) in self.option_ids if f == field_name]
            raise KeyError(
                f"no option {option_name!r} for field {field_name!r}; "
                f"have {sorted(have)}"
            )
        return self.option_ids[key]


def parse_board_lists_dsl(dsl: str) -> dict[str, str]:
    """`"Concepts:Pending, None:Considering"` → {trello: github}
    (F11, lib/transform.js:89-94 / lib/gh.js:78-81).

    The DSL splits on commas AND whitespace (reference semantics), so
    names containing spaces are inexpressible in it — a pair that
    does not parse as exactly `name:name` raises a diagnostic
    ``CatalogResolutionError`` instead of the reference's silent
    misparse (its `split(":")[1]` would also swallow a third field).
    """
    out = {}
    for pair in [p for p in re.split(r"[,\s]+", dsl) if p]:
        parts = pair.split(":")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise CatalogResolutionError(
                f"malformed board-lists pair {pair!r} (expected "
                "'TrelloList:GithubColumn'; names with spaces are "
                "inexpressible in this whitespace-splitting DSL)"
            )
        out[parts[0]] = parts[1]
    return out


def resolve_catalog(
    transport: Callable[[dict], dict | None],
    project_name: str,
    login: str,
    field_names: dict[str, str],
    board_lists_dsl: str = "",
) -> ResolvedCatalog:
    """Resolve names → node ids against the remote catalog.

    ``transport`` is the injected connector (rest_sink.http_transport
    or a recorded fake); ``field_names`` maps each key in
    ``REQUIRED_FIELD_SETTINGS`` to the configured field display name.
    Raises ``CatalogResolutionError`` with EVERY problem (missing
    settings, unknown fields, unknown board columns) in one pass —
    the reference's die-at-the-end diagnostics, lib/gh.js:55,144-176.
    """
    boards = transport(
        {
            "op": "graphql",
            "query": GQL_PROJECT_BY_NAME,
            "variables": {"login": login, "name": project_name},
        }
    )["data"]["organization"]["projectsNext"]["nodes"]
    board = next((b for b in boards if b["title"] == project_name), None)
    if board is None:
        raise CatalogResolutionError(
            f"project {project_name!r} not found for {login!r}"
        )

    nodes = transport(
        {
            "op": "graphql",
            "query": GQL_PROJECT_FIELDS,
            "variables": {"projectId": board["id"]},
        }
    )["data"]["node"]["fields"]["nodes"]
    fields_by_name: dict[str, dict] = {}
    fields_by_id: dict[str, dict] = {}
    for f in nodes:
        # 'settings' is ALWAYS at least 'null' (lib/gh.js:65-66)
        f = {**f, "settings": json.loads(f["settings"])}
        fields_by_name[f["name"]] = f
        fields_by_id[f["id"]] = f

    problems: list[str] = []

    # board columns live on the CONFIGURED status field (falling back
    # to the product's fixed "Status" name, which the reference
    # hardcodes at lib/gh.js:68-73) — validation and field resolution
    # must agree on which field that is
    status_name = field_names.get("card_status_field") or "Status"
    status = fields_by_name.get(status_name)
    options = (
        [o["name"] for o in (status["settings"] or {}).get("options", [])]
        if status
        else []
    )
    option_ids = {}
    for f in fields_by_name.values():
        for o in ((f["settings"] or {}).get("options")) or []:
            option_ids[(f["name"], o["name"])] = o["id"]

    for gh_col in parse_board_lists_dsl(board_lists_dsl).values():
        if gh_col not in options:
            problems.append(
                f"board list column {gh_col!r} is not a Status option "
                f"of {board['title']!r}"
            )

    field_ids: dict[str, str] = {}
    for key in REQUIRED_FIELD_SETTINGS:
        name = field_names.get(key)
        if not name:
            problems.append(f"field setting {key!r} is not configured")
            continue
        f = fields_by_name.get(name)  # exact match, like the reference
        if f is None:
            problems.append(
                f"{name!r} ({key}) is not a field of {board['title']!r}"
            )
            continue
        field_ids[key] = f["id"]

    if problems:
        raise CatalogResolutionError("; ".join(problems))

    return ResolvedCatalog(
        project_id=board["id"],
        project_number=board["number"],
        project_title=board["title"],
        field_ids=field_ids,
        fields_by_name=fields_by_name,
        fields_by_id=fields_by_id,
        status_options=tuple(options),
        option_ids=option_ids,
    )


def prepare_field_update(
    catalog: ResolvedCatalog,
    item_id: str,
    field_name_or_id: str,
    value: object,
) -> dict:
    """Driver-side analog of ``GH.projects.setFieldValue``
    (lib/gh.js:430-452): resolve a field by NAME OR ID through the
    dual-keyed cache, resolve single-select option names to option
    ids, and return the ``set_field_value`` transport payload.

    Raises:
    - ``UnsupportedFieldError`` for built-in fields the mutation
      cannot write ("Labels" et al., tests/set-field-value.js:22-32).
    - ``KeyError`` if the field is not in the catalog (the
      reference's "'<id>' not found in fieldsCache", lib/gh.js:434).
    - ``KeyError`` with the available options if a single-select
      value has no matching option (lib/gh.js:445-450).
    """
    f = catalog.fields_by_name.get(field_name_or_id) or catalog.fields_by_id.get(
        field_name_or_id
    )
    if f is None:
        raise KeyError(f"{field_name_or_id!r} not found in catalog fields")
    if f["name"] in UNSUPPORTED_BUILTIN_FIELDS:
        raise UnsupportedFieldError(
            f"built-in field {f['name']!r} cannot be written via "
            "updateProjectNextItemField; set it through the issue "
            "REST payload instead (labels/assignees on the issue)"
        )
    # lib/gh.js:493 stringifies with JS toString(): null is rejected
    # upstream (never reaches the mutation), and Numbers render
    # without a trailing ".0" (2.0 -> "2"). Python's str() would
    # produce "None" / "2.0" — diverging transport payloads (r4
    # advice) — so match the reference's formatting explicitly.
    if value is None:
        raise ValueError(
            f"field {f['name']!r}: value must not be None — the "
            "reference rejects null field values before the mutation "
            "(lib/gh.js:493)"
        )
    if isinstance(value, bool):
        value = "true" if value else "false"  # JS Boolean toString
    elif isinstance(value, float):
        import math
        import re as _re

        if math.isnan(value):
            value = "NaN"  # JS String(NaN)
        elif math.isinf(value):
            value = "Infinity" if value > 0 else "-Infinity"
        elif value.is_integer() and abs(value) < 1e21:
            # JS prints integer Numbers below 1e21 in full decimal
            value = str(int(value))
        elif value != 0 and 1e-6 <= abs(value) < 1e21:
            # JS stays positional in this whole range; Python's repr
            # goes exponential below 1e-4, so re-expand the shortest
            # round-trip digits positionally (Decimal('1.5e-05') ->
            # '0.000015') and trim any trailing zeros it introduces
            from decimal import Decimal

            value = format(Decimal(repr(value)), "f")
            if "." in value:
                value = value.rstrip("0").rstrip(".")
        else:
            # exponent range (<1e-6 or >=1e21): repr matches JS except
            # for the zero-padded exponent (1e-07 vs JS 1e-7) — strip
            value = _re.sub(r"e([+-])0(\d)$", r"e\1\2", repr(value))
    else:
        value = str(value)
    options = (f.get("settings") or {}).get("options")
    if options:
        value = catalog.option_id(f["name"], value)
    return {
        "op": "set_field_value",
        "project_id": catalog.project_id,
        "item_id": item_id,
        "field_id": f["id"],
        "value": value,
    }
