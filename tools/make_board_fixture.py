"""Generate the committed board fixture parquet (fixtures/board/).

Builds a deterministic, reference-shaped Trello board export — the
same canonical record shapes as README.md:252–421 and the FIXTURES.md
§C owner case matrix, replicated across enough cards that the
driver's value-hash gate exercises every path — then runs it through
the REAL ingestion chain (sources/board.read_board + normalize_board)
and writes the normalized entity tables as parquet.

The fixture is committed; rerun this script only to change it:

    python tools/make_board_fixture.py

Why parquet-in-repo: the driver's testdata dir is read-only and has
no board-domain tables, yet VERDICT r2 #3 wants the board pipeline
(P2/P7, J4/J5, S13) visible to the driver's CORRECTNESS gate. The
bp* queries read these files via an absolute path and their DuckDB
oracles read the same files with read_parquet().

Determinism notes: every id/name/amount derives from the card index;
fallback texts are strictly alphanumeric so the reference's
regex-match owner semantics reduce to substring containment, which
the SQL oracles replicate exactly (same reduction j7 uses).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "board",
)

MEMBERS = [
    ("m01", "alice", "Alice A"),
    ("m02", "samkirby22", "Sam K"),
    ("m03", "sam", "Sam Only"),
    ("m04", "bob99", "Bob B"),
    ("m05", "carol", "Carol C"),
    ("m06", "dave7", "Dave D"),
    ("m07", "erin", "Erin E"),
    ("m08", "frank", "Frank F"),
]

LISTS = [
    ("L1", "Concepts", 1.0),
    ("L2", "QA", 2.0),
    ("L3", "In Progress", 3.0),
    ("L9", "Unused", 9.0),
]

# list name -> project status (the env-DSL mapping, example.env:30);
# L9 deliberately unmapped so P2 has rows to drop.
STATUS_MAP = {"Concepts": "Pending", "QA": "QA", "In Progress": "In Progress"}

SECADM = "secadm"
CUSTOM_FIELDS = [
    (SECADM, "Secondary Admin", "text"),
    ("cftype", "Type", "text"),
]

N_CARDS = 36


def _label(n: str) -> dict:
    return {"id": f"lb_{n}", "idBoard": "B1", "name": n, "color": "red"}


def _secadm(i: int, textval: str) -> dict:
    return {
        "id": f"cfi{i:03d}",
        "value": {"text": textval},
        "idCustomField": SECADM,
        "idModel": f"c{i:03d}",
        "modelType": "card",
    }


def _item(iid, clid, name, state="incomplete", pos=1.0, member=None) -> dict:
    return {
        "id": iid,
        "idChecklist": clid,
        "name": name,
        "state": state,
        "pos": pos,
        "idMember": member,
    }


def _items_for(i: int, clid: str) -> list[dict]:
    """Index prefix + bounty, a completed row, a >50-char name, and a
    short plain row — the parse_check_item surface."""
    amt = f"{(i % 4) + 1}.5" if i % 3 == 0 else str((i % 5) + 1)
    return [
        _item(
            f"i{i:03d}a", clid, f"{i % 7 + 1})  Implement widget {i} ({amt} Dash)",
            pos=2.0,
        ),
        _item(f"i{i:03d}b", clid, f"already done {i}", state="complete", pos=1.0),
        _item(
            f"i{i:03d}c",
            clid,
            f"review the documentation of module {i} thoroughly so that "
            "everything stays consistent and clear for newcomers",
            pos=3.0,
            member=MEMBERS[i % 4][0],
        ),
        _item(f"i{i:03d}d", clid, f"cleanup {i}", pos=4.0),
    ]


def _card(i: int) -> dict:
    p = i % 9
    cid = f"c{i:03d}"
    base = {
        "id": cid,
        "name": f"Card {i:03d} of pattern {p}",
        "desc": f"Description for card {i:03d}." if p != 8 else "",
        "closed": p == 2,
        "idBoard": "B1",
        "idList": {2: "L1", 3: "L9"}.get(p, ["L1", "L2", "L3"][i % 3]),
        "idMembers": {
            0: ["m02", "m03"],
            1: ["m01"],
            2: ["m01"],
            3: ["m01"],
            4: ["m01", "m04"],
            5: ["m01"],
            6: ["m01"],
            7: ["m05", "m06"],
            8: [],
        }[p],
        "labels": {
            0: [_label("Beta"), _label("Alpha")],
            7: [_label("Gamma")],
        }.get(p, []),
        "customFieldItems": {
            0: [_secadm(i, "@samkirby")],
            4: [_secadm(i, "bobtypo")],
            5: [_secadm(i, "alice")],
            6: [_secadm(i, "SAMKIRBY22")],
            7: [_secadm(i, "dave")],
        }.get(p, []),
        "url": f"https://trello.example/c/{cid}",
    }
    if p == 0:
        # OLD format: checklists nested in the card
        base["checklists"] = [
            {
                "id": f"cl{i:03d}",
                "name": "Specification Tasks",
                "idCard": cid,
                "idBoard": "B1",
                "pos": 2.0,
                "checkItems": _items_for(i, f"cl{i:03d}"),
            }
        ]
    return base


def build_board() -> dict:
    cards = [_card(i) for i in range(N_CARDS)]
    top_level = []
    for i in range(N_CARDS):
        p = i % 9
        if p == 1:  # NEW format: checklist arrives top-level
            top_level.append(
                {
                    "id": f"cl{i:03d}",
                    "name": "QA Tasks",
                    "idCard": f"c{i:03d}",
                    "idBoard": "B1",
                    "pos": 1.0,
                    "checkItems": _items_for(i, f"cl{i:03d}"),
                }
            )
        if p == 0:
            # stray duplicate pointing at an OLD-format card: the
            # upgrade must drop it (lib/transform.js:223-255)
            top_level.append(
                {
                    "id": f"cldup{i:03d}",
                    "name": "Dupe Tasks",
                    "idCard": f"c{i:03d}",
                    "idBoard": "B1",
                    "pos": 9.0,
                    "checkItems": [
                        _item(f"ix{i:03d}", f"cldup{i:03d}", "must not appear")
                    ],
                }
            )
    return {
        "id": "B1",
        "name": "Fixture Board",
        "cards": cards,
        "checklists": top_level,
        "lists": [
            {"id": lid, "name": n, "pos": pos, "closed": False}
            for lid, n, pos in LISTS
        ],
        "members": [
            {"id": mid, "username": u, "fullName": fn}
            for mid, u, fn in MEMBERS
        ],
        "labels": [],
        "customFields": [
            {"id": fid, "name": n, "type": t} for fid, n, t in CUSTOM_FIELDS
        ],
    }


def main() -> None:
    from trello_github_etl_spark.session import get_spark
    from trello_github_etl_spark.sources.board import (
        normalize_board,
        read_board,
    )

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    board_json = os.path.join(FIXTURE_DIR, "board.json")
    with open(board_json, "w") as f:
        json.dump(build_board(), f, indent=1, sort_keys=True)

    spark = get_spark("board-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    entities = normalize_board(read_board(spark, board_json))
    for name in ("cards", "check_items", "lists", "members", "custom_fields"):
        out = os.path.join(FIXTURE_DIR, f"{name}.parquet")
        entities[name].coalesce(1).write.mode("overwrite").parquet(out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
