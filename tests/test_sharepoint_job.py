"""§3.3 SharePoint items pipeline: lookup resolution, projection, body
text, single-chunk docs."""

from __future__ import annotations

import datetime as dt

from gpt_rag_ingestion_spark.plans.sharepoint_job import (
    resolve_lookups,
    sharepoint_items_to_docs,
)


def _items(spark):
    t = dt.datetime.fromisoformat("2024-03-01T00:00:00")
    return spark.createDataFrame(
        [
            (
                "contoso", "listA", 1,
                {"Title": "Spec", "OwnerId": "7", "Internal": "x"},
                t, '["u1","u2"]', "g1;g2",
            ),
            (
                "contoso", "listA", 2,
                {"Title": "Plan", "OwnerId": "99", "Internal": "y"},
                t, "[]", "",
            ),
        ],
        "site STRING, list_id STRING, item_id INT, fields MAP<STRING,STRING>, "
        "last_modified TIMESTAMP, user_acl_str STRING, group_acl_str STRING",
    )


def _owners(spark):
    return spark.createDataFrame(
        [("7", "Alice"), ("8", "Bob")], ["lookup_id", "lookup_value"]
    )


def test_resolve_lookups(spark):
    out = resolve_lookups(_items(spark), {"OwnerId": _owners(spark)})
    rows = {r["item_id"]: r["fields"] for r in out.collect()}
    assert rows[1]["OwnerId"] == "Alice"  # resolved
    assert rows[2]["OwnerId"] == "99"  # missing dim row -> raw id kept


def test_sharepoint_items_to_docs(spark):
    docs = sharepoint_items_to_docs(
        _items(spark),
        lookups={"OwnerId": _owners(spark)},
        exclude_fields=["Internal"],
        embedding_dim=8,
    ).collect()
    by_parent = {r["parent_id"]: r for r in docs}
    d1 = by_parent["contoso-listA-1"]
    assert d1["id"] == "contoso-listA-1-c00000"
    assert "OwnerId: Alice" in d1["content"]
    assert "Internal" not in d1["content"]
    assert d1["metadata_security_user_ids"] == ["u1", "u2"]
    assert d1["metadata_security_group_ids"] == ["g1", "g2"]
    assert d1["source"] == "sharepoint-list"
    assert len(d1["contentVector"]) == 8
